"""Background-thread prefetch for host-side data iterators.

Replaces the reference's process pools — torch DataLoader ``num_workers=4``
(``ldiffusion.py:108``), batchgenerators' ``LimitedLenWrapper`` augmenter
processes (``nnUNetTrainer.py:591-640``) and the predictor's spawn-based
preprocessing queues (``inference/data_iterators.py:17-118``). On TPU the
augmentations run on-device, so host work is just IO + patch gather — a
single daemon thread with a small queue fully overlaps it with device steps.

Carries the reference's worker-liveness semantics
(``check_workers_alive_and_busy``): a crash in the producer thread re-raises
in the consumer instead of hanging.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class _Stop:
    pass


class Prefetcher:
    def __init__(self, iterator: Iterator, depth: int = 2):
        self._it = iterator
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: Optional[BaseException] = None
        self._done = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                if self._done.is_set():
                    return
                self._q.put(item)
        except BaseException as e:  # propagate to consumer
            self._exc = e
        finally:
            self._q.put(_Stop())

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, _Stop):
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self):
        self._done.set()
        # drain so the producer unblocks
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
