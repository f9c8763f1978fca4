"""Foreground-oversampled random patch sampling (2D and 3D).

Behavioral contract: ``nnUNetDataLoader2D/3D`` (reference
``training/dataloading/base_data_loader.py:10-139``, ``data_loader_2d.py:6-87``,
``data_loader_3d.py:6-60``): infinite random patches; the last
``round(batch*oversample)`` elements of each batch are forced to contain a
randomly-chosen present foreground class (patch centered on one of its
sampled locations); crops are padded with 0 (data) / -1 (seg) when the bbox
leaves the case. The -1 seg padding is mapped to BACKGROUND by the trainer
(``RemoveLabelTransform(-1, 0)`` semantics, reference
``nnUNetTrainer.py:733``) — it marks out-of-case pixels only until the DA
stack has run. Spatial rank comes from ``len(patch_size)`` — the same
sampler is the 2D and the 3D loader.

Host-side numpy (cheap gather/copy); batches stream to device where
augmentation runs (``data/augment.py``).
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Sequence, Tuple

import numpy as np

if TYPE_CHECKING:  # avoid circular import (segmentor.trainer imports us)
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset


def _crop_with_pad(data: np.ndarray, seg: np.ndarray, lb: Sequence[int],
                   patch: Sequence[int]):
    """N-D crop with out-of-bounds zero/-1 padding. data: (*spatial, C);
    seg: (*spatial)."""
    nd = len(patch)
    shape = data.shape[:nd]
    src = []
    dst = []
    for ax in range(nd):
        a0, a1 = lb[ax], lb[ax] + patch[ax]
        s0, s1 = max(0, a0), min(shape[ax], a1)
        src.append(slice(s0, s1))
        dst.append(slice(s0 - a0, s0 - a0 + (s1 - s0)))
    out_d = np.zeros(tuple(patch) + (data.shape[-1],), data.dtype)
    out_s = np.full(tuple(patch), -1, seg.dtype)
    out_d[tuple(dst)] = data[tuple(src)]
    out_s[tuple(dst)] = seg[tuple(src)]
    return out_d, out_s


class PatchSampler:
    def __init__(self, dataset: "PreprocessedDataset", patch_size: Sequence[int],
                 batch_size: int, oversample_fg: float = 0.33, seed: int = 0,
                 probabilistic_oversampling: bool = False):
        """probabilistic_oversampling: per-sample bernoulli instead of the
        positional last-k-of-batch rule (reference
        ``variants/sampling/nnUNetTrainer_probabilisticOversampling.py``:
        ``probabilistic_oversampling=True`` in the dataloader, with the base
        class converting the positional rule to its effective percentage)."""
        self.ds = dataset
        self.keys = dataset.keys()
        self.patch = tuple(patch_size)
        self.batch = batch_size
        self.oversample = oversample_fg
        self.probabilistic = probabilistic_oversampling
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def effective_oversample_percent(batch_size: int, oversample_fg: float) -> float:
        """The positional rule's realized fg fraction (reference
        ``nnUNetTrainer_probabilisticOversampling.__init__``: mean over batch
        positions of ``not i < round(bs * (1 - p))`` — e.g. bs=2, p=0.33 →
        0.5)."""
        return float(np.mean([
            not i < round(batch_size * (1.0 - oversample_fg))
            for i in range(batch_size)]))

    def _must_be_fg(self, idx_in_batch: int) -> bool:
        if self.probabilistic:
            return bool(self.rng.random() < self.oversample)
        # reference base_data_loader.py:45-53
        return idx_in_batch >= round(self.batch * (1.0 - self.oversample))

    def sample_coords(self, force_fg: bool):
        """Pick a case and a patch lower-bound (reference
        ``base_data_loader.py:64-139`` bbox logic)."""
        case = self.ds[self.keys[self.rng.integers(len(self.keys))]]
        shape = case.seg.shape
        patch = self.patch
        nd = len(patch)
        assert len(shape) == nd, f"case rank {len(shape)} != patch rank {nd}"
        need = [max(0, patch[ax] - shape[ax]) for ax in range(nd)]
        lb_min = [-(need[ax] // 2) for ax in range(nd)]
        lb_max = [shape[ax] + need[ax] // 2 + need[ax] % 2 - patch[ax]
                  for ax in range(nd)]
        locs = case.properties["class_locations"]
        if force_fg and locs:
            cls = list(locs.keys())[self.rng.integers(len(locs))]
            cl = locs[cls]
            center = cl[self.rng.integers(cl.shape[0])]
            lb = tuple(int(np.clip(center[ax] - patch[ax] // 2, lb_min[ax],
                                   max(lb_min[ax], lb_max[ax])))
                       for ax in range(nd))
        else:
            lb = tuple(int(self.rng.integers(lb_min[ax],
                                             max(lb_min[ax], lb_max[ax]) + 1))
                       for ax in range(nd))
        return case, lb

    def sample_one(self, force_fg: bool):
        case, lb = self.sample_coords(force_fg)
        return _crop_with_pad(case.data, case.seg, lb, self.patch)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            picks = [self.sample_coords(self._must_be_fg(i))
                     for i in range(self.batch)]
            native = self._try_native(picks)
            if native is not None:
                yield native
                continue
            items = [_crop_with_pad(c.data, c.seg, lb, self.patch)
                     for c, lb in picks]
            data = np.stack([d for d, _ in items])
            seg = np.stack([s for _, s in items]).astype(np.int32)
            yield data, seg

    def _try_native(self, picks):
        """Batch crop+pad through the GIL-free multithreaded C++ routine
        (``ldiffusion_tpu/native``); None → numpy fallback."""
        if not all(c.data.dtype == np.float32 and c.data.flags.c_contiguous
                   and c.seg.dtype == np.int16 and c.seg.flags.c_contiguous
                   for c, _ in picks):
            return None
        from ldiffusion_tpu.native import crop_with_pad_batch_native

        lbs = np.asarray([lb for _, lb in picks], np.int64)
        out = crop_with_pad_batch_native(
            [(c.data, c.seg) for c, _ in picks], lbs, self.patch)
        if out is None:
            return None
        data, seg = out
        return data, seg.astype(np.int32)


def downsample_seg_for_ds(seg: np.ndarray, strides) -> list:
    """Deep-supervision targets: seg at 1, 1/2, 1/4 ... (nearest), matching
    the DS scales built in the reference DA pipeline
    (``nnUNetTrainer.py:673-795`` DownsampleSegForDSTransform)."""
    outs = [seg]
    cur = seg
    for s in strides[1:]:
        if s > 1:
            cur = cur[:, ::s, ::s]
            outs.append(cur)
    return outs
