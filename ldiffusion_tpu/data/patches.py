"""Foreground-oversampled random patch sampling.

Behavioral contract: ``nnUNetDataLoader2D`` (reference
``training/dataloading/base_data_loader.py:10-139``, ``data_loader_2d.py:6-87``):
infinite random patches; the last ``round(batch*oversample)`` elements of each
batch are forced to contain a randomly-chosen present foreground class
(patch centered on one of its sampled locations); crops are padded with 0
(data) / -1 (seg) when the bbox leaves the case.

Host-side numpy (cheap gather/copy); batches stream to device where
augmentation runs (``data/augment.py``).
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple

import numpy as np

if TYPE_CHECKING:  # avoid circular import (segmentor.trainer imports us)
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset


def _crop_with_pad(data: np.ndarray, seg: np.ndarray, lb: Tuple[int, int],
                   patch: Tuple[int, int]):
    h, w = data.shape[:2]
    ph, pw = patch
    y0, x0 = lb
    y1, x1 = y0 + ph, x0 + pw
    sy0, sx0 = max(0, y0), max(0, x0)
    sy1, sx1 = min(h, y1), min(w, x1)
    out_d = np.zeros((ph, pw, data.shape[-1]), data.dtype)
    out_s = np.full((ph, pw), -1, seg.dtype)
    oy, ox = sy0 - y0, sx0 - x0
    out_d[oy:oy + (sy1 - sy0), ox:ox + (sx1 - sx0)] = data[sy0:sy1, sx0:sx1]
    out_s[oy:oy + (sy1 - sy0), ox:ox + (sx1 - sx0)] = seg[sy0:sy1, sx0:sx1]
    return out_d, out_s


class PatchSampler:
    def __init__(self, dataset: "PreprocessedDataset", patch_size: Tuple[int, int],
                 batch_size: int, oversample_fg: float = 0.33, seed: int = 0):
        self.ds = dataset
        self.keys = dataset.keys()
        self.patch = tuple(patch_size)
        self.batch = batch_size
        self.oversample = oversample_fg
        self.rng = np.random.default_rng(seed)

    def _must_be_fg(self, idx_in_batch: int) -> bool:
        # reference base_data_loader.py:45-53
        return idx_in_batch >= round(self.batch * (1.0 - self.oversample))

    def sample_one(self, force_fg: bool):
        case = self.ds[self.keys[self.rng.integers(len(self.keys))]]
        h, w = case.seg.shape
        ph, pw = self.patch
        need = (max(0, ph - h), max(0, pw - w))
        lb_min = (-(need[0] // 2), -(need[1] // 2))
        lb_max = (h + need[0] // 2 + need[0] % 2 - ph, w + need[1] // 2 + need[1] % 2 - pw)
        locs = case.properties["class_locations"]
        if force_fg and locs:
            cls = list(locs.keys())[self.rng.integers(len(locs))]
            cl = locs[cls]
            y, x = cl[self.rng.integers(cl.shape[0])]
            lb = (int(np.clip(y - ph // 2, lb_min[0], max(lb_min[0], lb_max[0]))),
                  int(np.clip(x - pw // 2, lb_min[1], max(lb_min[1], lb_max[1]))))
        else:
            lb = (int(self.rng.integers(lb_min[0], max(lb_min[0], lb_max[0]) + 1)),
                  int(self.rng.integers(lb_min[1], max(lb_min[1], lb_max[1]) + 1)))
        return _crop_with_pad(case.data, case.seg, lb, self.patch)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            items = [self.sample_one(self._must_be_fg(i)) for i in range(self.batch)]
            data = np.stack([d for d, _ in items])
            seg = np.stack([s for _, s in items]).astype(np.int32)
            yield data, seg


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
