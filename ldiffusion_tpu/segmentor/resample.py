"""Spacing-aware resampling.

Behavioral contract: nnUNet's ``resample_data_or_seg_to_shape`` /
``compute_new_shape`` (reference ``preprocessing/resampling/
default_resampling.py:13-216``): cubic-spline (order 3) for image data,
order-1 for segmentations via per-class one-hot argmax (avoids label mixing),
linear for probability maps. The natural-image 2D path has unit spacing so
training never resamples; inference export uses these to map logits back to
original geometry when sizes differ.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from scipy import ndimage


def compute_new_shape(old_shape: Sequence[int], old_spacing: Sequence[float],
                      new_spacing: Sequence[float]) -> Tuple[int, ...]:
    return tuple(
        int(round(s * osp / nsp)) for s, osp, nsp in zip(old_shape, old_spacing, new_spacing)
    )


def resample_data(data: np.ndarray, new_shape: Sequence[int], order: int = 3) -> np.ndarray:
    """data: (H, W) or (H, W, C) float."""
    if tuple(data.shape[:2]) == tuple(new_shape):
        return data
    zoom = [n / o for n, o in zip(new_shape, data.shape[:2])]
    if data.ndim == 3:
        out = np.stack(
            [ndimage.zoom(data[..., c], zoom, order=order) for c in range(data.shape[-1])],
            axis=-1,
        )
    else:
        out = ndimage.zoom(data, zoom, order=order)
    return out.astype(data.dtype)


def resample_seg(seg: np.ndarray, new_shape: Sequence[int]) -> np.ndarray:
    """Per-class one-hot linear resample + argmax (order-1 seg semantics that
    avoid interpolated label values)."""
    if tuple(seg.shape) == tuple(new_shape):
        return seg
    classes = np.unique(seg)
    zoom = [n / o for n, o in zip(new_shape, seg.shape)]
    stack = np.stack(
        [ndimage.zoom((seg == c).astype(np.float32), zoom, order=1) for c in classes]
    )
    return classes[np.argmax(stack, axis=0)].astype(seg.dtype)


def resample_logits(logits: np.ndarray, new_shape: Sequence[int]) -> np.ndarray:
    """logits: (H, W, C) → linear per channel (probability/logit maps)."""
    return resample_data(logits, new_shape, order=1)
