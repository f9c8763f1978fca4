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


# ---------------------------------------------------------------------------
# 3D / anisotropic (separate-z) resampling
# ---------------------------------------------------------------------------

ANISOTROPY_THRESHOLD = 3.0  # reference configuration.py ANISO_THRESHOLD


def _is_anisotropic(spacing: Sequence[float]) -> bool:
    sp = np.asarray(spacing, np.float64)
    return bool(np.max(sp) / np.min(sp) > ANISOTROPY_THRESHOLD)


def resample_data_3d(data: np.ndarray, new_shape: Sequence[int],
                     spacing: Sequence[float] = (1.0, 1.0, 1.0),
                     order: int = 3, order_z: int = 0,
                     is_seg: bool = False) -> np.ndarray:
    """Volume resampling with separate-z handling for anisotropic spacing
    (reference ``preprocessing/resampling/default_resampling.py:13-216``
    ``resample_data_or_seg`` with ``do_separate_z``): when the spacing ratio
    exceeds the anisotropy threshold, resample in-plane slice-by-slice with
    ``order`` (spline/one-hot) and then along the low-resolution z axis with
    ``order_z`` (nearest by default — avoids smearing across slices).

    data: (Z, H, W) for seg / single channel, or (Z, H, W, C).
    """
    data = np.asarray(data)
    has_c = data.ndim == 4
    if tuple(data.shape[:3]) == tuple(new_shape):
        return data
    resamp = resample_seg if is_seg else (
        lambda a, shp: resample_data(a, shp, order=order))
    if not _is_anisotropic(spacing):
        # isotropic: one 3D zoom (per channel / one-hot for seg)
        if is_seg:
            classes = np.unique(data)
            zoom = [n / o for n, o in zip(new_shape, data.shape[:3])]
            stack = np.stack([ndimage.zoom((data == c).astype(np.float32), zoom,
                                           order=1) for c in classes])
            return classes[np.argmax(stack, axis=0)].astype(data.dtype)
        zoom = [n / o for n, o in zip(new_shape, data.shape[:3])]
        if has_c:
            return np.stack([ndimage.zoom(data[..., c], zoom, order=order)
                             for c in range(data.shape[-1])],
                            axis=-1).astype(data.dtype)
        return ndimage.zoom(data, zoom, order=order).astype(data.dtype)

    # separate-z: the lowest-resolution axis is the largest-spacing axis
    # (reference get_lowres_axis — NOT necessarily axis 0: spacing like
    # (1, 5, 1) puts it in-plane). Transpose it to the front, resample,
    # transpose back.
    z_ax = int(np.argmax(spacing))
    if z_ax != 0:
        perm = (z_ax,) + tuple(a for a in range(3) if a != z_ax)
        inv = tuple(int(np.argsort(perm)[a]) for a in range(3))
        extra = (3,) if has_c else ()
        out = resample_data_3d(
            np.transpose(data, perm + extra),
            tuple(new_shape[a] for a in perm),
            tuple(spacing[a] for a in perm),
            order=order, order_z=order_z, is_seg=is_seg)
        return np.transpose(out, inv + extra)
    nz, nh, nw = new_shape
    # in-plane pass (per z slice)
    planes = [resamp(data[z], (nh, nw)) for z in range(data.shape[0])]
    vol = np.stack(planes, axis=0)
    if vol.shape[0] == nz:
        return vol.astype(data.dtype)
    # z pass with order_z (nearest default; seg always nearest-like)
    if is_seg or order_z == 0:
        # ndimage.zoom order-0 coordinate convention (grid_mode=False):
        # x_in = i_out * (old-1)/(new-1), then nearest — centered, unlike a
        # plain i/zoom mapping which shifts the volume by up to half a slice
        old_z = vol.shape[0]
        if nz == 1:
            idx = np.zeros(1, np.int64)
        else:
            idx = np.round(np.arange(nz) * (old_z - 1) / (nz - 1)).astype(np.int64)
        idx = np.clip(idx, 0, old_z - 1)
        return vol[idx].astype(data.dtype)
    zoom_z = nz / vol.shape[0]
    axes_zoom = (zoom_z,) + (1.0,) * (vol.ndim - 1)
    return ndimage.zoom(vol, axes_zoom, order=order_z).astype(data.dtype)
