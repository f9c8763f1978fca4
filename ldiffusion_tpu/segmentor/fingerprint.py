"""Dataset fingerprint extraction.

Behavioral contract: nnUNet's ``DatasetFingerprintExtractor`` (reference
``model/nnunetv2/experiment_planning/dataset_fingerprint/fingerprint_extractor.py:18-199``):
per case — crop to nonzero, record shapes/spacings, sample up to 10k
foreground intensities per case (≤1e7 total) per channel; aggregate
median/mean/std/percentiles into ``dataset_fingerprint.json``.

For the 2D natural-image path (PNG/TIF), spacing is (999, 1, 1) — the
``NaturalImage2DIO`` convention (reference
``imageio/natural_image_reader_writer.py:22-65``) — and the crop is a no-op
for dense pathology images. IO here is numpy arrays already loaded by the
dataset layer; no multiprocessing pool is needed (host IO overlaps device
compute via the input pipeline instead).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

NATURAL_2D_SPACING = (999.0, 1.0, 1.0)
FG_SAMPLES_PER_CASE = 10_000
MAX_TOTAL_FG_SAMPLES = 10_000_000


def crop_to_nonzero_bbox(image: np.ndarray) -> Tuple[slice, slice]:
    """bbox of any-channel-nonzero pixels (reference
    ``preprocessing/cropping/cropping.py:8-50``). image: (H, W, C)."""
    mask = np.any(image != 0, axis=-1)
    ys, xs = np.where(mask)
    if ys.size == 0:
        return slice(0, image.shape[0]), slice(0, image.shape[1])
    return slice(int(ys.min()), int(ys.max()) + 1), slice(int(xs.min()), int(xs.max()) + 1)


def extract_fingerprint(images: Sequence[np.ndarray], labels: Sequence[np.ndarray],
                        seed: int = 1234, save_path: Optional[str] = None) -> Dict:
    """images: list of (H, W, C) float arrays; labels: list of (H, W) ints.

    Returns the fingerprint dict (same information content as
    ``dataset_fingerprint.json``)."""
    rng = np.random.default_rng(seed)
    shapes: List[Tuple[int, int]] = []
    shapes_after_crop: List[Tuple[int, int]] = []
    per_channel: Dict[int, List[np.ndarray]] = {}
    budget = MAX_TOTAL_FG_SAMPLES

    for img, lab in zip(images, labels):
        shapes.append(tuple(img.shape[:2]))
        ys, xs = crop_to_nonzero_bbox(img)
        shapes_after_crop.append((ys.stop - ys.start, xs.stop - xs.start))
        fg = lab > 0
        n_fg = int(fg.sum())
        if n_fg > 0 and budget > 0:
            take = min(FG_SAMPLES_PER_CASE, n_fg, budget)
            idx = rng.choice(n_fg, size=take, replace=False)
            budget -= take
            coords = np.argwhere(fg)[idx]
            for c in range(img.shape[-1]):
                per_channel.setdefault(c, []).append(img[coords[:, 0], coords[:, 1], c])

    intensity = {}
    for c, chunks in per_channel.items():
        v = np.concatenate(chunks)
        intensity[str(c)] = {
            "mean": float(np.mean(v)),
            "std": float(np.std(v)),
            "min": float(np.min(v)),
            "max": float(np.max(v)),
            "percentile_00_5": float(np.percentile(v, 0.5)),
            "percentile_99_5": float(np.percentile(v, 99.5)),
            "median": float(np.median(v)),
        }

    fp = {
        "spacings": [list(NATURAL_2D_SPACING)] * len(shapes),
        "shapes_after_crop": [list(s) for s in shapes_after_crop],
        "original_shapes": [list(s) for s in shapes],
        "foreground_intensity_properties_per_channel": intensity,
        "num_cases": len(shapes),
        "num_channels": images[0].shape[-1] if images else 3,
    }
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "w") as f:
            json.dump(fp, f, indent=2)
    return fp


def verify_dataset_integrity(images: Sequence[np.ndarray], labels: Sequence[np.ndarray],
                             num_classes: int) -> List[str]:
    """Dataset checks analogous to nnUNet's ``verify_dataset_integrity``
    (reference ``experiment_planning/verify_dataset_integrity.py``): geometry
    match, label-range validity. Returns a list of problems (empty = OK)."""
    problems = []
    if len(images) != len(labels):
        problems.append(f"count mismatch: {len(images)} images vs {len(labels)} labels")
    for i, (img, lab) in enumerate(zip(images, labels)):
        if img.shape[:2] != lab.shape[:2]:
            problems.append(f"case {i}: image {img.shape[:2]} vs label {lab.shape[:2]}")
        mx = int(lab.max()) if lab.size else 0
        if mx >= num_classes:
            problems.append(f"case {i}: label value {mx} >= num_classes {num_classes}")
        if not np.isfinite(img).all():
            problems.append(f"case {i}: non-finite image values")
    return problems


def extract_fingerprint_3d(volumes: Sequence[np.ndarray], labels: Sequence[np.ndarray],
                           spacings: Optional[Sequence[Sequence[float]]] = None,
                           seed: int = 1234, save_path: Optional[str] = None) -> Dict:
    """3D fingerprint (reference ``fingerprint_extractor.py:18-199`` for
    volumes): per case crop-to-nonzero shape, spacing, and fg-intensity
    samples; consumed by ``segmentor/planner3d.py:plan_all_configurations``.

    volumes: list of (Z, H, W, C) float arrays; labels: list of (Z, H, W)."""
    rng = np.random.default_rng(seed)
    shapes, shapes_after_crop = [], []
    per_channel: Dict[int, List[np.ndarray]] = {}
    budget = MAX_TOTAL_FG_SAMPLES
    for vol, lab in zip(volumes, labels):
        shapes.append(tuple(vol.shape[:3]))
        nz = np.argwhere(np.any(vol != 0, axis=-1))
        if nz.size == 0:
            shapes_after_crop.append(tuple(vol.shape[:3]))
        else:
            mins, maxs = nz.min(axis=0), nz.max(axis=0) + 1
            shapes_after_crop.append(tuple(int(b - a) for a, b in zip(mins, maxs)))
        fg = lab > 0
        n_fg = int(fg.sum())
        if n_fg > 0 and budget > 0:
            take = min(FG_SAMPLES_PER_CASE, n_fg, budget)
            idx = rng.choice(n_fg, size=take, replace=False)
            budget -= take
            coords = np.argwhere(fg)[idx]
            for c in range(vol.shape[-1]):
                per_channel.setdefault(c, []).append(
                    vol[coords[:, 0], coords[:, 1], coords[:, 2], c])

    intensity = {}
    for c, chunks in per_channel.items():
        v = np.concatenate(chunks)
        intensity[str(c)] = {
            "mean": float(np.mean(v)), "std": float(np.std(v)),
            "min": float(np.min(v)), "max": float(np.max(v)),
            "percentile_00_5": float(np.percentile(v, 0.5)),
            "percentile_99_5": float(np.percentile(v, 99.5)),
            "median": float(np.median(v)),
        }
    fp = {
        "spacings": [list(s) for s in (spacings or [(1.0, 1.0, 1.0)] * len(shapes))],
        "shapes_after_crop": [list(s) for s in shapes_after_crop],
        "original_shapes": [list(s) for s in shapes],
        "foreground_intensity_properties_per_channel": intensity,
        "num_cases": len(shapes),
        "num_channels": volumes[0].shape[-1] if volumes else 1,
    }
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "w") as f:
            json.dump(fp, f, indent=2)
    return fp
