"""Prediction export: logits → segmentation → original geometry → PNG.

Behavioral contract: reference ``inference/export_prediction.py:15-106``:
resample logits to pre-crop shape, softmax/argmax, paste back into the
original-size canvas at the crop bbox, revert transpose (identity in 2D),
write via the reader-writer (PNG uint8 here, NaturalImage2DIO semantics —
``imageio/natural_image_reader_writer.py:53-65``).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from PIL import Image

from ldiffusion_tpu.segmentor.resample import resample_logits


def _logits_to_seg(logits: np.ndarray, label_manager=None) -> np.ndarray:
    """Apply the regime's inference nonlin + conversion (reference
    ``export_prediction.py:25-38`` → ``label_handling.py:128-176``): regions
    paint in regions_class_order at sigmoid > 0.5; plain regimes map argmax
    through label values; no label manager → raw argmax."""
    if label_manager is not None:
        return label_manager.convert_logits_to_segmentation(logits).astype(np.uint8)
    return np.argmax(logits, axis=-1).astype(np.uint8)


def logits_to_segmentation(logits: np.ndarray, properties: Optional[Dict] = None,
                           label_manager=None) -> np.ndarray:
    """logits: (H, W, C) on the cropped grid; properties carries bbox +
    original_shape (from preprocessing). Returns (H_orig, W_orig) uint8."""
    if properties:
        bbox = properties["bbox"]
        crop_shape = (bbox[0][1] - bbox[0][0], bbox[1][1] - bbox[1][0])
        if tuple(logits.shape[:2]) != tuple(crop_shape):
            logits = resample_logits(logits, crop_shape)
    seg = _logits_to_seg(logits, label_manager)
    if properties:
        out = np.zeros(tuple(properties["original_shape"]), np.uint8)
        bbox = properties["bbox"]
        out[bbox[0][0]:bbox[0][1], bbox[1][0]:bbox[1][1]] = seg
        return out
    return seg


def save_segmentation_png(seg: np.ndarray, path: str):
    Image.fromarray(seg.astype(np.uint8)).save(path)


def save_probabilities_npz(logits: np.ndarray, path: str, label_manager=None):
    """Analog of --save_probabilities (reference
    ``export_prediction.py:109-121``): probabilities under the regime's
    inference nonlin (sigmoid per region channel for the regions regime,
    softmax otherwise) to npz."""
    if label_manager is not None:
        probs = label_manager.apply_inference_nonlin(logits)
    else:
        x = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(x)
        probs = e / e.sum(axis=-1, keepdims=True)
    np.savez_compressed(path, probabilities=probs.astype(np.float16))


def export_volume_prediction(logits: np.ndarray, properties: Dict,
                             path: str, reader_writer=None,
                             label_manager=None) -> np.ndarray:
    """3D export (reference ``inference/export_prediction.py:15-106`` for
    volumes): linear-resample logits back to the pre-resample shape
    (separate-z aware), argmax, revert the crop bbox, write through the
    dataset's reader/writer (SimpleITK/Tiff3D/NIfTI — gated on their libs).

    logits: (Z, H, W, C) float; properties: the preprocess_case_3d props
    (original_shape / bbox / spacing / target_spacing).
    Returns the final (Z, H, W) uint8 volume (also written when a
    reader_writer is given).
    """
    from ldiffusion_tpu.segmentor.resample import resample_data_3d

    tgt = properties.get("target_spacing", properties.get("spacing", (1, 1, 1)))
    bbox = properties["bbox"]
    cropped_shape = tuple(b[1] - b[0] for b in bbox)
    if tuple(logits.shape[:3]) != cropped_shape:
        logits = resample_data_3d(logits, cropped_shape, tgt, order=1)
    seg = _logits_to_seg(logits, label_manager)
    full = np.zeros(tuple(properties["original_shape"]), np.uint8)
    full[tuple(slice(b[0], b[1]) for b in bbox)] = seg
    if reader_writer is not None:
        reader_writer.write_seg(full, path, properties)
    return full
