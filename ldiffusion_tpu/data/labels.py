"""PUMA label maps (reference ``dataset.py:10-63``).

PNG grayscale pixel values → class ids. Tissue: 7 classes; cell: 11 classes.
Implemented as a 256-entry LUT so conversion is one vectorized gather on
device or host.
"""
from __future__ import annotations

import numpy as np

# reference dataset.py:10-18
PIXEL_TO_LABEL_TISSUE = {0: 0, 100: 1, 150: 2, 50: 3, 200: 4, 250: 5, 255: 6}
# reference dataset.py:20-32
PIXEL_TO_LABEL_CELL = {0: 0, 25: 1, 50: 2, 75: 3, 100: 4, 125: 5, 150: 6,
                       175: 7, 200: 8, 225: 9, 250: 10}
# reference dataset.py:34-40 (remote-sensing RGB-D orphan path)
ID_TO_CLASS_RGBD = {0: 0, 60: 1, 120: 2, 180: 3, 255: 0}

NUM_CLASSES = {"tissue": 7, "cell": 11}


def label_lut(level: str) -> np.ndarray:
    """256-entry uint8 LUT; unmapped pixel values → 0 (the reference's
    ``np.zeros_like`` default, ``dataset.py:52``)."""
    if level == "tissue":
        mapping = PIXEL_TO_LABEL_TISSUE
    elif level == "cell":
        mapping = PIXEL_TO_LABEL_CELL
    elif level == "rgbd":
        mapping = ID_TO_CLASS_RGBD
    else:
        raise ValueError("Unsupported level. Use 'tissue' or 'cell'.")
    lut = np.zeros(256, np.uint8)
    for k, v in mapping.items():
        lut[k] = v
    return lut


def convert_labels(gray: np.ndarray, level: str) -> np.ndarray:
    """Grayscale uint8 mask → class-id mask (reference ``convert_labels``,
    ``dataset.py:48-63``)."""
    return label_lut(level)[gray.astype(np.uint8)]


def labels_to_pixels(labels: np.ndarray, level: str) -> np.ndarray:
    """Inverse map for writing prediction PNGs in the reference's pixel
    convention."""
    if level == "tissue":
        inv = {v: k for k, v in PIXEL_TO_LABEL_TISSUE.items()}
    else:
        inv = {v: k for k, v in PIXEL_TO_LABEL_CELL.items()}
    lut = np.zeros(256, np.uint8)
    for k, v in inv.items():
        lut[k] = v
    return lut[labels.astype(np.uint8)]
