"""RGB-D (remote-sensing) dataset — the reference's orphan multimodal path.

Behavioral contract: ``RgbDtmMaskDataset`` (reference ``dataset.py:91-157``):
rgb/dtm/mask TIF triplets under ``<root>/<split>/{rgb,dtm,masks}``, masks
resized to 256² nearest and mapped through ``ID_TO_CLASS`` (``dataset.py:34-46``),
plus a Canny edge map of the DTM expanded to 3 channels.

cv2 is not available in this environment; ``canny_edges`` is a
scipy-based reimplementation (sobel gradients → non-maximum suppression →
double-threshold hysteresis), matching cv2.Canny's behavior contract.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image
from scipy import ndimage

from ldiffusion_tpu.data.labels import label_lut


def map_mask(mask_np: np.ndarray) -> np.ndarray:
    """reference ``dataset.py:42-46``."""
    return label_lut("rgbd")[mask_np.astype(np.uint8)].astype(np.int64)


def canny_edges(gray_u8: np.ndarray, low: float = 100, high: float = 200) -> np.ndarray:
    """cv2.Canny-equivalent edge detector (scipy-based)."""
    g = gray_u8.astype(np.float32)
    gx = ndimage.sobel(g, axis=1)
    gy = ndimage.sobel(g, axis=0)
    mag = np.hypot(gx, gy)
    # cv2 sobel magnitude is ~4x scipy's normalized one; rescale to match
    mag = mag / 4.0
    angle = np.arctan2(gy, gx)
    # non-maximum suppression over 4 quantized directions
    q = ((np.round(angle / (np.pi / 4)) % 4)).astype(np.int8)
    nms = np.zeros_like(mag)
    pad = np.pad(mag, 1)
    offs = {0: ((0, 1), (0, -1)), 1: ((1, 1), (-1, -1)),
            2: ((1, 0), (-1, 0)), 3: ((1, -1), (-1, 1))}
    h, w = mag.shape
    for d, ((dy1, dx1), (dy2, dx2)) in offs.items():
        sel = q == d
        n1 = pad[1 + dy1:1 + dy1 + h, 1 + dx1:1 + dx1 + w]
        n2 = pad[1 + dy2:1 + dy2 + h, 1 + dx2:1 + dx2 + w]
        keep = sel & (mag >= n1) & (mag >= n2)
        nms[keep] = mag[keep]
    strong = nms >= high
    weak = nms >= low
    # hysteresis: keep weak components connected to strong pixels
    labeled, n = ndimage.label(weak)
    if n:
        strong_ids = np.unique(labeled[strong])
        strong_ids = strong_ids[strong_ids != 0]
        out = np.isin(labeled, strong_ids)
    else:
        out = strong
    return (out * 255).astype(np.uint8)


class RgbDtmMaskDataset:
    def __init__(self, root_dir: str, split: str = "train", mask_size: int = 256,
                 image_size: Optional[int] = 256):
        self.rgb_files = sorted(glob.glob(os.path.join(root_dir, split, "rgb", "*.tif")))
        self.dtm_files = sorted(glob.glob(os.path.join(root_dir, split, "dtm", "*.tif")))
        self.mask_files = sorted(glob.glob(os.path.join(root_dir, split, "masks", "*.tif")))
        assert len(self.rgb_files) == len(self.dtm_files) == len(self.mask_files), (
            f"file counts differ: {len(self.rgb_files)}, {len(self.dtm_files)}, "
            f"{len(self.mask_files)}")
        self.mask_size = mask_size
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.rgb_files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        size = self.image_size
        rgb = Image.open(self.rgb_files[idx]).convert("RGB")
        dtm = Image.open(self.dtm_files[idx]).convert("L")
        if size:
            rgb = rgb.resize((size, size), Image.BILINEAR)
            dtm = dtm.resize((size, size), Image.BILINEAR)
        mask = Image.open(self.mask_files[idx]).convert("L").resize(
            (self.mask_size, self.mask_size), Image.NEAREST)
        rgb_np = np.asarray(rgb, np.float32) / 255.0          # (H, W, 3)
        dtm_np = np.asarray(dtm, np.float32)[..., None] / 255.0  # (H, W, 1)
        mask_np = map_mask(np.asarray(mask))                  # (h, w) int64
        canny = canny_edges((dtm_np[..., 0] * 255).astype(np.uint8))
        canny_np = ((canny.astype(np.float32) / 255.0) - 0.5) / 0.5  # Normalize(0.5, 0.5)
        canny_np = np.repeat(canny_np[..., None], 3, axis=-1)
        return {"rgb": rgb_np, "dtm": dtm_np, "mask": mask_np, "canny": canny_np}
