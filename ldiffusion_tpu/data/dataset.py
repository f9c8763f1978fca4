"""Dataset loading / splitting / batched iteration.

Replaces ``MedicalSegmentationDataset`` + torch DataLoader/DistributedSampler
(reference ``dataset.py:65-89``, ``ldiffusion.py:72-119``). Host-side IO is
PIL + numpy; everything after batching is device-side XLA (resize/normalize
happen inside the jitted step where they fuse — SURVEY §7 layer 5).

Per-host sharding: each process reads only its slice of the global batch
(``local_batch_slice``); the device mesh then shards the per-host batch.
"""
from __future__ import annotations

import os
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ldiffusion_tpu.data.labels import convert_labels

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str, size: Optional[Tuple[int, int]] = None,
               normalize: bool = True) -> np.ndarray:
    """Load RGB image → (H, W, 3) float32. Bilinear resize + imagenet
    normalization matches the reference transform (``ldiffusion.py:73-77``)."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if normalize:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr


def load_label(path: str, level: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load grayscale label PNG → (H, W) uint8 class ids. Resizing (when the
    label size mismatches) is nearest (reference ``utils.py:17-24``)."""
    img = Image.open(path).convert("L")
    if size is not None and img.size != (size[1], size[0]):
        img = img.resize((size[1], size[0]), Image.NEAREST)
    return convert_labels(np.asarray(img, np.uint8), level)


def list_pairs(image_dir: str, label_dir: str) -> Tuple[List[str], List[str]]:
    """Sorted image/label listing (reference ``ldiffusion.py:79-82``)."""
    images = sorted(os.path.join(image_dir, f) for f in os.listdir(image_dir))
    labels = sorted(os.path.join(label_dir, f) for f in os.listdir(label_dir))
    assert len(images) == len(labels), "image/label count mismatch"
    return images, labels


def split_dataset(images: Sequence[str], labels: Sequence[str], train_ratio: float = 0.7,
                  seed: Optional[int] = 0):
    """Shuffled 70/30 split (reference ``ldiffusion.py:84-92``; seeded here
    for reproducibility — the reference used the global RNG)."""
    idx = list(range(len(images)))
    rng = random.Random(seed)
    rng.shuffle(idx)
    split = int(len(images) * train_ratio)
    tr, te = idx[:split], idx[split:]
    return ([images[i] for i in tr], [labels[i] for i in tr],
            [images[i] for i in te], [labels[i] for i in te])


class SegmentationDataset:
    """Pairs of (image path, label path) with eager per-item loading."""

    def __init__(self, image_paths: Sequence[str], label_paths: Sequence[str],
                 level: str, image_size: int = 1024):
        self.image_paths = list(image_paths)
        self.label_paths = list(label_paths)
        self.level = level
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.image_paths)

    def get(self, i: int, image_size: Optional[int] = None,
            label_size: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        s = image_size or self.image_size
        img = load_image(self.image_paths[i], (s, s))
        ls = label_size or s
        lab = load_label(self.label_paths[i], self.level, (ls, ls))
        return img, lab

    def iter_batches(self, batch_size: int, image_size: Optional[int] = None,
                     label_size: Optional[int] = None, shuffle: bool = True,
                     seed: int = 0, drop_last: bool = True,
                     loop: bool = True) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite (or single-pass) batched iterator; per-host sharding is
        the caller's concern (see ``core.dist.local_batch_slice``)."""
        rng = np.random.default_rng(seed)
        n = len(self)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            end = n - (n % batch_size) if drop_last else n
            for start in range(0, max(end, 1), batch_size):
                idx = order[start:start + batch_size]
                if len(idx) == 0:
                    continue
                if drop_last and len(idx) < batch_size:
                    continue
                ims, labs = zip(*(self.get(i, image_size, label_size) for i in idx))
                yield np.stack(ims), np.stack(labs).astype(np.int32)
            if not loop:
                return
