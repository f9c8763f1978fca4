"""Materialize a diffusion-transformed segmentation dataset.

Behavioral contract: ``create_nnunet_dataset`` (reference
``utils.py:210-294``): every train/test image is pushed through the 1-step
diffusion feature transform and written into a dataset directory
(``DatasetXXX_Custom`` layout: imagesTr/labelsTr/imagesTs/labelsTs +
``dataset.json`` with RGB channels, background+classN labels, ``.png``).
The diffusion transform is skipped when image sizes are inconsistent
(reference ``utils.py:213``).

Fixed here (documented, SURVEY §7): the reference rebuilt an *untrained*
``nn.Linear(768,1280)`` projection for this path (``utils.py:192-197``); we
always use the trained projection weights.

TPU-first: images stream through the jitted transform in device batches
instead of one CUDA call per file.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ldiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD, load_image
from ldiffusion_tpu.data.labels import label_lut
from ldiffusion_tpu.diffusion.pipeline import SDComponents, one_step_transform, trajectory_text_emb


class DiffusionTransform:
    """Batched, jit-cached 1-step diffusion feature transform."""

    def __init__(self, components: SDComponents, batch_size: int = 1):
        self.c = components
        self.batch_size = batch_size
        self._fn = None
        self._emb = None

    def _build(self, batch: int):
        emb = trajectory_text_emb(self.c, self.c.params, batch)
        fn = jax.jit(lambda params, imgs: one_step_transform(self.c, params, imgs, emb))
        return fn

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) imagenet-normalized → (B, H, W, 3) in [0,1]."""
        if self._fn is None:
            self._fn = self._build(self.batch_size)
        out = []
        b = self.batch_size
        n = images.shape[0]
        for s in range(0, n, b):
            chunk = images[s:s + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                        chunk.dtype)])
            res = np.asarray(self._fn(self.c.params, jnp.asarray(chunk)))
            out.append(res[: b - pad if pad else b])
        return np.concatenate(out) if out else images


def check_images_same_size(paths: Sequence[str]) -> bool:
    """reference ``utils.py:155-163``."""
    sizes = set()
    for p in paths:
        with Image.open(p) as img:
            sizes.add(img.size)
            if len(sizes) > 1:
                return False
    return True


def next_dataset_dir(root: str) -> Tuple[int, str]:
    """Allocate the next DatasetXXX_Custom id (reference ``utils.py:214-227``)."""
    rootp = Path(root)
    rootp.mkdir(parents=True, exist_ok=True)
    max_num = 0
    for d in rootp.iterdir():
        if d.is_dir() and d.name.startswith("Dataset"):
            try:
                max_num = max(max_num, int(d.name[7:10]))
            except ValueError:
                continue
    new_num = max_num + 1
    return new_num, str(rootp / f"Dataset{new_num:03d}_Custom")


def build_transformed_dataset(
    train_images: Sequence[str], train_labels: Sequence[str],
    test_images: Sequence[str], test_labels: Sequence[str],
    num_classes: int, level: str,
    transform: Optional[DiffusionTransform],
    root: str, image_size: int = 1024,
) -> Tuple[int, str]:
    """Returns (dataset_num, dataset_path). ``transform=None`` copies raw
    images (the reference's non-uniform-size fallback)."""
    use_diffusion = (transform is not None and check_images_same_size(train_images)
                     and check_images_same_size(test_images))
    num, path = next_dataset_dir(root)
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        os.makedirs(os.path.join(path, sub))
    lut = label_lut(level)

    def do_split(images, labels, img_dir, lbl_dir, prefix):
        for idx, (ip, lp) in enumerate(zip(images, labels)):
            case = f"{prefix}_{idx:03d}"
            img = load_image(ip, (image_size, image_size), normalize=True)
            if use_diffusion:
                out = transform(img[None])[0]  # [0,1]
            else:
                out = img * IMAGENET_STD + IMAGENET_MEAN
            Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(path, img_dir, f"{case}_0000.png"))
            lbl = Image.open(lp).convert("L")
            if lbl.size != (image_size, image_size):
                lbl = lbl.resize((image_size, image_size), Image.NEAREST)
            Image.fromarray(lut[np.asarray(lbl, np.uint8)]).save(
                os.path.join(path, lbl_dir, f"{case}.png"))

    do_split(train_images, train_labels, "imagesTr", "labelsTr", "case")
    do_split(test_images, test_labels, "imagesTs", "labelsTs", "caseTs")

    dataset_json = {
        "channel_names": {"0": "R", "1": "G", "2": "B"},
        "labels": {"background": 0, **{f"class{i}": i for i in range(1, num_classes)}},
        "numTraining": len(train_images),
        "file_ending": ".png",
    }
    with open(os.path.join(path, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=4)
    return num, path


def load_transformed_dataset(path: str, split: str = "Tr"):
    """Read a materialized dataset back as (images [0,1], labels) arrays."""
    img_dir = os.path.join(path, f"images{split}")
    lbl_dir = os.path.join(path, f"labels{split}")
    images, labels = [], []
    for fn in sorted(os.listdir(img_dir)):
        img = np.asarray(Image.open(os.path.join(img_dir, fn)).convert("RGB"),
                         np.float32) / 255.0
        images.append(img)
        case = fn[:-9]  # strip _0000.png
        lbl = np.asarray(Image.open(os.path.join(lbl_dir, f"{case}.png")), np.uint8)
        labels.append(lbl.astype(np.int32))
    return images, labels
