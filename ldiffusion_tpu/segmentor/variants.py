"""Trainer variants — the configuration-space equivalent of nnUNet's 20
trainer subclasses (reference ``training/nnUNetTrainer/variants/**``, 1339
LoC of subclassing).

In this framework a "variant" is data, not a class: a named recipe mapping
to (SegmentorTrainConfig overrides, AugmentConfig overrides, loss choice,
lr schedule, optimizer). ``get_variant(name)`` accepts the reference's
trainer names (``nnUNetTrainer_5epochs``, ``nnUNetTrainerDiceLoss``,
``nnUNetTrainerCosAnneal``, ...) for drop-in familiarity.
"""
from __future__ import annotations

import dataclasses
import math
import re
from typing import Optional

from ldiffusion_tpu.core.config import SegmentorTrainConfig
from ldiffusion_tpu.data.augment import AugmentConfig


@dataclasses.dataclass(frozen=True)
class TrainerVariant:
    name: str
    config: SegmentorTrainConfig
    augment: AugmentConfig
    loss: str = "dc_and_ce"          # dc_and_ce | dice | ce | topk10 | dc_and_focal
    lr_schedule: str = "poly"        # poly | cosine | constant
    optimizer: str = "sgd"           # sgd | adam
    mirror_tta: bool = True


_NO_DA = AugmentConfig(p_rotation=0, p_scaling=0, p_noise=0, p_blur=0,
                       p_brightness=0, p_contrast=0, p_lowres=0,
                       p_gamma_invert=0, p_gamma=0, p_mirror=0)
_NO_MIRROR = dataclasses.replace(AugmentConfig(), p_mirror=0)


def get_variant(name: str = "default",
                base: Optional[SegmentorTrainConfig] = None) -> TrainerVariant:
    base = base or SegmentorTrainConfig()
    aug = AugmentConfig()
    cfg = base
    loss, sched, opt, mirror = "dc_and_ce", "poly", "sgd", True

    # Xepochs family (reference variants/training_length/*):
    m = re.search(r"_(\d+)epochs?$", name)
    if m:
        cfg = dataclasses.replace(cfg, num_epochs=int(m.group(1)))
    if "Benchmark" in name:
        cfg = dataclasses.replace(cfg, num_epochs=5)

    # DA family (variants/data_augmentation/*)
    if "NoDA" in name:
        aug = _NO_DA
    if "NoMirroring" in name:
        aug = dataclasses.replace(aug, p_mirror=0)
        mirror = False
    if "DAOrd0" in name:
        aug = dataclasses.replace(aug, p_lowres=0)

    # loss family (variants/loss/*)
    if "DiceLoss" in name:
        loss = "dice"
    if "CELoss" in name or name.endswith("_CE"):
        loss = "ce"
    if "TopK" in name.replace("topk", "TopK"):
        loss = "topk10"
    if "Focal" in name:
        loss = "dc_and_focal"

    # schedule / optimizer (variants/lr_schedule, variants/optimizer)
    if "CosAnneal" in name:
        sched = "cosine"
    if "Adam" in name or "Adan" in name:
        opt = "adam"
        cfg = dataclasses.replace(cfg, initial_lr=3e-4)
    if "NoDeepSupervision" in name:
        cfg = dataclasses.replace(cfg, deep_supervision=False)

    return TrainerVariant(name=name, config=cfg, augment=aug, loss=loss,
                          lr_schedule=sched, optimizer=opt, mirror_tta=mirror)


def lr_at_epoch(variant: TrainerVariant, epoch: int, max_epochs: int) -> float:
    lr0 = variant.config.initial_lr
    if variant.lr_schedule == "poly":
        return lr0 * (1 - epoch / max_epochs) ** 0.9
    if variant.lr_schedule == "cosine":
        return lr0 * 0.5 * (1 + math.cos(math.pi * epoch / max_epochs))
    return lr0
