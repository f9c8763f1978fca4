"""Experiment planner — fingerprint → training plan.

Behavioral contract: nnUNet's ``ExperimentPlanner.plan_experiment`` for the
``2d`` configuration (reference ``experiment_planning/experiment_planners/
default_experiment_planner.py:371-500``): patch size starts at the median
cropped shape; network depth per axis comes from repeated halving down to a
minimum feature-map edge of 4 (``network_topology.py:get_pool_and_conv_props``);
features double from 32 capped at 512 (2d); the patch is shrunk until the
activation-memory estimate fits the budget; batch size fills the remaining
budget and is capped so one batch covers at most 5% of the dataset's pixels
(min 2).

TPU-first deviation (documented): the reference sizes against a CUDA VRAM
model built by instantiating the torch net (``static_estimate_VRAM_usage``,
``:86-112``); here the estimate is an analytic activation-element count
priced in bf16 against an HBM budget (default 8 GiB of a 16 GiB v5e chip,
leaving room for params/optimizer/XLA workspace), and feature counts/patch
edges are kept MXU-friendly (multiples of 128 on spatial dims when possible).
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ldiffusion_tpu.models.dynunet import RESENC_M_BLOCKS, DynUNetConfig

MAX_FEATURES_2D = 512
BASE_FEATURES = 32
MIN_EDGE = 4          # stop pooling when an axis would drop below 4
MAX_POOLS = 6
HBM_BUDGET_BYTES = 8 * 1024 ** 3
BF16_BYTES = 2
TRAIN_ACT_FACTOR = 6.0  # fwd + bwd activations + workspace fudge
MIN_BATCH = 2
DATASET_COVERAGE_CAP = 0.05  # batch*patch ≤ 5% of dataset pixels


@dataclasses.dataclass(frozen=True)
class SegPlan:
    patch_size: Tuple[int, int]
    batch_size: int
    features_per_stage: Tuple[int, ...]
    strides: Tuple[int, ...]
    n_conv_per_stage: int
    num_classes: int
    in_channels: int
    normalization: str            # "zscore_image" per channel (natural images)
    intensity_properties: Dict
    median_shape: Tuple[int, int]
    batch_dice: bool
    deep_supervision: bool = True
    # "plain" (PlainConvUNet) or "residual" (ResidualEncoderUNet — the ResEnc
    # planner variant, reference resencUNet_planner.py)
    block_type: str = "plain"
    n_blocks_per_stage: Tuple[int, ...] = ()
    # rematerialize decoder blocks in the backward pass (trades ~recompute
    # for activation memory; enables larger batches at big patches)
    remat_decoder: bool = False

    def network_config(self) -> DynUNetConfig:
        return DynUNetConfig(
            in_channels=self.in_channels,
            num_classes=self.num_classes,
            features_per_stage=self.features_per_stage,
            strides=self.strides,
            n_conv_per_stage=self.n_conv_per_stage,
            deep_supervision=self.deep_supervision,
            block_type=self.block_type,
            n_blocks_per_stage=tuple(self.n_blocks_per_stage),
            remat_decoder=self.remat_decoder,
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "SegPlan":
        d = json.load(open(path))
        for k in ("patch_size", "features_per_stage", "strides", "median_shape",
                  "n_blocks_per_stage"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)


def _topology(patch: Tuple[int, int]) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, int]]:
    """Pool each axis while its edge stays ≥ MIN_EDGE after halving, cap at
    MAX_POOLS; shrink patch to divisibility by the total pooling factor
    (get_pool_and_conv_props semantics for isotropic 2D)."""
    n_pools = min(
        MAX_POOLS,
        max(0, int(math.floor(math.log2(min(patch) / MIN_EDGE)))),
    )
    n_stages = n_pools + 1
    factor = 2 ** n_pools
    patch = tuple(max(factor, (p // factor) * factor) for p in patch)
    features = tuple(min(MAX_FEATURES_2D, BASE_FEATURES * (2 ** i)) for i in range(n_stages))
    strides = (1,) + (2,) * n_pools
    return features, strides, patch


def _activation_elements(patch: Tuple[int, int], features, strides, in_ch: int,
                         num_classes: int, n_conv: int = 2) -> float:
    """Analytic analog of ``compute_conv_feature_map_size``: total activation
    elements for one sample through encoder+decoder."""
    total = 0.0
    h, w = patch
    spatial = []
    for f, s in zip(features, strides):
        h, w = h // s, w // s
        spatial.append((h, w))
        total += n_conv * h * w * f  # encoder convs
    for i in range(len(features) - 2, -1, -1):
        h, w = spatial[i]
        total += (n_conv + 1) * h * w * features[i]  # upsample + decoder convs
        total += h * w * num_classes                 # seg head
    total += patch[0] * patch[1] * in_ch
    return total


def _estimate_bytes(patch, features, strides, in_ch, num_classes) -> float:
    return _activation_elements(patch, features, strides, in_ch, num_classes) \
        * BF16_BYTES * TRAIN_ACT_FACTOR


def plan_experiment(fingerprint: Dict, num_classes: int,
                    hbm_budget: int = HBM_BUDGET_BYTES,
                    max_batch: Optional[int] = None,
                    planner: str = "default") -> SegPlan:
    """``planner``: "default" (PlainConvUNet plan) or "resenc" (residual
    encoder, the nnUNetPlannerResEnc* analog — reference
    ``experiment_planning/experiment_planners/resencUNet_planner.py``: same
    topology rules, ResidualEncoderUNet with the ResEnc-M per-stage block
    schedule; the activation estimate scales by the extra encoder blocks)."""
    resenc = planner == "resenc"
    shapes = np.asarray(fingerprint["shapes_after_crop"], np.int64)
    median_shape = tuple(int(x) for x in np.median(shapes, axis=0))
    in_ch = int(fingerprint.get("num_channels", 3))
    # ResEnc-M runs ~2.3x the encoder activations of the plain 2-conv stages
    act_scale = 2.3 if resenc else 1.0

    # initial patch: median shape (reference :399 — 2d uses in-plane median)
    patch = tuple(median_shape)
    features, strides, patch = _topology(patch)

    # shrink until one sample fits the per-sample budget (budget/MIN_BATCH)
    while act_scale * _estimate_bytes(patch, features, strides, in_ch, num_classes) \
            > hbm_budget / MIN_BATCH and min(patch) > 2 * MIN_EDGE:
        # halve the largest axis (reference shrinks the worst offender axis)
        axis = int(np.argmax(patch))
        new_patch = list(patch)
        new_patch[axis] = max(MIN_EDGE, new_patch[axis] // 2)
        features, strides, patch = _topology(tuple(new_patch))

    per_sample = act_scale * _estimate_bytes(patch, features, strides, in_ch,
                                             num_classes)
    batch = max(MIN_BATCH, int(hbm_budget / per_sample))

    # 5%-of-dataset cap (reference :437-449 batch-size rule)
    total_px = float(np.sum(shapes[:, 0] * shapes[:, 1]))
    cap = max(MIN_BATCH, int(round(DATASET_COVERAGE_CAP * total_px /
                                   float(patch[0] * patch[1]))))
    batch = min(batch, cap)
    if max_batch:
        batch = min(batch, max_batch)

    # batch_dice: 2d config uses batch dice (reference :437-449)
    return SegPlan(
        patch_size=patch,
        batch_size=batch,
        features_per_stage=features,
        strides=strides,
        n_conv_per_stage=2,
        num_classes=num_classes,
        in_channels=in_ch,
        normalization="zscore_image",
        intensity_properties=fingerprint.get(
            "foreground_intensity_properties_per_channel", {}),
        median_shape=median_shape,
        batch_dice=True,
        block_type="residual" if resenc else "plain",
        n_blocks_per_stage=tuple(RESENC_M_BLOCKS[:len(features)]) if resenc else (),
    )
