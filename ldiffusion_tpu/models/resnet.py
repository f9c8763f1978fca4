"""ResNet (bottleneck family, incl. ResNet-152) in flax, NHWC.

Behavioral contract: ``torchvision.models.resnet152`` up to the last conv
stage — the frozen patch-feature encoder of the reference's cell classifier
(``model/conductor.py:144-145``: children()[:-2] → (B, 2048, H/32, W/32)).
Weights convert from a torchvision state dict when provided; otherwise a
fixed-seed random encoder still yields a usable (random-projection) feature
space for the trainable adapter+classifier on top.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 8, 36, 3)  # resnet152
    width: int = 64

    @staticmethod
    def resnet50() -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(3, 4, 6, 3))

    @staticmethod
    def resnet152() -> "ResNetConfig":
        return ResNetConfig()

    @staticmethod
    def tiny() -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(1, 1), width=8)


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name, **common)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1", **common)(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2", **common)(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3", **common)(y)
        y = bn("bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               name="downsample_conv", **common)(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Stem + 4 stages; output (B, H/32, W/32, 8*width)."""

    config: ResNetConfig = ResNetConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(cfg.width, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1", **common)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn1", **common)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(cfg.stage_sizes):
            feats = cfg.width * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = BottleneckBlock(feats, stride=stride,
                                    name=f"layer{i + 1}_{j}", **common)(x, train)
        return x


def convert_resnet(sd: Dict[str, np.ndarray], config: ResNetConfig) -> dict:
    """torchvision resnet state dict → flax params+batch_stats trees."""
    params: dict = {}
    stats: dict = {}

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0))

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    def bn(prefix_t, name_f, parent):
        put(params, (parent, name_f, "scale"), sd[f"{prefix_t}.weight"])
        put(params, (parent, name_f, "bias"), sd[f"{prefix_t}.bias"])
        put(stats, (parent, name_f, "mean"), sd[f"{prefix_t}.running_mean"])
        put(stats, (parent, name_f, "var"), sd[f"{prefix_t}.running_var"])

    put(params, ("conv1", "kernel"), conv_w(sd["conv1.weight"]))
    bn("bn1", "bn1", "")
    # fix root-level bn (no parent dict)
    params["bn1"] = params.pop("")["bn1"]
    stats["bn1"] = stats.pop("")["bn1"]
    for i, n_blocks in enumerate(config.stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            for c in (1, 2, 3):
                put(params, (f, f"conv{c}", "kernel"), conv_w(sd[f"{t}.conv{c}.weight"]))
                bn(f"{t}.bn{c}", f"bn{c}", f)
            if f"{t}.downsample.0.weight" in sd:
                put(params, (f, "downsample_conv", "kernel"),
                    conv_w(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", "downsample_bn", f)
    return {"params": params, "batch_stats": stats}
