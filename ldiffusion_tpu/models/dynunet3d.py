"""nnUNet-style dynamic 3D UNet (plan-driven topology) in flax.

Behavioral contract: the 3D ``PlainConvUNet``/``ResidualEncoderUNet`` built by
the vendored nnUNetv2 from 3d_fullres/3d_lowres plans (reference
``utilities/get_network_from_plans.py:9-77``,
``experiment_planning/experiment_planners/default_experiment_planner.py:371-500``):
per-stage [conv-InstanceNorm-LeakyReLU(0.01)] blocks with per-axis kernel
sizes and strides (anisotropic volumes pool the thin axis later and use
kernel 1 on it while it is thin), strided-conv downsampling, transpose-conv
upsampling with skip concat, deep-supervision heads per decoder stage.

TPU-first: NDHWC layout (channels minor for MXU lane tiling), bf16 compute /
fp32 params, instance norm as fused XLA reductions. Volumes are modest-sized
(the planner caps patch volume by HBM), so XLA's 3D conv lowering keeps the
MXU busy without a custom kernel.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldiffusion_tpu.models.dynunet import RESENC_M_BLOCKS

Triple = Tuple[int, int, int]


@dataclasses.dataclass(frozen=True)
class DynUNet3DConfig:
    in_channels: int = 1
    num_classes: int = 2
    features_per_stage: Tuple[int, ...] = (32, 64, 128, 256, 320, 320)
    strides: Tuple[Triple, ...] = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2),
                                   (2, 2, 2), (2, 2, 2))
    kernel_sizes: Tuple[Triple, ...] = ((3, 3, 3),) * 6
    n_conv_per_stage: int = 2
    deep_supervision: bool = True
    norm_eps: float = 1e-5
    negative_slope: float = 0.01
    block_type: str = "plain"             # "plain" | "residual"
    n_blocks_per_stage: Tuple[int, ...] = ()

    @property
    def n_stages(self) -> int:
        return len(self.features_per_stage)

    @staticmethod
    def tiny(num_classes: int = 2, in_channels: int = 1) -> "DynUNet3DConfig":
        return DynUNet3DConfig(
            in_channels=in_channels, num_classes=num_classes,
            features_per_stage=(8, 16, 32),
            strides=((1, 1, 1), (2, 2, 2), (1, 2, 2)),
            kernel_sizes=((3, 3, 3),) * 3)


class InstanceNorm3D(nn.Module):
    """Per-sample, per-channel spatial normalization (torch InstanceNorm3d
    affine=True semantics)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return (y * scale + bias).astype(x.dtype)


class ConvBlock3D(nn.Module):
    features: int
    stride: Triple = (1, 1, 1)
    kernel: Triple = (3, 3, 3)
    eps: float = 1e-5
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = tuple(k // 2 for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=[(p, p) for p in pad], dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        x = InstanceNorm3D(self.eps, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm")(x)
        return nn.leaky_relu(x, self.negative_slope)


class ResidualBlock3D(nn.Module):
    """3D BasicBlockD (see 2D ``models/dynunet.py:ResidualBlock``)."""

    features: int
    stride: Triple = (1, 1, 1)
    kernel: Triple = (3, 3, 3)
    eps: float = 1e-5
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = [(k // 2, k // 2) for k in self.kernel]
        conv = lambda name, stride: nn.Conv(
            self.features, self.kernel, strides=stride, padding=pad,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        norm = lambda name: InstanceNorm3D(self.eps, dtype=self.dtype,
                                           param_dtype=self.param_dtype, name=name)
        h = nn.leaky_relu(norm("norm1")(conv("conv1", self.stride)(x)),
                          self.negative_slope)
        h = norm("norm2")(conv("conv2", (1, 1, 1))(h))
        if self.stride != (1, 1, 1) or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), strides=self.stride,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="downsample_conv")(x)
            x = InstanceNorm3D(self.eps, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="downsample_norm")(x)
        return nn.leaky_relu(h + x, self.negative_slope)


class DynUNet3D(nn.Module):
    config: DynUNet3DConfig = DynUNet3DConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, D, H, W, C_in). Returns deep-supervision logits list
        (highest resolution first) or a single array."""
        cfg = self.config
        common = dict(eps=cfg.norm_eps, negative_slope=cfg.negative_slope,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)

        skips: List[jax.Array] = []
        if cfg.block_type == "residual":
            blocks = cfg.n_blocks_per_stage or RESENC_M_BLOCKS[:cfg.n_stages]
            for s in range(cfg.n_stages):
                feats = cfg.features_per_stage[s]
                k = tuple(cfg.kernel_sizes[s])
                x = ResidualBlock3D(feats, stride=tuple(cfg.strides[s]), kernel=k,
                                    name=f"enc_{s}_0", **common)(x)
                for c in range(1, blocks[s]):
                    x = ResidualBlock3D(feats, kernel=k, name=f"enc_{s}_{c}",
                                        **common)(x)
                skips.append(x)
        else:
            for s in range(cfg.n_stages):
                feats = cfg.features_per_stage[s]
                k = tuple(cfg.kernel_sizes[s])
                x = ConvBlock3D(feats, stride=tuple(cfg.strides[s]), kernel=k,
                                name=f"enc_{s}_0", **common)(x)
                for c in range(1, cfg.n_conv_per_stage):
                    x = ConvBlock3D(feats, kernel=k, name=f"enc_{s}_{c}",
                                    **common)(x)
                skips.append(x)

        seg_outputs: List[jax.Array] = []
        for d in range(cfg.n_stages - 2, -1, -1):
            feats = cfg.features_per_stage[d]
            stride = tuple(cfg.strides[d + 1])
            x = nn.ConvTranspose(feats, stride, strides=stride,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"up_{d}")(x)
            x = jnp.concatenate([x, skips[d]], axis=-1)
            k = tuple(cfg.kernel_sizes[d])
            x = ConvBlock3D(feats, kernel=k, name=f"dec_{d}_0", **common)(x)
            for c in range(1, cfg.n_conv_per_stage):
                x = ConvBlock3D(feats, kernel=k, name=f"dec_{d}_{c}", **common)(x)
            if cfg.deep_supervision or d == 0:
                seg = nn.Conv(cfg.num_classes, (1, 1, 1), dtype=self.dtype,
                              param_dtype=self.param_dtype, name=f"seg_{d}")(x)
                seg_outputs.append(seg.astype(jnp.float32))

        seg_outputs = seg_outputs[::-1]
        if cfg.deep_supervision and train:
            return seg_outputs
        return seg_outputs[0]
