"""nnUNet-style dynamic 2D UNet (plan-driven topology) in flax.

Behavioral contract: ``PlainConvUNet`` as built by the vendored nnUNetv2 from
plans (reference ``model/nnunetv2/utilities/get_network_from_plans.py:9-77``):
per-stage [conv3x3 → InstanceNorm → LeakyReLU(0.01)] ×2, strided-conv
downsampling, transpose-conv upsampling with skip concat, 1x1 segmentation
heads at every decoder stage for deep supervision
(``nnUNetTrainer.py:364-373``).

TPU-first: NHWC, bf16 compute, channel counts rounded to MXU-friendly
multiples by the planner, instance norm fused by XLA. Topology (n_stages,
features, strides) comes from the plan (``segmentor/planner.py``).
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DynUNetConfig:
    in_channels: int = 3
    num_classes: int = 7
    features_per_stage: Tuple[int, ...] = (32, 64, 128, 256, 512, 512, 512)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2, 2, 2)  # per-stage downsampling
    n_conv_per_stage: int = 2
    kernel_size: int = 3
    deep_supervision: bool = True
    norm_eps: float = 1e-5
    negative_slope: float = 0.01
    # "instance" (nnUNet default) or "batch" (the nnUNetTrainerBN variant,
    # reference variants/network_architecture/nnUNetTrainerBN.py — swaps
    # every norm_op for BatchNorm, eps 1e-5, affine). BatchNorm adds a
    # "batch_stats" collection (running mean/var) that the trainer threads
    # through train steps and checkpoints.
    norm: str = "instance"
    # "plain": [conv-IN-lrelu]xN stages (PlainConvUNet). "residual": encoder
    # stages are BasicBlockD residual blocks (ResidualEncoderUNet, reference
    # ``experiment_planning/experiment_planners/resencUNet_planner.py`` /
    # dynamic-network-architectures ResidualEncoderUNet); decoder stays plain.
    block_type: str = "plain"
    # residual blocks per encoder stage (ResEnc-M schedule when None)
    n_blocks_per_stage: Tuple[int, ...] = ()
    # jax.checkpoint the decoder conv blocks: recompute them in the backward
    # instead of keeping activations (the fwd+bwd dominates the 1024² step;
    # remat trades FLOPs for HBM → larger batches)
    remat_decoder: bool = False

    @property
    def n_stages(self) -> int:
        return len(self.features_per_stage)

    @staticmethod
    def tiny(num_classes: int = 7) -> "DynUNetConfig":
        return DynUNetConfig(num_classes=num_classes,
                             features_per_stage=(8, 16, 32), strides=(1, 2, 2))


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization with affine params
    (torch InstanceNorm2d(affine=True) semantics used by nnUNet)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # statistics in f32 (a 1024² spatial sum in bf16 loses the mantissa;
        # torch AMP — the reference's regime — keeps norm stats in f32). The
        # casts live INSIDE the reductions so they fuse; the normalize stays
        # in the compute dtype, keeping backward residuals bf16 (an f32
        # elementwise formulation doubled activation memory and OOMed the
        # 2x1024² train step).
        mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        rstd = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


def _norm_layer(kind: str, name: str, eps, dtype, param_dtype, train: bool):
    """InstanceNorm (default) or BatchNorm (nnUNetTrainerBN). BatchNorm uses
    torch defaults: momentum 0.1 (flax momentum = 1 - 0.1 = 0.9), running
    stats at eval."""
    if kind == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=eps, dtype=dtype, param_dtype=param_dtype,
                            name=name)
    return InstanceNorm(eps, dtype=dtype, param_dtype=param_dtype, name=name)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    kernel_size: int = 3
    eps: float = 1e-5
    negative_slope: float = 0.01
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.stride, self.stride),
                    padding=k // 2, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = _norm_layer(self.norm, "norm", self.eps, self.dtype,
                        self.param_dtype, train)(x)
        return nn.leaky_relu(x, self.negative_slope)


class ResidualBlock(nn.Module):
    """BasicBlockD: conv(stride)-IN-lrelu → conv-IN, skip via 1x1-conv+IN on
    shape change, lrelu after the add (nnUNet's residual encoder block,
    reference resencUNet_planner.py → dynamic_network_architectures
    BasicBlockD semantics)."""

    features: int
    stride: int = 1
    kernel_size: int = 3
    eps: float = 1e-5
    negative_slope: float = 0.01
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        conv = lambda name, stride: nn.Conv(
            self.features, (k, k), strides=(stride, stride), padding=k // 2,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        norm = lambda name: _norm_layer(self.norm, name, self.eps, self.dtype,
                                        self.param_dtype, train)
        h = nn.leaky_relu(norm("norm1")(conv("conv1", self.stride)(x)),
                          self.negative_slope)
        h = norm("norm2")(conv("conv2", 1)(h))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="downsample_conv")(x)
            x = norm("downsample_norm")(x)
        return nn.leaky_relu(h + x, self.negative_slope)


# ResEnc-M per-stage encoder block counts (nnUNetPlannerResEncM defaults)
RESENC_M_BLOCKS = (1, 3, 4, 6, 6, 6, 6)


class DynUNet(nn.Module):
    config: DynUNetConfig = DynUNetConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C_in). Returns list of logits [full, 1/2, 1/4, ...]
        (deep supervision; highest resolution first, reference trainer
        convention) or a single array when deep_supervision is off."""
        cfg = self.config
        common = dict(kernel_size=cfg.kernel_size, eps=cfg.norm_eps,
                      negative_slope=cfg.negative_slope, norm=cfg.norm,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)

        skips: List[jax.Array] = []
        if cfg.block_type == "residual":
            blocks = cfg.n_blocks_per_stage or RESENC_M_BLOCKS[:cfg.n_stages]
            for s in range(cfg.n_stages):
                feats = cfg.features_per_stage[s]
                x = ResidualBlock(feats, stride=cfg.strides[s],
                                  name=f"enc_{s}_0", **common)(x, train)
                for c in range(1, blocks[s]):
                    x = ResidualBlock(feats, name=f"enc_{s}_{c}", **common)(x, train)
                skips.append(x)
        else:
            for s in range(cfg.n_stages):
                feats = cfg.features_per_stage[s]
                x = ConvBlock(feats, stride=cfg.strides[s],
                              name=f"enc_{s}_0", **common)(x, train)
                for c in range(1, cfg.n_conv_per_stage):
                    x = ConvBlock(feats, name=f"enc_{s}_{c}", **common)(x, train)
                skips.append(x)

        # remat'd decoder blocks recompute in the backward (static_argnums:
        # 0 = module self, 2 = the train bool)
        dec_block = nn.checkpoint(ConvBlock, static_argnums=(2,)) \
            if cfg.remat_decoder else ConvBlock
        seg_outputs: List[jax.Array] = []
        for d in range(cfg.n_stages - 2, -1, -1):
            feats = cfg.features_per_stage[d]
            stride = cfg.strides[d + 1]
            x = nn.ConvTranspose(feats, (stride, stride), strides=(stride, stride),
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"up_{d}")(x)
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = dec_block(feats, name=f"dec_{d}_0", **common)(x, train)
            for c in range(1, cfg.n_conv_per_stage):
                x = dec_block(feats, name=f"dec_{d}_{c}", **common)(x, train)
            if cfg.deep_supervision or d == 0:
                seg = nn.Conv(cfg.num_classes, (1, 1), dtype=self.dtype,
                              param_dtype=self.param_dtype, name=f"seg_{d}")(x)
                seg_outputs.append(seg.astype(jnp.float32))

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if cfg.deep_supervision and train:
            return seg_outputs
        return seg_outputs[0]
