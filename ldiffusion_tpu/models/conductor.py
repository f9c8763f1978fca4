"""Attention-decorated segmentation nets (reference ``model/conductor.py``).

``CBAM`` (channel+spatial attention, reference ``conductor.py:13-73``),
``ASPP`` (atrous pyramid, ``:76-112``), ``TissueSegNet`` (ConvNeXt-Tiny
backbone → CBAM → ASPP → conv decoder, ``:114-136`` — defined by the
reference but unused in its tissue path, which routes through nnUNet;
provided here for full component parity) and ``TissueSegWithDepthHeatmap``
(the RGB-D remote-sensing orphan, ``:235-295``).

The ConvNeXt-Tiny backbone is implemented natively in flax (no torchvision
at runtime); its weights convert from a torchvision state dict when given.
BatchNorm layers follow the reference blocks; NHWC throughout.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldiffusion_tpu.ops.resize import resize_bilinear


class BasicConv(nn.Module):
    """Conv→BN→ReLU (reference ``conductor.py:13-29``)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.stride, self.stride),
                    padding=self.padding, kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class ChannelAttention(nn.Module):
    """avg+max pooled MLP gate (reference ``conductor.py:31-48``)."""

    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp = nn.Sequential([
            nn.Dense(c // self.ratio, use_bias=False, dtype=self.dtype, name="fc1"),
            nn.relu,
            nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2"),
        ])
        gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))
        return gate[:, None, None, :]


class SpatialAttention(nn.Module):
    """channel-avg|max → 7x7 conv gate (reference ``conductor.py:50-62``)."""

    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        cat = jnp.concatenate([avg, mx], axis=-1)
        k = self.kernel_size
        gate = nn.Conv(1, (k, k), padding=(k - 1) // 2, use_bias=False,
                       dtype=self.dtype, name="conv")(cat)
        return jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    """x * channel_att(x) * spatial_att(x) (reference ``conductor.py:64-73``)."""

    ratio: int = 16
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x * ChannelAttention(self.ratio, dtype=self.dtype, name="channel_att")(x)
        x = x * SpatialAttention(self.kernel_size, dtype=self.dtype, name="spatial_att")(x)
        return x


class ASPP(nn.Module):
    """Atrous pyramid, dilations (1,6,12,18) + global pool (reference
    ``conductor.py:76-112``)."""

    out_channels: int = 256
    dilations: Tuple[int, ...] = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, d in enumerate(self.dilations):
            if d == 1:
                outs.append(BasicConv(self.out_channels, 1, dtype=self.dtype,
                                      name=f"branch_{i}")(x, train))
            else:
                outs.append(BasicConv(self.out_channels, 3, padding=d, dilation=d,
                                      dtype=self.dtype, name=f"branch_{i}")(x, train))
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = BasicConv(self.out_channels, 1, dtype=self.dtype, name="global_branch")(g, train)
        g = jnp.broadcast_to(g, x.shape[:3] + (self.out_channels,))
        outs.append(g)
        cat = jnp.concatenate(outs, axis=-1)
        out = BasicConv(self.out_channels, 1, dtype=self.dtype, name="project")(cat, train)
        # reference applies Dropout(0.5) here at train time
        out = nn.Dropout(0.5, deterministic=not train, name="dropout")(out)
        return out


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * 4, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return residual + x * gamma


class ConvNeXtTiny(nn.Module):
    """ConvNeXt-Tiny feature extractor: stages (3,3,9,3) × dims
    (96,192,384,768) → (B, H/32, W/32, 768) — the reference backbone
    (``conductor.py:117-119``, torchvision children()[:-2])."""

    dims: Tuple[int, ...] = (96, 192, 384, 768)
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(x)
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if i > 0:
                x = nn.LayerNorm(dtype=self.dtype, name=f"down_{i}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_{i}_conv")(x)
            for j in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage_{i}_block_{j}")(x)
        return x


@dataclasses.dataclass(frozen=True)
class TissueSegNetConfig:
    num_classes: int = 7
    backbone_dims: Tuple[int, ...] = (96, 192, 384, 768)
    backbone_depths: Tuple[int, ...] = (3, 3, 9, 3)

    @staticmethod
    def tiny(num_classes: int = 7) -> "TissueSegNetConfig":
        return TissueSegNetConfig(num_classes=num_classes,
                                  backbone_dims=(8, 16, 32, 32),
                                  backbone_depths=(1, 1, 1, 1))


class TissueSegNet(nn.Module):
    """ConvNeXt → CBAM(768) → ASPP(768→256) → decoder → upsample; returns
    {"out"} (reference ``conductor.py:114-136``)."""

    config: TissueSegNetConfig = TissueSegNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        feat = ConvNeXtTiny(cfg.backbone_dims, cfg.backbone_depths, dtype=self.dtype,
                            name="backbone")(x)
        feat = CBAM(ratio=min(16, cfg.backbone_dims[-1]), dtype=self.dtype,
                    name="cbam")(feat)
        feat = ASPP(min(256, cfg.backbone_dims[-1] * 2), dtype=self.dtype,
                    name="aspp")(feat, train)
        h = BasicConv(feat.shape[-1], 3, padding=1, dtype=self.dtype,
                      name="decoder_conv")(feat, train)
        out = nn.Conv(cfg.num_classes, (1, 1), dtype=self.dtype, name="decoder_out")(h)
        out = resize_bilinear(out.astype(jnp.float32), x.shape[1:3])
        return {"out": out}


class TissueSegWithDepthHeatmap(nn.Module):
    """RGB-D seg net with heatmap head (reference ``conductor.py:235-295``,
    orphan in the reference: unreachable from LDiffusionModel)."""

    num_classes: int
    backbone_dims: Tuple[int, ...] = (96, 192, 384, 768)
    backbone_depths: Tuple[int, ...] = (3, 3, 9, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth, train: bool = False):
        dims = self.backbone_dims
        rgb_feat = ConvNeXtTiny(dims, self.backbone_depths, dtype=self.dtype,
                                name="rgb_backbone")(rgb)
        d = depth
        for i, ch in enumerate((64, 128, 256, 512)):
            d = BasicConv(ch, 7 if i == 0 else 3, stride=2, padding=3 if i == 0 else 1,
                          dtype=self.dtype, name=f"depth_{i}")(d, train)
        d = BasicConv(dims[-1], 1, dtype=self.dtype, name="depth_proj")(d, train)
        if d.shape[1:3] != rgb_feat.shape[1:3]:
            d = resize_bilinear(d, rgb_feat.shape[1:3])
        fused = jnp.concatenate([rgb_feat, d], axis=-1)
        hm = BasicConv(512, 3, padding=1, dtype=self.dtype, name="hm_0")(fused, train)
        hm = BasicConv(256, 3, padding=1, dtype=self.dtype, name="hm_1")(hm, train)
        heatmap = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="hm_out")(hm)
        heatmap_up = resize_bilinear(heatmap.astype(jnp.float32), rgb.shape[1:3])

        seg = CBAM(ratio=min(16, dims[-1]), dtype=self.dtype, name="cbam")(rgb_feat)
        seg = ASPP(min(256, dims[-1] * 2), dtype=self.dtype, name="aspp")(seg, train)
        seg = jnp.concatenate([seg, heatmap], axis=-1)
        seg = BasicConv(256, 3, padding=1, dtype=self.dtype, name="dec_0")(seg, train)
        seg = BasicConv(256, 3, padding=1, dtype=self.dtype, name="dec_1")(seg, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="dec_out")(seg)
        seg_out = resize_bilinear(seg.astype(jnp.float32), rgb.shape[1:3])
        return {"seg": seg_out, "heatmap": heatmap_up}
