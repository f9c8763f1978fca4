"""Shared flax building blocks for the SD v1.5 VAE / UNet.

All modules are NHWC (TPU-native conv layout), keep parameters in
``param_dtype`` (fp32 by default) and compute in ``dtype`` (bf16 for speed).
Behavioral contract follows diffusers' ResnetBlock2D / Transformer2DModel /
Attention as used by SD v1.5 (reference loads them via
``StableDiffusionImg2ImgPipeline``, ``ldiffusion.py:66-70``); the
implementation is original and TPU-first (flash attention for spatial
self-attention, XLA-fused GroupNorm+SiLU).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldiffusion_tpu.ops.attention import dot_product_attention
from ldiffusion_tpu.ops.groupnorm import groupnorm_silu_trainable
from ldiffusion_tpu.ops.quant import (
    conv_shape_gate,
    int8_conv,
    int8_matmul,
    quant_mode,
)
from ldiffusion_tpu.ops.resize import upsample_nearest_2x


class QConv(nn.Module):
    """``nn.Conv``-compatible conv (identical param names/shapes/init) with
    an optional int8 W8A8 forward (``ops/quant.py``, toggled by
    ``set_quant_mode`` — v5e int8 MXU runs at 2× the bf16 rate). Master
    params stay in ``param_dtype``; quantization is forward-math only, so
    checkpoints are mode-independent."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype) if self.use_bias else None
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        mode = quant_mode()
        gated = conv_shape_gate(x.shape[-1], self.features)
        if mode == "int8_all" or (
                mode in ("int8", "int8_record", "int8_static") and gated):
            # site key = flax module path: stable across programs (the scanned
            # trajectory vs the single-step calibration run hit the same keys)
            site = "/".join(self.scope.path) if mode in (
                "int8_record", "int8_static") else None
            return int8_conv(x, kernel, self.strides, pad, bias,
                             out_dtype=self.dtype, site=site)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QDense(nn.Module):
    """``nn.Dense``-compatible linear with the optional int8 W8A8 forward."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype) if self.use_bias else None
        # matmuls measured ~1.0x under int8 at our shapes (memory-bound,
        # tools/bench_int8.py) — only the ablation mode quantizes them
        if quant_mode() == "int8_all":
            return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm→SiLU through the fused Pallas kernel (``ops/groupnorm.py``;
    auto-dispatch falls back to XLA off-TPU or for VMEM-exceeding inputs).
    Param layout matches ``nn.GroupNorm`` (scale/bias), so checkpoints are
    interchangeable with the unfused path."""

    groups: int = 32
    eps: float = 1e-5
    silu: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return groupnorm_silu_trainable(
            x.astype(self.dtype), scale.astype(jnp.float32),
            bias.astype(jnp.float32), self.groups, self.eps, self.silu
        ).astype(self.dtype)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0, dtype=jnp.float32):
    """Sinusoidal embedding, diffusers convention with flip_sin_to_cos=True,
    downscale_freq_shift=0 (SD v1.5): output is [cos | sin]."""
    timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    return emb.astype(dtype)


class TimeEmbedding(nn.Module):
    """2-layer MLP over the sinusoidal embedding (SD: 320 -> 1280 -> 1280)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    """GN→SiLU→Conv3x3 [+time] →GN→SiLU→Conv3x3 with (1x1) skip."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        gn = lambda name: FusedGroupNormSiLU(self.groups, self.eps, dtype=self.dtype,
                                             param_dtype=self.param_dtype, name=name)
        h = gn("norm1")(x)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = gn("norm2")(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv_shortcut")(residual)
        return h + residual


class Downsample(nn.Module):
    """Stride-2 3x3 conv. UNet uses symmetric pad 1; the VAE encoder uses
    asymmetric (0,1) padding (diffusers Downsample2D padding=0 + manual pad)."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return QConv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        return QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv")(x)


class Attention(nn.Module):
    """Multi-head attention (self when ``context`` is None, else cross)."""

    num_heads: int
    head_dim: int
    out_channels: Optional[int] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.num_heads * self.head_dim
        out_ch = self.out_channels or x.shape[-1]
        context = x if context is None else context
        dense = lambda feat, name, bias: QDense(
            feat, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense(inner, "to_q", self.use_bias)(x)
        k = dense(inner, "to_k", self.use_bias)(context)
        v = dense(inner, "to_v", self.use_bias)(context)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, sq, inner)
        return dense(out_ch, "to_out", True)(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> 4*dim gated -> dim), SD transformer FF."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = QDense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU uses torch F.gelu, not tanh-approx
        h = h * nn.gelu(gate, approximate=False)
        return QDense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    """LN→self-attn→LN→cross-attn→LN→GEGLU-FF, all residual."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # eps 1e-5 = torch nn.LayerNorm default used by diffusers
        # BasicTransformerBlock (flax default would be 1e-6)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = lambda name: Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype,
                            name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN → 1x1 conv in → blocks → 1x1 conv out + residual.

    SD v1.5 uses conv (not linear) projections (use_linear_projection=False).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = FusedGroupNormSiLU(self.groups, 1e-6, silu=False, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="norm")(x)
        x = QConv(c, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = TransformerBlock(self.num_heads, self.head_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"transformer_blocks_{i}")(x, context)
        x = x.reshape(b, h, w, c)
        x = QConv(c, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(x)
        return x + residual


class VAEAttention(nn.Module):
    """Single-head attention block used in the VAE mid-block (GN → qkv → proj,
    residual)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = FusedGroupNormSiLU(self.groups, 1e-6, silu=False, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: QDense(c, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(y)[:, :, None, :]  # single head
        k = dense("to_k")(y)[:, :, None, :]
        v = dense("to_v")(y)[:, :, None, :]
        out = dot_product_attention(q, k, v).reshape(b, h * w, c)
        out = dense("to_out")(out).reshape(b, h, w, c)
        return out + residual
