"""SD v1.5 VAE (AutoencoderKL) in flax, NHWC.

Behavioral contract: diffusers ``AutoencoderKL`` as used by the reference —
``vae.encode(image).latent_dist.mean`` (``ldiffusion.py:228``) and
``vae.decode(latents)`` / ``pipeline.decode_latents`` (``ldiffusion.py:240``,
``segmentor.py:106``). ``decode_latents`` divides by the scaling factor
0.18215 and maps the output to [0, 1]; the raw ``decode`` does not — both are
exposed because the reference (quirkily) mixes them and the fine-tuned UNet is
trained around that convention.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldiffusion_tpu.models.layers import (
    Downsample,
    FusedGroupNormSiLU,
    ResnetBlock,
    Upsample,
    VAEAttention,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rb = lambda ch, name: ResnetBlock(ch, eps=1e-6, groups=cfg.norm_num_groups,
                                          use_time_emb=False, name=name, **common)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = rb(ch, f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, asymmetric_pad=True, name=f"down_{i}_downsample", **common)(h)
        ch = cfg.block_out_channels[-1]
        h = rb(ch, "mid_resnet_0")(h)
        h = VAEAttention(ch, groups=cfg.norm_num_groups, name="mid_attn", **common)(h)
        h = rb(ch, "mid_resnet_1")(h)
        h = FusedGroupNormSiLU(cfg.norm_num_groups, 1e-6, name="conv_norm_out",
                               **common)(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", **common)(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rb = lambda ch, name: ResnetBlock(ch, eps=1e-6, groups=cfg.norm_num_groups,
                                          use_time_emb=False, name=name, **common)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in", **common)(z)
        h = rb(ch, "mid_resnet_0")(h)
        h = VAEAttention(ch, groups=cfg.norm_num_groups, name="mid_attn", **common)(h)
        h = rb(ch, "mid_resnet_1")(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = rb(ch, f"up_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample", **common)(h)
        h = FusedGroupNormSiLU(cfg.norm_num_groups, 1e-6, name="conv_norm_out",
                               **common)(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **common)(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, name="encoder", **common)
        self.decoder = Decoder(self.config, name="decoder", **common)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv", **common)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv", **common)

    def encode_moments(self, x):
        """x: (B,H,W,3) in [-1,1] → (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32), jnp.clip(logvar, -30.0, 20.0).astype(jnp.float32)

    def encode_mean(self, x):
        """``latent_dist.mean`` — the deterministic encode used by the
        reference everywhere (``ldiffusion.py:228``, ``segmentor.py:99``)."""
        return self.encode_moments(x)[0]

    def encode_sample(self, x, rng):
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        """Raw decode: latents → image in [-1, 1] (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def decode_latents(self, z):
        """diffusers ``pipeline.decode_latents``: unscale by 0.18215, decode,
        map to [0, 1] (used on the 1-step transform path, ``segmentor.py:106``)."""
        img = self.decode(z / self.config.scaling_factor)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    def __call__(self, x, rng=None):
        mean, logvar = self.encode_moments(x)
        z = mean if rng is None else mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )
        return self.decode(z), mean, logvar
