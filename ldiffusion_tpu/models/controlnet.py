"""ControlNet for the multimodal (RGB-D) augment path.

Behavioral contract: diffusers ``ControlNetModel`` as used by the reference's
remote-sensing experiment (``segmentor.py:301-386``): an SD-UNet-encoder copy
conditioned on an image (depth) through a small conv embedding, emitting
zero-conv residuals for every UNet skip plus the mid block. The residuals
feed ``UNet2DCondition(..., down_block_residuals=..., mid_residual=...)``.

Weight conversion from a diffusers ControlNet checkpoint reuses the UNet
mapping for shared names plus the controlnet-specific embeddings/zero-convs.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ldiffusion_tpu.models.layers import (
    Downsample,
    ResnetBlock,
    TimeEmbedding,
    Transformer2D,
    timestep_embedding,
)
from ldiffusion_tpu.models.unet import UNet2DConditionConfig


class ControlNet(nn.Module):
    config: UNet2DConditionConfig = UNet2DConditionConfig()
    conditioning_channels: int = 3
    conditioning_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, controlnet_cond,
                 conditioning_scale: float = 1.0):
        """sample: (B, h, w, 4) latents; controlnet_cond: (B, 8h, 8w, 3)
        conditioning image. Returns (down_block_residuals tuple, mid_residual)."""
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        heads = cfg.attention_head_dim
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        if timesteps.shape[0] == 1 and sample.shape[0] > 1:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = TimeEmbedding(ch0 * 4, name="time_embedding", **common)(
            timestep_embedding(timesteps, ch0, dtype=self.dtype))
        ctx = encoder_hidden_states.astype(self.dtype)

        # conditioning embedding: conv stack downsampling 8x to latent grid
        c = controlnet_cond.astype(self.dtype)
        c = nn.Conv(self.conditioning_embed_channels[0], (3, 3), padding=1,
                    name="cond_in", **common)(c)
        c = nn.silu(c)
        for i, chans in enumerate(self.conditioning_embed_channels[1:]):
            c = nn.Conv(chans, (3, 3), padding=1, name=f"cond_{i}_a", **common)(c)
            c = nn.silu(c)
            c = nn.Conv(chans, (3, 3), strides=(2, 2), padding=1,
                        name=f"cond_{i}_b", **common)(c)
            c = nn.silu(c)
        c = nn.Conv(ch0, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
                    name="cond_out", **common)(c)

        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in", **common)(
            sample.astype(self.dtype))
        h = h + c

        zero_conv = lambda feats, name: nn.Conv(
            feats, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name=name, **common)

        residuals = [zero_conv(ch0, "zero_conv_0")(h)]
        zc = 1
        for i, (btype, ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            attn = btype == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, groups=cfg.norm_num_groups,
                                name=f"down_{i}_resnet_{j}", **common)(h, temb)
                if attn:
                    h = Transformer2D(heads, ch // heads,
                                      name=f"down_{i}_attn_{j}", **common)(h, ctx)
                residuals.append(zero_conv(ch, f"zero_conv_{zc}")(h))
                zc += 1
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, name=f"down_{i}_downsample", **common)(h)
                residuals.append(zero_conv(ch, f"zero_conv_{zc}")(h))
                zc += 1

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, groups=cfg.norm_num_groups, name="mid_resnet_0",
                        **common)(h, temb)
        h = Transformer2D(heads, mid_ch // heads, name="mid_attn", **common)(h, ctx)
        h = ResnetBlock(mid_ch, groups=cfg.norm_num_groups, name="mid_resnet_1",
                        **common)(h, temb)
        mid = zero_conv(mid_ch, "zero_conv_mid")(h)

        scale = jnp.asarray(conditioning_scale, self.dtype)
        return tuple(r * scale for r in residuals), mid * scale
