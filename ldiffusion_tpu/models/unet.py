"""SD v1.5 UNet2DCondition in flax (NHWC, bf16 compute, flash attention).

Behavioral contract: diffusers ``UNet2DConditionModel`` as loaded by the
reference (``ldiffusion.py:139``, ``segmentor.py:79``) with the SD v1.5
config: 4→4 channels, blocks (320, 640, 1280, 1280), 8 attention heads,
cross-attention dim 768, epsilon prediction. Weights convert 1:1 from an SD
checkpoint directory (see ``models/convert.py``).

TPU-first choices: NHWC convs (MXU-friendly), spatial self-attention through
the Pallas flash kernel (``ops/attention.py``), everything shape-static so the
whole denoise step jits into one XLA program; ``jax.checkpoint`` is applied
per down/up block by the trainers for rematerialization.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ldiffusion_tpu.models.layers import (
    Downsample,
    FusedGroupNormSiLU,
    ResnetBlock,
    TimeEmbedding,
    Transformer2D,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # SD v1.5: number of heads; head size = ch // heads
    norm_num_groups: int = 32
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )

    @staticmethod
    def sd15() -> "UNet2DConditionConfig":
        return UNet2DConditionConfig()

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNet2DConditionConfig":
        """Small config for tests (structure identical, dims tiny)."""
        return UNet2DConditionConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=2,
            norm_num_groups=8,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        )


class UNet2DCondition(nn.Module):
    config: UNet2DConditionConfig = UNet2DConditionConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 down_block_residuals=None, mid_residual=None):
        """sample: (B, H, W, C_in) latents; timesteps: () or (B,);
        encoder_hidden_states: (B, S_text, cross_attention_dim).
        ``down_block_residuals``/``mid_residual`` are optional ControlNet
        residuals added to the skip list / mid output (diffusers
        ``down_block_additional_residuals`` semantics, used by the
        reference's multimodal path ``segmentor.py:357-372``).
        Returns epsilon prediction, (B, H, W, C_out)."""
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        time_dim = ch0 * 4
        heads = cfg.attention_head_dim

        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        if timesteps.shape[0] == 1 and sample.shape[0] > 1:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, ch0, dtype=self.dtype)
        temb = TimeEmbedding(time_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                             name="time_embedding")(temb)

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ctx = encoder_hidden_states.astype(self.dtype)
        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in", **common)(sample.astype(self.dtype))

        # ---- down ----
        residuals = [h]
        for i, (btype, ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            attn = btype == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, groups=cfg.norm_num_groups,
                                name=f"down_{i}_resnet_{j}", **common)(h, temb)
                if attn:
                    h = Transformer2D(heads, ch // heads, groups=cfg.norm_num_groups,
                                      name=f"down_{i}_attn_{j}", **common)(h, ctx)
                residuals.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, name=f"down_{i}_downsample", **common)(h)
                residuals.append(h)

        if down_block_residuals is not None:
            residuals = [r + extra for r, extra in zip(residuals, down_block_residuals)]

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, groups=cfg.norm_num_groups, name="mid_resnet_0", **common)(h, temb)
        h = Transformer2D(heads, mid_ch // heads, groups=cfg.norm_num_groups,
                          name="mid_attn", **common)(h, ctx)
        h = ResnetBlock(mid_ch, groups=cfg.norm_num_groups, name="mid_resnet_1", **common)(h, temb)
        if mid_residual is not None:
            h = h + mid_residual

        # ---- up ----
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev_channels[i]
            attn = btype == "CrossAttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock(ch, groups=cfg.norm_num_groups,
                                name=f"up_{i}_resnet_{j}", **common)(h, temb)
                if attn:
                    h = Transformer2D(heads, ch // heads, groups=cfg.norm_num_groups,
                                      name=f"up_{i}_attn_{j}", **common)(h, ctx)
            if i < len(cfg.up_block_types) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample", **common)(h)

        h = FusedGroupNormSiLU(cfg.norm_num_groups, 1e-5, name="conv_norm_out",
                               **common)(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **common)(h)
        return h.astype(jnp.float32)
