"""CLIP text encoder (SD v1.5 text tower: CLIP ViT-L/14) in flax.

Behavioral contract: the reference tokenizes a fixed prompt and takes
``text_encoder(input_ids)['last_hidden_state']`` (``ldiffusion.py:213-216``,
``segmentor.py:57-59``). A learned Linear projects 768 → cross_attention_dim
on top (``ldiffusion.py:150``); that projection lives with the trainers, not
here. Causal-masked transformer, quick-GELU activation, final LayerNorm.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp



@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 77
    layer_norm_eps: float = 1e-5

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                              num_heads=2, mlp_dim=64)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, d = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("q_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        # causal mask via explicit logits path (tiny seq — XLA is optimal)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None], logits, -1e9)
        probs = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, cfg.hidden_size)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        x = x + CLIPAttention(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                              name="self_attn")(ln("layer_norm1")(x))
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: (B, S) int32 → last_hidden_state (B, S, hidden)."""
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="position_embedding")(
            jnp.arange(input_ids.shape[1])[None, :]
        )
        x = x + pos
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                          name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="final_layer_norm")(x)
        return x.astype(jnp.float32)
