"""VGG19 feature extractor for the content loss.

Behavioral contract: ``torchvision.models.vgg19().features`` as used by the
reference content loss (``model/loss.py:15-41``) — the full conv stack
(config E) ending after pool5, output (B, 7, 7, 512) for 224² input. Weights
convert from a torchvision state dict when available; otherwise a fixed-seed
random (frozen) net serves as a deterministic multiscale feature projector.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG-19 configuration "E": conv channel counts with 'M' maxpools.
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGG19Features(nn.Module):
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) → (B, H/32, W/32, 512)."""
        conv_idx = 0
        for v in _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x.astype(jnp.float32)


def convert_vgg19(sd: Dict[str, np.ndarray]) -> dict:
    """Convert a torchvision vgg19 state dict (``features.N.weight``)."""
    layer_ids = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight")}
    )
    params = {}
    for conv_idx, lid in enumerate(layer_ids):
        params[f"conv_{conv_idx}"] = {
            "kernel": np.transpose(sd[f"features.{lid}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"features.{lid}.bias"],
        }
    return params
