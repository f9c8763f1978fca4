"""Device-side image resizing.

The reference resizes constantly on host/CUDA via torchvision / F.interpolate
(``ldiffusion.py:200,225,240,251``, ``model/loss.py:35-36``). Here resizing is
XLA (``jax.image.resize``), so it fuses into surrounding compute and never
leaves HBM.

Semantics: ``bilinear`` uses half-pixel centers == torch
``align_corners=False`` — including on DOWNSCALE, where torch F.interpolate
does not antialias by default, so ``antialias=False`` is forced (jax.image
defaults to True when shrinking); ``nearest`` matches torch's floor
convention for integer upscales (the only uses in the pipeline).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size, channel_last: bool = True) -> jax.Array:
    """Resize spatial dims to ``size=(H, W)``. x: (..., H, W, C) if
    channel_last else (..., C, H, W)."""
    h, w = size
    if channel_last:
        shape = x.shape[:-3] + (h, w, x.shape[-1])
    else:
        shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x, shape, method="bilinear", antialias=False).astype(x.dtype)


def resize_nearest(x: jax.Array, size, channel_last: bool = True) -> jax.Array:
    h, w = size
    if channel_last:
        shape = x.shape[:-3] + (h, w, x.shape[-1])
    else:
        shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x, shape, method="nearest")


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """2x nearest upsample, NHWC — cheaper than general resize (pure reshape/
    broadcast, fuses with the following conv)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def rgb_to_gray(x: jax.Array) -> jax.Array:
    """ITU-R 601 luma, matching the reference's trajectory-feature reduction
    weights [0.2989, 0.5870, 0.1140] (``ldiffusion.py:241-242``). NHWC -> NHW1."""
    w = jnp.asarray([0.2989, 0.5870, 0.1140], x.dtype)
    return jnp.einsum("...c,c->...", x, w)[..., None]
