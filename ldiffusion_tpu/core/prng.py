"""PRNG utilities.

The reference draws Laplace noise through torch.distributions
(``ldiffusion.py:235-236``, ``segmentor.py:344``). Here noise is a pure
function of a threaded ``jax.random`` key so every step is reproducible and
shardable (each device generates its own slice of the noise under pjit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def laplace(key: jax.Array, shape, scale, dtype=jnp.float32) -> jax.Array:
    """Sample Laplace(0, scale) noise.

    Equivalent to ``torch.distributions.Laplace(0, scale).sample(shape)``
    (reference ``ldiffusion.py:235-236``). ``scale`` may be a scalar or an
    array broadcastable to ``shape`` (per-timestep sqrt(1-alpha_bar_t)).
    """
    return jax.random.laplace(key, shape, dtype) * jnp.asarray(scale, dtype)


def fold_in_step(key: jax.Array, *indices: int) -> jax.Array:
    """Derive a fresh key for (epoch, step, ...) without host round-trips."""
    for i in indices:
        key = jax.random.fold_in(key, i)
    return key
