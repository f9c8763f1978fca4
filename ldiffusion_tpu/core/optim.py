"""Adan — Adaptive Nesterov momentum (Xie et al., arXiv:2208.06677) as an
optax ``GradientTransformation``.

The reference's eight ``nnUNetTrainerAdan*`` variants train with
``adan_pytorch.Adan`` (reference
``variants/optimizer/nnUNetTrainerAdan.py:7-19``: default betas
``(0.02, 0.08, 0.01)``, decoupled weight decay). This implements the same
three-moment update with adan_pytorch's parameter convention — ``betas`` are
the EMA *new-sample* weights (``m = (1-b)*m + b*g``), bias-corrected by
``1/(1 - (1-b)^step)``, and weight decay divides the post-step parameter by
``(1 + lr*wd)`` — per Algorithm 1 of the paper:

    diff_k = g_k - g_{k-1}            (zero on the first step)
    m_k = (1-b1) m_{k-1} + b1 g_k
    v_k = (1-b2) v_{k-1} + b2 diff_k
    n_k = (1-b3) n_{k-1} + b3 (g_k + (1-b2) diff_k)^2
    u_k = (m̂_k + (1-b2) v̂_k) / (sqrt(n̂_k) + eps)
    θ_{k+1} = (θ_k - lr u_k) / (1 + lr wd)

Because the decay step is a function of the *parameter*, ``update`` requires
``params`` (like ``optax.adamw``'s decoupled decay).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: chex.Array            # int32 scalar, steps taken
    m: optax.Updates             # EMA of gradients
    v: optax.Updates             # EMA of gradient differences
    n: optax.Updates             # EMA of (g + (1-b2) diff)^2
    prev_grad: optax.Updates


def adan(learning_rate, betas=(0.02, 0.08, 0.01), eps: float = 1e-8,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adan optimizer. ``learning_rate`` may be a float or a schedule.

    ``betas`` follow adan_pytorch's convention (new-sample EMA weights, NOT
    torch-style decay rates): defaults ``(0.02, 0.08, 0.01)`` correspond to
    the paper's ``(β1, β2, β3) = (0.98, 0.92, 0.99)``.
    """
    b1, b2, b3 = betas

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(count=jnp.zeros((), jnp.int32), m=z, v=z, n=z,
                         prev_grad=z)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("adan requires params (decoupled weight decay)")
        count = optax.safe_int32_increment(state.count)
        first = state.count == 0

        def _diff(g, pg):
            return jnp.where(first, jnp.zeros_like(g), g - pg)

        tmap = jax.tree_util.tree_map
        m = tmap(lambda g, m: (1 - b1) * m + b1 * g, grads, state.m)
        v = tmap(lambda g, pg, v: (1 - b2) * v + b2 * _diff(g, pg),
                 grads, state.prev_grad, state.v)
        n = tmap(lambda g, pg, n:
                 (1 - b3) * n + b3 * jnp.square(g + (1 - b2) * _diff(g, pg)),
                 grads, state.prev_grad, state.n)

        # optax convention (scale_by_schedule, adamw): schedules are
        # evaluated at the PRE-increment count (first step uses schedule(0))
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        cf = count.astype(jnp.float32)
        c1 = 1.0 - (1.0 - b1) ** cf
        c2 = 1.0 - (1.0 - b2) ** cf
        c3 = 1.0 - (1.0 - b3) ** cf

        def delta(m, v, n, p):
            u = (m / c1 + (1 - b2) * v / c2) / (jnp.sqrt(n / c3) + eps)
            new_p = (p - lr * u) / (1.0 + lr * weight_decay)
            return new_p - p

        updates = jax.tree_util.tree_map(delta, m, v, n, params)
        return updates, AdanState(count=count, m=m, v=v, n=n, prev_grad=grads)

    return optax.GradientTransformation(init_fn, update_fn)
