"""Fused GroupNorm(+SiLU) Pallas kernel with XLA fallback.

Every SD ResnetBlock runs GroupNorm→SiLU→Conv (``models/layers.py``); XLA
fuses most of this chain, but the two-pass mean/var reduction still costs an
extra HBM round-trip at large channel counts. The Pallas kernel computes the
statistics and applies normalize+affine+SiLU in one VMEM residency per batch
row.

MXU-friendly statistics: per-group sums come from two small matmuls —
``ones(1,HW) @ x → (1,C)`` and ``(1,C) @ group_onehot(C,G) → (1,G)`` — so
the reduction runs on the systolic array instead of a long VPU tree.

Dispatch (measured, BASELINE.md round-2 ablations):
* rows that fit VMEM (small feature maps) → fully-fused single-row kernel;
* everything larger → the channel-minor XLA formulation, which beat BOTH
  Pallas alternatives at VAE shapes: a dedicated normalize kernel breaks
  XLA's elementwise fusion (11.97 vs 13.68 patches/s) and a stats-only
  kernel adds a full read that XLA's fused-with-producer reduction avoids
  (12.69). ``hybrid`` and ``pallas_chunked`` remain explicit A/B modes.
Gradients flow through the XLA path (custom_vjp wraps the kernel forwards).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MODE = "auto"  # "auto" | "xla" | "pallas" | "pallas_interpret"


def set_groupnorm_mode(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "xla", "pallas", "pallas_interpret", "pallas_chunked", "hybrid")
    _MODE = mode


def _stats_to_affine(s_c, ss_c, n_spatial, groups, c, scale, bias, eps):
    """(B, C) channel sums/sumsq → per-(B, C) affine (mul, add) implementing
    normalize+scale+bias. Variance via E[x²]-E[x]² clamped at 0 (the
    single-pass form can cancel below zero for mean ≫ std; the clamp keeps
    rsqrt finite — the residual precision loss vs two-pass is accepted and
    covered by the torch-parity tolerances)."""
    b = s_c.shape[0]
    n = n_spatial * (c // groups)
    s_g = jnp.sum(s_c.reshape(b, groups, c // groups), axis=2)    # (B, G)
    ss_g = jnp.sum(ss_c.reshape(b, groups, c // groups), axis=2)
    mean_g = s_g / n
    var_g = jnp.maximum(ss_g / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=1)               # (B, C)
    rstd_c = jnp.repeat(rstd_g, c // groups, axis=1)
    mul = rstd_c * scale[None, :].astype(jnp.float32)
    add = bias[None, :].astype(jnp.float32) - mean_c * mul
    return mul, add


def _xla_groupnorm_silu(x, scale, bias, groups: int, eps: float, silu: bool):
    """Channel-minor formulation: per-channel sum/sumsq over (H, W) first
    (layout-friendly reductions, C stays on lanes), then the group reduction
    on tiny (B, G) arrays, then one fused elementwise normalize pass.

    The naive ``reshape(b, hw, g, c/g)`` + reduce over (1, 3) forces XLA to
    materialize an f32 layout-changed copy of the whole tensor at VAE
    resolutions (profiled at ~60 ms/iter of f32 copies + reductions running
    at <10% HBM bandwidth in the 512² pipeline); this version has no big
    intermediate at all."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    s_c = jnp.sum(xf, axis=(1, 2))                     # (B, C)
    ss_c = jnp.sum(xf * xf, axis=(1, 2))               # (B, C)
    mul, add = _stats_to_affine(s_c, ss_c, h * w, groups, c, scale, bias, eps)
    y = xf * mul[:, None, None, :] + add[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, onehot_ref, o_ref, *, eps, silu, groups):
    x = x_ref[0].astype(jnp.float32)            # (HW, C)
    hw, c = x.shape
    onehot = onehot_ref[...]                     # (C, G) f32
    ones = jnp.ones((1, hw), jnp.float32)
    csum = jax.lax.dot_general(ones, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)      # (1, C)
    csumsq = jax.lax.dot_general(ones, x * x, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)    # (1, C)
    gsum = jax.lax.dot_general(csum, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)      # (1, G)
    gsumsq = jax.lax.dot_general(csumsq, onehot, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    n = hw * (c // groups)
    mean_g = gsum / n                                                    # (1, G)
    var_g = gsumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (1,G) @ (G,C)
    mean_c = jax.lax.dot_general(mean_g, onehot.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)    # (1, C)
    rstd_c = jax.lax.dot_general(rstd_g, onehot.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)   # (1, C)
    bias = bias_ref[...].astype(jnp.float32)
    mul = rstd_c * scale
    add = bias - mean_c * mul
    y = x * mul + add
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def _pallas_groupnorm_silu(x, scale, bias, groups, eps, silu, interpret=False):
    b, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(b, hw, c)
    onehot = jnp.asarray(np.kron(np.eye(groups, dtype=np.float32),
                                 np.ones((c // groups, 1), np.float32)))  # (C, G)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, silu=silu, groups=groups),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c), onehot)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Chunked two-kernel path for tensors too large for one VMEM residency
# (VAE resolutions: e.g. (8, 512, 512, 256)). Kernel 1 streams spatial chunks
# and emits per-chunk channel sums/sumsq via MXU matmuls (one full-bandwidth
# read of x); the tiny (B, chunks, C) partials reduce to group stats in XLA;
# kernel 2 streams chunks again applying normalize+affine(+SiLU) (one read +
# one write). Total traffic = 3 bf16 passes — the monolithic XLA fusions
# profiled at <10% HBM bandwidth here.
# ---------------------------------------------------------------------------

def _gn_stats_kernel(x_ref, s_ref, ss_ref):
    """Accumulates channel sums across the (sequential) chunk grid axis into
    a (1, 1, C) output block that stays resident for all chunks of a batch
    row (standard Pallas revisiting-reduction pattern)."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)              # (chunk, C)
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    cs = jax.lax.dot_general(ones, x, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    css = jax.lax.dot_general(ones, x * x, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        s_ref[0] = jnp.zeros_like(s_ref[0])
        ss_ref[0] = jnp.zeros_like(ss_ref[0])

    s_ref[0] = s_ref[0] + cs
    ss_ref[0] = ss_ref[0] + css


def _gn_apply_kernel(x_ref, mul_ref, add_ref, o_ref, *, silu):
    y = x_ref[0].astype(jnp.float32) * mul_ref[0] + add_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_chunk(hw: int, c: int = 128) -> int:
    # VMEM per grid step ≈ bf16 in/out blocks + f32 copies (x, x*x or y)
    # ≈ 8-12 bytes/elem with double buffering; keep the block ≤ ~512K elems
    cap = max(512, (512 * 1024) // c * 128 // 128)
    for chunk in (4096, 2048, 1024, 512):
        if chunk <= cap and hw % chunk == 0:
            return chunk
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_channel_stats(x, interpret=False):
    """(B, H, W, C) → per-channel (sum, sumsq), each (B, C) f32 — one
    full-bandwidth streaming read via MXU ones-matmuls."""
    b, h, w, c = x.shape
    hw = h * w
    chunk = _pick_chunk(hw, c)
    assert chunk > 0, f"no valid chunk size for hw={hw}, c={c}"
    x2 = x.reshape(b, hw, c)
    s, ss = pl.pallas_call(
        _gn_stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)),
        grid=(b, hw // chunk),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x2)
    return s[:, 0], ss[:, 0]


def _hybrid_groupnorm_silu(x, scale, bias, groups: int, eps: float, silu: bool,
                           interpret: bool = False):
    """Pallas stats + XLA normalize: the stats read streams at full HBM
    bandwidth (profiled: XLA's reduce-fusions for the same stats ran at
    ~78 GB/s), while the elementwise normalize stays in XLA so it fuses into
    neighboring producers/consumers (which a dedicated apply-kernel broke —
    see BASELINE.md round-2 ablations)."""
    b, h, w, c = x.shape
    if _pick_chunk(h * w, c) == 0:   # no valid chunking → XLA formulation
        return _xla_groupnorm_silu(x, scale, bias, groups, eps, silu)
    s_c, ss_c = _pallas_channel_stats(x, interpret=interpret)
    mul, add = _stats_to_affine(s_c, ss_c, h * w, groups, c, scale, bias, eps)
    y = x.astype(jnp.float32) * mul[:, None, None, :] + add[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def _pallas_groupnorm_silu_chunked(x, scale, bias, groups, eps, silu,
                                   interpret=False):
    b, h, w, c = x.shape
    hw = h * w
    chunk = _pick_chunk(hw, c)
    if chunk == 0:                    # no valid chunking → XLA formulation
        return _xla_groupnorm_silu(x, scale, bias, groups, eps, silu)
    n_chunks = hw // chunk
    x2 = x.reshape(b, hw, c)
    s, ss = pl.pallas_call(
        _gn_stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)),
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x2)
    mul, add = _stats_to_affine(s[:, 0], ss[:, 0], hw, groups, c, scale,
                                bias, eps)
    mul, add = mul[:, None, :], add[:, None, :]    # (B, 1, C)
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, mul, add)
    return out.reshape(b, h, w, c)


def _resolve_mode(shape) -> str:
    b, h, w, c = shape
    mode = _MODE
    if mode == "auto":
        if jax.default_backend() != "tpu" or c % 128 != 0 or (h * w) % 8 != 0:
            return "xla"
        # VMEM budget: f32 row + squared copy + output (~3x) plus
        # double-buffered bf16 in/out blocks must fit 16MB
        if (h * w * c * 4) <= 3 * 1024 * 1024:
            return "pallas"
        # Measured (BASELINE.md round 2): both Pallas alternatives lose to
        # the channel-minor XLA formulation at these shapes — the dedicated
        # apply kernel breaks XLA's elementwise fusion (11.97 vs 13.68
        # patches/s) and even a stats-only kernel costs an extra full read
        # that the fused-with-producer XLA reduction avoids (12.69).
        # "hybrid" / "pallas_chunked" stay as explicit A/B modes.
        return "xla"
    return mode


def groupnorm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                   silu: bool = True):
    """x: (B, H, W, C); scale/bias: (C,). Fused GroupNorm [+ SiLU]."""
    mode = _resolve_mode(x.shape)
    if mode == "xla":
        return _xla_groupnorm_silu(x, scale, bias, groups, eps, silu)
    if mode == "hybrid":
        return _hybrid_groupnorm_silu(x, scale, bias, groups, eps, silu)
    if mode == "pallas_chunked":
        return _pallas_groupnorm_silu_chunked(x, scale, bias, groups, eps, silu)
    return _pallas_groupnorm_silu(x, scale, bias, groups, eps, silu,
                                  interpret=(mode == "pallas_interpret"))


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward, XLA-derived backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pallas_gn_trainable(x, scale, bias, groups: int, eps: float, silu: bool):
    """Pallas forward + XLA-derived backward (mathematically identical)."""
    return groupnorm_silu(x, scale, bias, groups, eps, silu)


def _gn_fwd(x, scale, bias, groups, eps, silu):
    return groupnorm_silu(x, scale, bias, groups, eps, silu), (x, scale, bias)


def _gn_bwd(groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda xx, sc, bi: _xla_groupnorm_silu(xx, sc, bi, groups, eps, silu),
                     x, scale, bias)
    return vjp(g)


_pallas_gn_trainable.defvjp(_gn_fwd, _gn_bwd)


def groupnorm_silu_trainable(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                             silu: bool = True):
    """Trainable fused GroupNorm+SiLU. On the XLA path this is the plain
    (natively differentiable) function — no custom_vjp indirection; the
    custom-VJP wrapper is only used when the Pallas kernel is selected."""
    if _resolve_mode(x.shape) == "xla":
        return _xla_groupnorm_silu(x, scale, bias, groups, eps, silu)
    return _pallas_gn_trainable(x, scale, bias, groups, eps, silu)
