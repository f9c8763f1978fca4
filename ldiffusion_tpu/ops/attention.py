"""Attention ops: Pallas flash-attention kernel with an XLA fallback.

The hot attention in this framework is the SD UNet's spatial self-attention
over 64x64=4096 latent tokens (reference runs it through diffusers/CUDA;
SURVEY §5 long-context note). A materialized 4096x4096 score matrix is
16-64MB per head — far beyond VMEM — so the Pallas kernel streams KV blocks
with an online softmax, keeping everything in VMEM and feeding the MXU with
(block x 128)-aligned matmuls.

Cross-attention (77 text tokens) has tiny score matrices; it takes the XLA
path where the compiler's fusion is already optimal.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Toggled by tests / benchmarks. "auto": pallas on TPU when shapes allow.
_MODE = "auto"  # "auto" | "xla" | "pallas" | "pallas_interpret"


def set_attention_mode(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "xla", "pallas", "pallas_interpret",
                    "pallas_kvgrid", "pallas_kvgrid_interpret"), mode
    _MODE = mode


def _xla_attention(q, k, v, scale):
    # (B, S, H, D) layout
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k):
    """One (batch*head, q-block) grid step; streams kv in ``block_k`` chunks.

    Matmul operands stay bf16 (native MXU rate; f32 dots decompose into
    multiple bf16 passes) with f32 accumulation via preferred_element_type —
    softmax statistics and the output accumulator are f32."""
    q = q_ref[0]                      # (BQ, D) bf16
    bq, d = q.shape
    n_kv = k_ref.shape[1] // block_k

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) f32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_attention_bhsd(q, k, v, scale, block_q=512, block_k=1024, interpret=False):
    # defaults tuned on v5e for the SD UNet shape (4096 tokens, 128-pad dim):
    # 512/1024 beats 256/512 by ~8% (tools/tune_attention.py)
    """q,k,v: (BH, S, D) with S % block == 0 and D % 128 == 0."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(2 * bh * sq * d + 2 * bh * sk * d) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(q, k, v)


def _flash_kvgrid_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                         *, scale):
    """Flash step with the KV dimension on the GRID (innermost, sequential):
    softmax statistics and the output accumulator live in VMEM scratch that
    persists across kv blocks of one (batch*head, q-block); the output block
    is written once on the last kv step. Unlike ``_flash_kernel`` this never
    holds the full KV in VMEM, so it covers large head dims (the VAE's
    single-head d=512 attention, which otherwise falls back to XLA and
    materializes the 4096² score matrix in HBM)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_attention_bhsd_kvgrid(q, k, v, scale, block_q=256, block_k=1024,
                                 interpret=False):
    """q,k,v: (BH, S, D), S % blocks == 0. VMEM per step is O(block_q*block_k
    + block_q*D) regardless of S — use for large D where the resident-KV
    kernel exceeds VMEM."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q, sk // block_k)
    return pl.pallas_call(
        functools.partial(_flash_kvgrid_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# flash backward (dq/dk/dv) — recomputed probabilities, no S² materialization
# ---------------------------------------------------------------------------

def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k):
    """Forward that ALSO emits the per-row logsumexp (m + log l) the flash
    backward needs. Only runs under differentiation (the inference path keeps
    the lse-free kernel)."""
    q = q_ref[0]
    bq, d = q.shape
    n_kv = k_ref.shape[1] // block_k

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_attention_bhsd_lse(q, k, v, scale, block_q=512, block_k=1024,
                              interpret=False):
    """Like ``_flash_attention_bhsd`` but returns (out, lse) with lse shaped
    (BH, S, 1) f32."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel_lse, scale=scale, block_k=block_k),
        out_shape=(jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_scr, *, scale, block_q):
    """One (batch*head, kv-block) grid step of the flash backward.

    Q, dO, LSE and Δ=rowsum(dO∘O) stay RESIDENT in VMEM; K/V stream per grid
    step. Probabilities are recomputed from LSE (exp(S·scale − lse)), so no
    S² score matrix ever exists:

        dV_j = Σ_i Pᵢⱼᵀ dOᵢ         dP = dO Vᵀ
        dSᵢⱼ = Pᵢⱼ ∘ (dPᵢⱼ − Δᵢ)·scale
        dK_j = Σ_i dSᵢⱼᵀ Qᵢ          dQᵢ += dSᵢⱼ K_j  (scratch accumulator,
                                      written on the last kv step)
    """
    jk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(jk == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    k = k_ref[0]                      # (BK, D) bf16
    v = v_ref[0]
    bk, d = k.shape
    sq = q_ref.shape[1]
    n_q = sq // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        rows = pl.ds(i * block_q, block_q)
        qi = q_ref[0, rows, :]        # (BQ, D)
        doi = do_ref[0, rows, :]
        lsei = lse_ref[0, rows, :]    # (BQ, 1) f32
        di = delta_ref[0, rows, :]
        s = jax.lax.dot_general(
            qi, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lsei)         # (BQ, BK) f32, recomputed probs
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(doi.dtype), doi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doi, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - di) * scale    # (BQ, BK) f32
        dsl = ds.astype(qi.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            dsl, qi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_scr[rows, :] += jax.lax.dot_general(
            dsl, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    zeros = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, n_q, body, (zeros, zeros))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)

    @pl.when(jk == nk - 1)
    def _write_dq():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_backward_bhsd(q, k, v, do, lse, delta, scale, block_q=512,
                         block_k=512, interpret=False):
    """(dq, dk, dv) for q,k,v,do: (BH, S, D); lse/delta: (BH, S, 1) f32."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sk // block_k)
    spec_q = pl.BlockSpec((1, sq, d), lambda b, j: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, sq, 1), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, block_q=block_q),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=grid,
        in_specs=[spec_q, spec_kv, spec_kv, spec_q, spec_row, spec_row],
        out_specs=(spec_q, spec_kv, spec_kv),
        scratch_shapes=[pltpu.VMEM((sq, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq * sk * d,
            bytes_accessed=(4 * bh * sq * d + 4 * bh * sk * d) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(q, k, v, do, lse, delta)


def _flash_bwd_fits_pallas(sq: int, sk: int, d: int, block_q: int,
                           block_k: int, itemsize: int = 2) -> bool:
    """The backward keeps Q/dO/LSE/Δ/dQ-scratch resident: gate on a VMEM
    budget (resident bytes ≲ 10 MB) and block divisibility. ``itemsize`` is
    the input dtype width (bf16 in production; f32 in tests doubles the
    residency)."""
    if sq % block_q or sk % block_k:
        return False
    resident = (2 * sq * d * itemsize   # q + do
                + sq * d * 4            # dq scratch, f32
                + 2 * sq * 128 * 4      # lse + delta (lane-padded f32)
                + 2 * block_k * d * (itemsize + 4))  # k/v blocks + dk/dv accs
    return resident <= 10 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_trainable(q, k, v, scale, block_q, block_k, interpret=False):
    """Pallas forward + Pallas flash backward (recomputed probabilities).

    The reference training config never reaches this path (it trains at 64²
    images → 64 latent tokens → XLA attention), but larger fine-tunes
    differentiate through 4096-token attention — the flash backward keeps
    peak memory O(S·D) instead of the XLA vjp's O(S²) score matrix."""
    return _flash_attention_bhsd(q, k, v, scale, block_q=block_q,
                                 block_k=block_k, interpret=interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret=False):
    out, lse = _flash_attention_bhsd_lse(q, k, v, scale, block_q=block_q,
                                         block_k=block_k, interpret=interpret)
    return out, (q, k, v, out, lse)


def _xla_attention_bwd(q, k, v, g, scale):
    """XLA-derived backward (materializes S²) — fallback for shapes the
    Pallas backward does not cover."""
    def ref(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    bwd_bq = min(block_q, 512)
    bwd_bk = min(block_k, 512)
    if not _flash_bwd_fits_pallas(sq, sk, d, bwd_bq, bwd_bk,
                                  itemsize=q.dtype.itemsize):
        return _xla_attention_bwd(q, k, v, g, scale)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # Δ = rowsum(dO ∘ O)
    return _flash_backward_bhsd(q, k, v, g.astype(q.dtype), lse, delta,
                                scale, block_q=bwd_bq, block_k=bwd_bk,
                                interpret=interpret)


_flash_trainable.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_kvgrid_trainable(q, k, v, scale, block_q, block_k):
    return _flash_attention_bhsd_kvgrid(q, k, v, scale, block_q=block_q,
                                        block_k=block_k)


def _flash_kvgrid_fwd(q, k, v, scale, block_q, block_k):
    return _flash_attention_bhsd_kvgrid(q, k, v, scale, block_q=block_q,
                                        block_k=block_k), (q, k, v)


def _flash_kvgrid_bwd(scale, block_q, block_k, res, g):
    # the kvgrid kernel exists for head dims too large for VMEM residency
    # (d=512): the resident-Q flash backward does not fit either, so this
    # path keeps the XLA vjp. It only arises on the (frozen-VAE) inference
    # side; no training config differentiates through it.
    q, k, v = res
    return _xla_attention_bwd(q, k, v, g, scale)


_flash_kvgrid_trainable.defvjp(_flash_kvgrid_fwd, _flash_kvgrid_bwd)


def dot_product_attention(q, k, v, scale=None):
    """Multi-head attention, (B, S, H, D) layout.

    Routes 128-aligned long-sequence self-attention to the Pallas flash
    kernel; everything else (e.g. 77-token cross-attention) to XLA.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    mode = _MODE
    if mode == "auto":
        on_tpu = jax.default_backend() == "tpu"
        dp = _round_up(d, 128)
        # VMEM estimate: double-buffered K+V blocks dominate; leave headroom
        # for Q/out blocks and fp32 accumulators
        kv_bytes = 2 * sk * dp * 2 * 2  # K+V, bf16, double-buffered
        if on_tpu and sq % 256 == 0 and sk % 512 == 0 and sk >= 512:
            if kv_bytes <= 11 * 1024 * 1024:
                mode = "pallas"
            elif sk % 1024 == 0 and dp <= 1024:
                # KV too big for one residency (e.g. the VAE mid-block's
                # single-head d=512 at 4096 tokens): kv-gridded kernel with
                # scratch accumulators — XLA would materialize the full
                # score matrix in HBM
                mode = "pallas_kvgrid"
            else:
                mode = "xla"
        else:
            mode = "xla"

    if mode == "xla":
        return _xla_attention(q, k, v, scale)

    if mode in ("pallas_kvgrid", "pallas_kvgrid_interpret"):
        def to_bhsd(x, s):
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)

        if mode == "pallas_kvgrid_interpret":
            out = _flash_attention_bhsd_kvgrid(
                to_bhsd(q, sq), to_bhsd(k, sk), to_bhsd(v, sk), float(scale),
                interpret=True)
        else:
            out = _flash_kvgrid_trainable(to_bhsd(q, sq), to_bhsd(k, sk),
                                          to_bhsd(v, sk), float(scale), 256, 1024)
        return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))

    interpret = mode == "pallas_interpret"
    # (B,S,H,D) -> (B*H, S, D). No HBM zero-pad of the head dim: Pallas
    # blocks may equal the array dims, and Mosaic lane-pads inside VMEM for
    # free — measured timings are flat across head dims 40..128 (the kernel
    # is softmax/VPU-bound, BASELINE.md round 2), so the padded HBM copies
    # were pure waste.
    def to_bhsd(x, s):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)

    block_q = 512 if sq % 512 == 0 else 256
    # single-kv-block softmax (no online corrections) wins when the whole KV
    # fits VMEM comfortably — only for small head dims (large-d attention is
    # already routed to XLA by the kv_bytes gate)
    if sk <= 4096 and d <= 64 and sk % 512 == 0:
        block_k = sk
    else:
        block_k = 1024 if sk % 1024 == 0 else 512
    # interpret mode routes through the SAME custom_vjp wrapper so CPU tests
    # exercise the flash backward kernel too
    out = _flash_trainable(to_bhsd(q, sq), to_bhsd(k, sk), to_bhsd(v, sk),
                           float(scale), block_q, block_k, interpret)
    out = out.reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
