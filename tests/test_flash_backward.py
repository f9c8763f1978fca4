"""Flash-attention backward kernel (dq/dk/dv with recomputed probabilities):
interpret-mode parity against the XLA vjp, wiring through jax.grad, and a
peak-memory assertion at 4096 tokens (the XLA backward materializes a 64 MB
S² score matrix; the flash backward must not).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldiffusion_tpu.ops.attention import (
    _flash_attention_bhsd_lse,
    _flash_backward_bhsd,
    _flash_bwd_fits_pallas,
    _flash_trainable,
)


def _xla_ref(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


def _inputs(bh=2, s=512, d=64, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(bh, s, d)).astype(dtype))
    return mk(), mk(), mk()


def test_forward_lse_parity_interpret():
    q, k, v = _inputs()
    scale = 0.125
    out, lse = _flash_attention_bhsd_lse(q, k, v, scale, block_q=256,
                                         block_k=256, interpret=True)
    ref = _xla_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    s_mat = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(s_mat, axis=-1)[..., None]
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-4, rtol=1e-5)


def test_backward_kernel_parity_interpret():
    """Direct kernel check: dq/dk/dv match the reference vjp."""
    q, k, v = _inputs(bh=2, s=512, d=64)
    scale = 1.0 / 8.0
    g = jnp.asarray(np.random.default_rng(1).normal(
        size=q.shape).astype(np.float32))
    out, vjp = jax.vjp(lambda q, k, v: _xla_ref(q, k, v, scale), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    lse = jax.scipy.special.logsumexp(
        jnp.einsum("bqd,bkd->bqk", q, k) * scale, axis=-1)[..., None]
    delta = jnp.sum(g * out, axis=-1, keepdims=True)
    dq, dk, dv = _flash_backward_bhsd(q, k, v, g, lse, delta, scale,
                                      block_q=256, block_k=256,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-4)


def test_grad_through_custom_vjp_uses_flash_backward():
    """jax.grad through the trainable wrapper (interpret mode) matches the
    XLA reference — and the test shape passes the pallas-backward gate, so
    this exercises the kernel, not the fallback."""
    q, k, v = _inputs(bh=1, s=512, d=64, seed=2)
    scale = 0.1
    assert _flash_bwd_fits_pallas(512, 512, 64, 512, 512)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_trainable(q, k, v, scale, 256, 512, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-3)


def test_bwd_gate_rejects_oversize_residency():
    # d=512 at 4096 tokens: Q/dO residency alone is 16 MB — must fall back
    assert not _flash_bwd_fits_pallas(4096, 4096, 512, 512, 512)
    # the production UNet shape fits
    assert _flash_bwd_fits_pallas(4096, 4096, 128, 512, 512)


@pytest.mark.slow
def test_no_score_matrix_at_4096_tokens():
    """Peak temp memory of the differentiated 4096-token attention stays far
    below the 64 MB f32 score matrix the XLA vjp would materialize."""
    bh, s, d = 1, 4096, 128
    rng = np.random.default_rng(3)
    # bf16 = the production dtype; the dtype-aware VMEM gate admits the
    # pallas backward at this shape only for 2-byte inputs
    q, k, v = (jnp.asarray(rng.normal(size=(bh, s, d)).astype(np.float32)
                           ).astype(jnp.bfloat16)
               for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(_flash_trainable(q, k, v, 0.088, 512, 1024, True))

    compiled = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, k, v).compile()
    ma = compiled.memory_analysis()
    if ma is None or not hasattr(ma, "temp_size_in_bytes"):
        pytest.skip("memory_analysis unavailable on this backend")
    score_bytes = s * s * 4
    assert ma.temp_size_in_bytes < score_bytes, (
        f"temp {ma.temp_size_in_bytes} suggests an S² materialization")
