"""Pallas kernels vs XLA references (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldiffusion_tpu.ops import attention as att
from ldiffusion_tpu.ops import groupnorm as gnmod
from ldiffusion_tpu.ops.resize import resize_bilinear, rgb_to_gray, upsample_nearest_2x


@pytest.fixture(autouse=True)
def restore_modes():
    yield
    att.set_attention_mode("auto")
    gnmod.set_groupnorm_mode("auto")


def test_flash_attention_matches_xla_interpret():
    rng = np.random.default_rng(0)
    b, s, h, d = 1, 512, 2, 40  # s multiple of 256/512, d padded to 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    att.set_attention_mode("xla")
    ref = att.dot_product_attention(q, k, v)
    att.set_attention_mode("pallas_interpret")
    out = att.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_attention_cross_shape():
    """77-token cross-attention goes through XLA and works."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 64, 4, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 5, 4, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 5, 4, 16)).astype(np.float32))
    out = att.dot_product_attention(q, k, v)
    assert out.shape == (2, 64, 4, 16)
    # rows sum of softmax * v bounded by value range
    assert np.isfinite(np.asarray(out)).all()


def test_groupnorm_silu_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    gnmod.set_groupnorm_mode("xla")
    ref = gnmod.groupnorm_silu(x, scale, bias, groups=32)
    gnmod.set_groupnorm_mode("pallas_interpret")
    out = gnmod.groupnorm_silu(x, scale, bias, groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_groupnorm_matches_flax():
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 64)).astype(np.float32))
    gn = nn.GroupNorm(8, epsilon=1e-5)
    params = gn.init(jax.random.key(0), x)
    ref = gn.apply(params, x)
    out = gnmod.groupnorm_silu(x, jnp.ones(64), jnp.zeros(64), groups=8, silu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_upsample_nearest_2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest_2x(x)
    assert y.shape == (1, 4, 4, 1)
    assert float(y[0, 0, 0, 0]) == 0 and float(y[0, 1, 1, 0]) == 0
    assert float(y[0, 0, 2, 0]) == 1 and float(y[0, 3, 3, 0]) == 3


def test_rgb_to_gray_weights():
    x = jnp.ones((1, 2, 2, 3))
    g = rgb_to_gray(x)
    np.testing.assert_allclose(np.asarray(g), 0.2989 + 0.5870 + 0.1140, rtol=1e-5)


def test_resize_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 7, 9, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (14, 18)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 18),
                         mode="bilinear", align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_groupnorm_chunked_matches_xla_interpret():
    """Chunked two-kernel GN path (VAE-resolution tensors) vs the XLA
    reference, interpret mode on CPU."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.ops.groupnorm import (
        _pallas_groupnorm_silu_chunked,
        _pick_chunk,
        _xla_groupnorm_silu,
    )

    assert _pick_chunk(64 * 64, 128) == 4096
    assert _pick_chunk(64 * 64, 512) == 1024   # chunk shrinks with channels
    assert _pick_chunk(48 * 48, 128) == 0      # not divisible by any chunk size
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 256), jnp.float32)
    scale = jnp.linspace(0.5, 1.5, 256)
    bias = jnp.linspace(-0.2, 0.2, 256)
    for silu in (True, False):
        got = _pallas_groupnorm_silu_chunked(x, scale, bias, 32, 1e-5, silu,
                                             interpret=True)
        want = _xla_groupnorm_silu(x, scale, bias, 32, 1e-5, silu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_groupnorm_hybrid_matches_xla_interpret():
    """Pallas-stats + XLA-normalize hybrid path vs the XLA reference."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.ops.groupnorm import (
        _hybrid_groupnorm_silu,
        _xla_groupnorm_silu,
    )

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 32, 32, 256), jnp.float32)
    scale = jnp.linspace(0.5, 1.5, 256)
    bias = jnp.linspace(-0.2, 0.2, 256)
    for silu in (True, False):
        got = _hybrid_groupnorm_silu(x, scale, bias, 32, 1e-5, silu,
                                     interpret=True)
        want = _xla_groupnorm_silu(x, scale, bias, 32, 1e-5, silu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_flash_attention_backward_matches_xla_vjp():
    """The Pallas attention path must be differentiable — a large-resolution
    fine-tune hits it under jax.grad. The registered backward (_flash_bwd,
    now the Pallas flash backward kernel with recomputed probabilities) must
    equal the vjp of the same math. Head dim 40 = the SD UNet's unpadded
    per-head dim."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.ops import attention as att

    scale = float(1.0 / np.sqrt(40))
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 40), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 40), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 512, 40), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (2, 512, 40), jnp.float32)

    out, lse = att._flash_attention_bhsd_lse(q, k, v, scale, block_q=256,
                                             block_k=512, interpret=True)
    assert att._flash_bwd_fits_pallas(512, 512, 40, 256, 512)
    dq, dk, dv = att._flash_bwd(scale, 256, 512, True, (q, k, v, out, lse), g)

    def ref(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)

    _, vjp = jax.vjp(ref, q, k, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    # and the reference math matches the kernel forward (interpret mode)
    fwd = att._flash_attention_bhsd(q, k, v, scale, block_q=256, block_k=512,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(ref(q, k, v)),
                               rtol=2e-4, atol=2e-4)


def test_flash_kvgrid_matches_xla_interpret():
    """KV-gridded flash (scratch-accumulator revisiting pattern, used for
    large head dims like the VAE's single-head d=512) vs XLA."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.ops.attention import (
        _flash_attention_bhsd_kvgrid,
        _xla_attention,
    )

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 512, 256), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 256), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 512, 256), jnp.float32)
    scale = float(1.0 / np.sqrt(256))
    got = _flash_attention_bhsd_kvgrid(q, k, v, scale, block_q=256,
                                       block_k=256, interpret=True)
    ref = _xla_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
                         scale)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
