import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldiffusion_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextEncoder,
    UNet2DCondition,
    UNet2DConditionConfig,
    VAEConfig,
)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNet2DConditionConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 5, cfg.cross_attention_dim))
    params = unet.init(jax.random.key(0), x, jnp.int32(1), ctx)
    return unet, params, cfg


def test_unet_shapes(tiny_unet):
    unet, params, cfg = tiny_unet
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 5, cfg.cross_attention_dim))
    out = unet.apply(params, x, jnp.int32(500), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_timestep_sensitivity(tiny_unet):
    unet, params, cfg = tiny_unet
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 5, cfg.cross_attention_dim))
    o1 = unet.apply(params, x, jnp.int32(1), ctx)
    o2 = unet.apply(params, x, jnp.int32(801), ctx)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4


def test_unet_context_sensitivity(tiny_unet):
    unet, params, cfg = tiny_unet
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    c1 = jax.random.normal(jax.random.key(2), (1, 5, cfg.cross_attention_dim))
    c2 = jax.random.normal(jax.random.key(3), (1, 5, cfg.cross_attention_dim))
    o1 = unet.apply(params, x, jnp.int32(1), c1)
    o2 = unet.apply(params, x, jnp.int32(1), c2)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(VAEConfig.tiny())
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.key(0), x)
    mean = vae.apply(params, x, method=vae.encode_mean)
    assert mean.shape == (1, 16, 16, 4)  # /2 per downsample (tiny has 1)
    dec = vae.apply(params, mean, method=vae.decode)
    assert dec.shape == (1, 32, 32, 3)
    d2 = vae.apply(params, mean, method=vae.decode_latents)
    assert float(jnp.min(d2)) >= 0.0 and float(jnp.max(d2)) <= 1.0


def test_vae_sd_downsampling_factor():
    """Full SD config downsamples 8x: 3 downsample stages over 4 blocks."""
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.key(0), x)
    mean = vae.apply(params, x, method=vae.encode_mean)
    assert mean.shape == (1, 8, 8, 4)


def test_clip_causal_and_shapes():
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg)
    ids = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    params = enc.init(jax.random.key(0), ids)
    out = enc.apply(params, ids)
    assert out.shape == (1, 5, cfg.hidden_size)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 4].set(9)
    out2 = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out2[:, :4]),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.max(jnp.abs(out[:, 4] - out2[:, 4]))) > 1e-5


def test_groupnorm_silu_numerics():
    """Sanity: flax GroupNorm matches torch.nn.GroupNorm on random data."""
    import torch
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    gn = nn.GroupNorm(4, epsilon=1e-5)
    params = gn.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(gn.apply(params, jnp.asarray(x)))

    tgn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        tgn.weight.fill_(1.0)
        tgn.bias.fill_(0.0)
        want = tgn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_torch_convention():
    """flip_sin_to_cos=True, shift=0: emb = [cos | sin] with freqs
    exp(-ln(1e4) * i / half)."""
    from ldiffusion_tpu.models.layers import timestep_embedding

    t = 123
    dim = 32
    got = np.asarray(timestep_embedding(jnp.int32(t), dim))[0]
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t * freqs
    want = np.concatenate([np.cos(args), np.sin(args)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
