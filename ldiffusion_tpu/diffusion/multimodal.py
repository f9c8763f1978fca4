"""Depth-conditioned (ControlNet) multimodal augment — the reference's
remote-sensing orphan path, TPU-native.

Behavioral contract: ``ldiffusion_augment_for_multimodal`` (reference
``segmentor.py:301-386``): VAE-encode RGB (sampled, ×0.18215), add
depth-scaled Laplace(0,1) noise in latent space, run ControlNet on the
depth condition, predict noise with the UNet (+ControlNet residuals),
linearly de-noise ``latents - eps * depth``, decode ``/0.18215``.

Here the whole batch runs as one jitted function instead of a per-image
Python loop.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ldiffusion_tpu.diffusion.pipeline import SDComponents, apply_proj
from ldiffusion_tpu.models.controlnet import ControlNet
from ldiffusion_tpu.ops.resize import resize_bilinear

DEFAULT_MM_PROMPT_IDS = (49406, 320, 6613, 1063, 533, 49407)  # "a remote sense image"


def multimodal_augment(components: SDComponents, controlnet: ControlNet,
                       controlnet_params, rgb, dtm, key,
                       prompt_ids=DEFAULT_MM_PROMPT_IDS):
    """rgb: (B, H, W, 3) in [0,1]; dtm: (B, H, W, 1) in [0,1].
    Returns reconstructed (B, H, W, 3) images."""
    params = components.params
    sf = components.vae_config.scaling_factor

    ids = jnp.asarray([list(prompt_ids)] * rgb.shape[0], jnp.int32)
    hidden = components.text.apply({"params": params["text"]}, ids)
    emb = apply_proj(params["proj"], hidden)

    k_enc, k_noise = jax.random.split(key)
    latents = components.vae.apply({"params": params["vae"]}, rgb * 2.0 - 1.0,
                                   method=components.vae.encode_sample, rng=k_enc) * sf
    lh, lw = latents.shape[1:3]
    depth_lat = resize_bilinear(dtm, (lh, lw))
    depth_lat = jnp.repeat(depth_lat, latents.shape[-1], axis=-1)

    noise = jax.random.laplace(k_noise, latents.shape, latents.dtype)
    noisy = latents + noise * depth_lat

    ts = components.scheduler.set_timesteps(1)
    t = jnp.int32(ts.values[0])
    depth_cond = jnp.repeat(dtm, 3, axis=-1)
    down_res, mid_res = controlnet.apply({"params": controlnet_params}, noisy, t,
                                         emb, depth_cond)
    eps = components.unet.apply({"params": params["unet"]}, noisy, t, emb,
                                down_block_residuals=down_res, mid_residual=mid_res)
    denoised = noisy - eps * depth_lat
    recon = components.vae.apply({"params": params["vae"]}, denoised / sf,
                                 method=components.vae.decode)
    return recon
