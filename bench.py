"""Benchmark: 512x512 patches/sec/chip at 5-step Laplace reverse inference.

The driver's north-star metric (BASELINE.json): throughput of the L-Diffusion
feature-transform pipeline — VAE encode → 5 PNDM/Laplace UNet steps → VAE
decode — on 512x512 patches, full SD-v1.5-sized models, bf16, one chip.

``vs_baseline`` divides by an estimated PyTorch-GPU reference of 1.5
patches/s (SD-v1.5 fp32 at 512² ≈ 0.6-0.8 s per 5-UNet-step image on a
datacenter GPU; the reference repo publishes no numbers — BASELINE.md). The
absolute value is the real signal.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.95")

import jax

# persistent compile cache: tunnel compiles of the SD-sized pipeline are
# minutes-slow; cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from ldiffusion_tpu.diffusion.pipeline import SDComponents, apply_proj
from ldiffusion_tpu.diffusion.schedulers import PNDMScheduler
from ldiffusion_tpu.models.clip_text import CLIPTextConfig
from ldiffusion_tpu.models.unet import UNet2DConditionConfig
from ldiffusion_tpu.models.vae import VAEConfig

TORCH_GPU_BASELINE_PATCHES_PER_S = 1.5  # documented estimate, BASELINE.md
IMAGE = 512
STEPS = 5


def build(batch: int):
    # full SD-v1.5 sized components, random weights (throughput-identical)
    comps = SDComponents.random(
        jax.random.key(0), dtype=jnp.bfloat16, image_size=IMAGE,
        unet_config=UNet2DConditionConfig.sd15(),
        vae_config=VAEConfig.sd15(),
        text_config=CLIPTextConfig.sd15(),
    )
    sch = PNDMScheduler()
    ts = sch.set_timesteps(STEPS)
    t_values = jnp.asarray(ts.array)
    scales = jnp.sqrt(1.0 - jnp.asarray(sch.schedule.alphas_cumprod)[ts.array])
    ids = jnp.asarray([list(comps.prompt_ids)] * batch, jnp.int32)

    def pipeline(params, images, key):
        hidden = comps.text.apply({"params": params["text"]}, ids)
        emb = apply_proj(params["proj"], hidden)
        latents = comps.vae.apply({"params": params["vae"]}, images,
                                  method=comps.vae.encode_mean)
        state = sch.init_state(latents.shape, latents.dtype)

        def body(carry, inp):
            lat, st = carry
            t, scale, k = inp
            noise = jax.random.laplace(k, lat.shape, lat.dtype) * scale.astype(lat.dtype)
            eps = comps.unet.apply({"params": params["unet"]}, lat + noise, t, emb)
            lat, st = sch.step(ts, st, eps, t, lat)
            return (lat, st), None

        keys = jax.random.split(key, len(ts))
        (latents, _), _ = jax.lax.scan(body, (latents, state), (t_values, scales, keys))
        return comps.vae.apply({"params": params["vae"]}, latents,
                               method=comps.vae.decode_latents)

    fn = jax.jit(pipeline, donate_argnums=())
    return comps, fn


def run(batch: int, iters: int = 8):
    comps, fn = build(batch)
    images = jnp.zeros((batch, IMAGE, IMAGE, 3), jnp.float32)
    key = jax.random.key(0)
    out = fn(comps.params, images, key)  # compile + warmup
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(comps.params, images, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    best = 0.0
    try:
        best = run(batch, iters)
    except Exception as e:  # OOM etc. → retry smaller
        print(f"bench batch={batch} failed ({type(e).__name__}: {e}); retrying batch=1",
              file=sys.stderr)
        best = run(1, iters)
    print(json.dumps({
        "metric": "512x512_patches_per_sec_per_chip_5step_laplace",
        "value": round(best, 4),
        "unit": "patches/s",
        "vs_baseline": round(best / TORCH_GPU_BASELINE_PATCHES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
