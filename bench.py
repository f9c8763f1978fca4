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


def _zeros_like_tree(shapes):
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build(batch: int):
    # full SD-v1.5 sized components; weights are zeros via eval_shape — the
    # compiled program (and therefore throughput) is identical to real
    # weights, and we skip the ~8-minute on-device random-init programs.
    import dataclasses as _dc

    from ldiffusion_tpu.diffusion.pipeline import init_proj
    from ldiffusion_tpu.models.clip_text import CLIPTextEncoder
    from ldiffusion_tpu.models.unet import UNet2DCondition
    from ldiffusion_tpu.models.vae import AutoencoderKL

    unet_cfg = UNet2DConditionConfig.sd15()
    vae_cfg = VAEConfig.sd15()
    text_cfg = CLIPTextConfig.sd15()
    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    text = CLIPTextEncoder(text_cfg, dtype=jnp.bfloat16)
    ls = IMAGE // 8
    unet_shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, ls, ls, 4)), jnp.int32(1),
        jnp.zeros((1, 5, unet_cfg.cross_attention_dim)))
    vae_shapes = jax.eval_shape(vae.init, jax.random.key(0),
                                jnp.zeros((1, IMAGE, IMAGE, 3)))
    text_shapes = jax.eval_shape(text.init, jax.random.key(0),
                                 jnp.zeros((1, 5), jnp.int32))
    # one jitted program materializes every zero leaf — a single dispatch
    # (per-leaf jnp.zeros costs one tunnel round-trip each, ~700 of them)
    shapes = {"unet": unet_shapes["params"], "vae": vae_shapes["params"],
              "text": text_shapes["params"]}
    params = jax.jit(lambda: _zeros_like_tree(shapes))()
    params["proj"] = init_proj(jax.random.key(1), text_cfg.hidden_size,
                               unet_cfg.cross_attention_dim)
    comps = SDComponents(
        unet_config=unet_cfg, vae_config=vae_cfg, text_config=text_cfg,
        unet=unet, vae=vae, text=text, params=params,
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

    from ldiffusion_tpu.ops.quant import (
        quant_mode,
        record_quant_sites,
        set_static_amax,
    )

    if quant_mode() == "int8_static":
        # enumerate the gated sites via a pure eval_shape trace and install
        # constant activation scales: the quantize becomes a fused elementwise
        # epilogue of the producing GN/SiLU pass and the per-iter amax pass
        # disappears. Bench weights are structural zeros, so amax=1.0 stands
        # in for a real calibration (calibrate_static_scales) — the compiled
        # program is identical either way, only the constants differ.
        key0 = jax.random.key(0)
        imgs0 = jax.ShapeDtypeStruct((batch, IMAGE, IMAGE, 3), jnp.float32)
        sites = record_quant_sites(pipeline, params, imgs0, key0)
        print(f"int8_static: {len(sites)} calibrated sites", file=sys.stderr)
        set_static_amax({s: 1.0 for s in sites})

    fn = jax.jit(pipeline, donate_argnums=())

    def pipeline_repeat(params, images, key, iters):
        """iters pipeline invocations as one on-device scan — a single
        dispatch, so the tunnel round-trip latency (~0.5s) doesn't pollute
        the throughput measurement. The carry perturbs the input images so
        XLA cannot hoist any loop-invariant stage (e.g. the VAE encode) out
        of the loop."""
        def body(carry, k):
            out = pipeline(params, images + carry, k)
            return jnp.mean(out), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, iters))
        return c

    rep = jax.jit(pipeline_repeat, static_argnames=("iters",))
    return comps, fn, rep


def run(batch: int, iters: int = 8):
    t0 = time.perf_counter()
    comps, fn, rep = build(batch)
    print(f"build done {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    import numpy as np

    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, IMAGE, IMAGE, 3)).astype(np.float32))
    key = jax.random.key(0)
    t0 = time.perf_counter()
    # sync via value read: block_until_ready is unreliable over the tunnel
    _ = float(rep(comps.params, images, key, iters))  # compile + warmup
    print(f"pipeline compile+warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for rep_i in range(3):  # best-of-3: the tunnel adds high run variance
        t0 = time.perf_counter()
        _ = float(rep(comps.params, images, jax.random.fold_in(key, 1 + rep_i), iters))
        best = min(best, time.perf_counter() - t0)
        print(f"timed pass {rep_i}: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)
    return batch * iters / best


def main():
    # the single-chip lease may be held by a recently-exited process; retry
    # registration until it frees (tools/tpu_claim.py)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from tpu_claim import claim_tpu

        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "600")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)
    # A/B kernel toggles: BENCH_ATTN / BENCH_GN in {auto,xla,pallas};
    # BENCH_QUANT in {none,int8,int8_static} (W8A8 conv/matmul, ops/quant.py)
    from ldiffusion_tpu.ops.attention import set_attention_mode
    from ldiffusion_tpu.ops.groupnorm import set_groupnorm_mode
    from ldiffusion_tpu.ops.quant import set_quant_mode

    set_attention_mode(os.environ.get("BENCH_ATTN", "auto"))
    set_groupnorm_mode(os.environ.get("BENCH_GN", "auto"))
    # int8_static default: shape-gated W8A8 with statically-calibrated
    # activation scales — 15.50-15.51 vs 15.43-15.45 dynamic vs 14.05 bf16
    # (BASELINE.md rounds 3-4), accuracy bounded at op/transform/task level
    # (tests/test_quant.py, tests/test_quant_task_ab.py); BENCH_QUANT=none
    # reverts to pure bf16
    set_quant_mode(os.environ.get("BENCH_QUANT", "int8_static"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
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
