"""Run the REAL static-int8 calibration path at full sd15 scale ON the TPU.

VERDICT r4 Weak #2: ``bench.py`` installs amax=1.0 stand-in scales (provably
throughput-identical — the compiled program differs only in constants), so
the real ``calibrate_static_scales`` path had only ever executed at tiny CPU
test scale (``tests/test_quant.py``, 256-channel task A/B). This probe closes
that: it builds the bench's exact SD-v1.5 512² pipeline, runs
``calibrate_static_scales`` on the chip over the NON-scanned single-step
program (the documented contract — site keys are flax module paths, so the
scales transfer to the scanned 5-step program), installs the measured scales,
and executes the scanned int8_static pipeline with them, asserting finite
output.

Weights: zeros would give degenerate amax=0 (that is WHY bench uses the
stand-in), and real on-device random init of 860M params costs ~8 min of
per-leaf RNG programs. Instead every leaf is filled with a deterministic
iota-sin pattern (mean 0, std ~0.035) in ONE jitted program — nonzero, varied
weights that drive every gated conv through the genuine record→quantize path.
A learned weight distribution is impossible in this environment (weights
watch, BASELINE.md); this probe is about the CODE PATH at scale, not the
values.

Reference context: the transform being quantized is the reference's
1-step/5-step diffusion feature extraction (``segmentor.py:86-112``,
``ldiffusion.py:229-249``).

Run (claims the TPU): python tools/calibrate_sd15_tpu.py
"""
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.95")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

IMAGE = 512
BATCH = 2
STEPS = 5


def build():
    from ldiffusion_tpu.diffusion.pipeline import (
        SDComponents,
        apply_proj,
        init_proj,
    )
    from ldiffusion_tpu.diffusion.schedulers import PNDMScheduler
    from ldiffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig
    from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig

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
    shapes = {"unet": unet_shapes["params"], "vae": vae_shapes["params"],
              "text": text_shapes["params"]}

    def _fill(s):
        # deterministic nonzero fill: sin over iota, std ~0.7 * 0.05
        n = int(np.prod(s.shape)) if s.shape else 1
        v = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.7391) * 0.05
        return v.reshape(s.shape).astype(s.dtype)

    params = jax.jit(
        lambda: jax.tree_util.tree_map(_fill, shapes))()
    params["proj"] = init_proj(jax.random.key(1), text_cfg.hidden_size,
                               unet_cfg.cross_attention_dim)
    comps = SDComponents(
        unet_config=unet_cfg, vae_config=vae_cfg, text_config=text_cfg,
        unet=unet, vae=vae, text=text, params=params,
    )
    sch = PNDMScheduler()
    ts = sch.set_timesteps(STEPS)
    t_values = jnp.asarray(ts.array)
    noise_scales = jnp.sqrt(
        1.0 - jnp.asarray(sch.schedule.alphas_cumprod)[ts.array])
    ids = jnp.asarray([list(comps.prompt_ids)] * BATCH, jnp.int32)

    def single_step(params, images, key):
        """One UNet denoise + VAE round trip, NO lax.scan — the calibration
        contract (ops/quant.py:71-90): quantized call sites must be outside
        any inner scan so their amax tracers can escape as jit outputs."""
        hidden = comps.text.apply({"params": params["text"]}, ids)
        emb = apply_proj(params["proj"], hidden)
        latents = comps.vae.apply({"params": params["vae"]}, images,
                                  method=comps.vae.encode_mean)
        state = sch.init_state(latents.shape, latents.dtype)
        t, scale = t_values[0], noise_scales[0]
        noise = jax.random.laplace(key, latents.shape, latents.dtype)
        noisy = latents + noise * scale.astype(latents.dtype)
        eps = comps.unet.apply({"params": params["unet"]}, noisy, t, emb)
        lat, _ = sch.step(ts, state, eps, t, latents)
        return comps.vae.apply({"params": params["vae"]}, lat,
                               method=comps.vae.decode_latents)

    def pipeline(params, images, key):
        hidden = comps.text.apply({"params": params["text"]}, ids)
        emb = apply_proj(params["proj"], hidden)
        latents = comps.vae.apply({"params": params["vae"]}, images,
                                  method=comps.vae.encode_mean)
        state = sch.init_state(latents.shape, latents.dtype)

        def body(carry, inp):
            lat, st = carry
            t, scale, k = inp
            noise = jax.random.laplace(k, lat.shape, lat.dtype)
            eps = comps.unet.apply({"params": params["unet"]},
                                   lat + noise * scale.astype(lat.dtype), t,
                                   emb)
            lat, st = sch.step(ts, st, eps, t, lat)
            return (lat, st), None

        keys = jax.random.split(key, len(ts))
        (latents, _), _ = jax.lax.scan(
            body, (latents, state), (t_values, noise_scales, keys))
        return comps.vae.apply({"params": params["vae"]}, latents,
                               method=comps.vae.decode_latents)

    return comps, single_step, pipeline


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "1800")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)

    from ldiffusion_tpu.ops.quant import (
        calibrate_static_scales,
        set_quant_mode,
        set_static_amax,
    )

    print(f"device: {jax.devices()[0].platform}", flush=True)
    comps, single_step, pipeline = build()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32))

    set_quant_mode("int8_static")
    try:
        t0 = time.perf_counter()
        scales = calibrate_static_scales(
            single_step, comps.params, images, jax.random.key(7))
        dt = time.perf_counter() - t0
        vals = np.asarray(sorted(scales.values()))
        n_zero = int((vals == 0).sum())
        print(f"calibrate_static_scales: {len(scales)} sites in {dt:.1f}s "
              f"(record-mode compile+run)", flush=True)
        print(f"amax distribution: min {vals.min():.4g} p50 "
              f"{np.median(vals):.4g} max {vals.max():.4g} "
              f"zeros {n_zero}", flush=True)
        assert len(scales) > 50, "expected the full gated sd15 site set"
        assert n_zero == 0, "degenerate amax — fill produced a dead site"

        set_static_amax(scales)
        t0 = time.perf_counter()
        out = jax.jit(pipeline)(comps.params, images, jax.random.key(8))
        finite = bool(jnp.isfinite(out.astype(jnp.float32)).all())
        print(f"5-step int8_static pipeline with REAL scales: "
              f"{time.perf_counter()-t0:.1f}s (compile+run), "
              f"output finite={finite}", flush=True)
        assert finite
        print("OK: real calibration path executed at sd15/512² scale on "
              "this device", flush=True)
    finally:
        set_static_amax(None)
        set_quant_mode("none")


if __name__ == "__main__":
    main()
