"""Stage-1 Laplace warm-up train step on the REAL TPU (VERDICT r4 item 3).

The reference's core novelty trains SD-v1.5 with Laplace-noised trajectories
on 8 GPUs under ZeRO-3 with CPU offload (``ldiffusion.py:121-295``, launch
``README.md:97``). This repo's stage-1 had only ever run on virtual CPU
meshes (the r2 hardware attempt at batch 8 OOM'd). This probe answers what a
SINGLE v5e chip can do: batch 1, the trajectory ``lax.scan`` with per-step
rematerialization (cfg.remat=True), 64² images / 8² latents exactly as the
reference resizes them (:200,212).

Byte math (why fp32 is marginal and bf16 params fit):
  UNet+proj params ~0.86 G-param → fp32: 3.44 (p) + 6.88 (AdamW m,v)
  + 3.44 (grads, live through tx.update) ≈ 13.8 GB of 15.75 GB HBM;
  bf16 params/moments/grads: ≈ 6.9 GB. STAGE1_DTYPE ∈ {float32, bfloat16}.

Run (claims the TPU): python tools/bench_stage1_tpu.py
Env: STAGE1_DTYPE (default float32; auto-falls-back to bfloat16 on OOM),
STAGE1_BATCH (default 1), STAGE1_SCAN_STEPS (default 8).
"""
import os
import sys
import time
from functools import partial

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


def build_components(param_dtype):
    """SD-v1.5-sized components, zero weights via eval_shape (bench.py
    trick), trainable UNet leaves cast to ``param_dtype``."""
    from ldiffusion_tpu.diffusion.pipeline import SDComponents, init_proj
    from ldiffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig
    from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    unet_cfg = UNet2DConditionConfig.sd15()
    vae_cfg = VAEConfig.sd15()
    text_cfg = CLIPTextConfig.sd15()
    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    text = CLIPTextEncoder(text_cfg, dtype=jnp.bfloat16)
    unet_shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.int32(1),
        jnp.zeros((1, 5, unet_cfg.cross_attention_dim)))
    vae_shapes = jax.eval_shape(vae.init, jax.random.key(0),
                                jnp.zeros((1, 64, 64, 3)))
    text_shapes = jax.eval_shape(text.init, jax.random.key(0),
                                 jnp.zeros((1, 5), jnp.int32))
    shapes = {
        "unet": jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, param_dtype),
            unet_shapes["params"]),
        "vae": vae_shapes["params"],
        "text": text_shapes["params"],
    }
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    params["proj"] = jax.tree_util.tree_map(
        lambda x: x.astype(param_dtype),
        init_proj(jax.random.key(1), text_cfg.hidden_size,
                  unet_cfg.cross_attention_dim))
    return SDComponents(unet_config=unet_cfg, vae_config=vae_cfg,
                        text_config=text_cfg, unet=unet, vae=vae, text=text,
                        params=params)


def probe(param_dtype, batch, scan_steps):
    from ldiffusion_tpu.core.config import DiffusionTrainConfig, MeshConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.losses.infonce import InfoNceLoss
    from ldiffusion_tpu.train.ldiffusion import DiffusionWarmupTrainer, TrainState

    import optax

    print(f"--- probe: dtype={param_dtype.dtype.name if hasattr(param_dtype, 'dtype') else param_dtype}, "
          f"batch={batch} ---", flush=True)
    comps = build_components(param_dtype)
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(comps.params["unet"]))
    print(f"UNet params: {n_params/1e6:.0f} M", flush=True)
    mesh = make_mesh(MeshConfig(data=1, fsdp=1), devices=jax.devices()[:1])
    cfg = DiffusionTrainConfig(num_inference_steps=25, batch_size=batch,
                               remat=True)  # steps/5 = 5 trajectory steps
    info = InfoNceLoss.create(num_anchors=64, num_negatives=256)
    trainer = DiffusionWarmupTrainer(comps, cfg, mesh, info_nce=info,
                                     fsdp_min_size=1 << 62)  # no shard: 1 chip

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, size=(batch, 64, 64)).astype(np.int32))

    t0 = time.perf_counter()
    state, metrics = trainer._train_step(trainer.state, trainer.frozen,
                                         mesh.shard_batch(images),
                                         mesh.shard_batch(labels),
                                         jax.random.key(1))
    loss = float(metrics["loss"])
    print(f"single step (compile+run): {time.perf_counter()-t0:.1f}s, "
          f"loss={loss:.4f} (finite={np.isfinite(loss)})", flush=True)

    # steady-state ms/step: scan the full update n times in ONE dispatch so
    # the tunnel round-trip does not pollute the measurement
    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def multi(state, frozen, images, labels, key, n):
        def body(st, k):
            (l, _aux), grads = jax.value_and_grad(
                trainer._loss_fn, has_aux=True)(st.params, frozen, images,
                                                labels, k)
            updates, opt = trainer.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt, st.step + 1), l

        st, losses = jax.lax.scan(body, state, jax.random.split(key, n))
        return st, jnp.mean(losses)

    im = mesh.shard_batch(images)
    lb = mesh.shard_batch(labels)
    t0 = time.perf_counter()
    state, ml = multi(state, trainer.frozen, im, lb, jax.random.key(2),
                      scan_steps)
    _ = float(ml)
    print(f"scan x{scan_steps} (compile+run): {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        state, ml = multi(state, trainer.frozen, im, lb,
                          jax.random.fold_in(jax.random.key(3), i), scan_steps)
        _ = float(ml)
        best = min(best, time.perf_counter() - t0)
    ms = best / scan_steps * 1e3
    print(f"steady-state: {ms:.0f} ms/step (batch {batch}) = "
          f"{batch/ms*1e3:.2f} img/s", flush=True)
    return ms


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "900")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)

    batch = int(os.environ.get("STAGE1_BATCH", "1"))
    scan_steps = int(os.environ.get("STAGE1_SCAN_STEPS", "8"))
    dtype = os.environ.get("STAGE1_DTYPE", "float32")
    order = [jnp.float32, jnp.bfloat16] if dtype == "float32" else [jnp.bfloat16]
    for dt in order:
        try:
            probe(dt, batch, scan_steps)
            return
        except Exception as e:
            msg = str(e)
            print(f"probe failed ({type(e).__name__}): "
                  f"{msg[:500]}", file=sys.stderr, flush=True)
            if "memory" not in msg.lower() and "RESOURCE_EXHAUSTED" not in msg:
                raise
            print("OOM — falling back to bf16 params/moments", flush=True)
    print("no configuration fit on one chip", flush=True)


if __name__ == "__main__":
    main()
