"""Time the USER-FACING tissue inference path on the real TPU (VERDICT r4
item 2 — BASELINE target configs 1-2).

The path a user of ``LDiffusionModel.inference`` actually waits for
(reference ``segmentor.py:388-488`` single-image branch →
``predict_from_raw_data.py:547-634``):

    1024x1024 ROI → imagenet-normalize → 1-step diffusion transform
    (SD-v1.5-sized VAE+UNet, bf16) → sliding-window segmentor (tissue plan,
    gaussian weighting, step 0.5, mirror TTA ON) → argmax → PNG export.

Reports per-ROI wall-clock (including host transfers + PNG write) and
Mpx/s, with a per-stage breakdown. Tunnel note: each dispatch costs
~0.5-1 s of round-trip; the path is 2 dispatches/ROI (transform, predict
scan), so the amortized many-ROI rate is also reported via repeated runs.

Run (claims the TPU): python tools/bench_inference_e2e.py
Env: E2E_ROIS (default 4), E2E_TTA (1/0, default 1), BENCH_QUANT
(default int8_static — the bench default mode).
"""
import os
import sys
import tempfile
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

ROI = 1024
NUM_CLASSES = 7  # PUMA tissue


def build_sd_components():
    """SD-v1.5-sized components with zero weights via eval_shape (the
    bench.py trick: identical compiled program, skips on-device init)."""
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
    ls = ROI // 8
    unet_shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, ls, ls, 4)), jnp.int32(1),
        jnp.zeros((1, 5, unet_cfg.cross_attention_dim)))
    vae_shapes = jax.eval_shape(vae.init, jax.random.key(0),
                                jnp.zeros((1, ROI, ROI, 3)))
    text_shapes = jax.eval_shape(text.init, jax.random.key(0),
                                 jnp.zeros((1, 5), jnp.int32))
    shapes = {"unet": unet_shapes["params"], "vae": vae_shapes["params"],
              "text": text_shapes["params"]}
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    params["proj"] = init_proj(jax.random.key(1), text_cfg.hidden_size,
                               unet_cfg.cross_attention_dim)
    return SDComponents(unet_config=unet_cfg, vae_config=vae_cfg,
                        text_config=text_cfg, unet=unet, vae=vae, text=text,
                        params=params)


def build_segmentor():
    """Tissue plan for 1024² PUMA-like images + zero-weight DynUNet params."""
    from ldiffusion_tpu.models.dynunet import DynUNet
    from ldiffusion_tpu.segmentor.planner import plan_experiment

    fp = {"shapes_after_crop": [[ROI, ROI]] * 10, "num_channels": 3,
          "foreground_intensity_properties_per_channel": {}}
    plan = plan_experiment(fp, num_classes=NUM_CLASSES)
    net = DynUNet(plan.network_config(), dtype=jnp.bfloat16)
    shapes = jax.eval_shape(net.init, jax.random.key(0),
                            jnp.zeros((1, *plan.patch_size, 3)))
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()["params"]
    return plan, params


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "900")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)

    from PIL import Image

    from ldiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from ldiffusion_tpu.diffusion.pipeline import (
        one_step_transform,
        trajectory_text_emb,
    )
    from ldiffusion_tpu.ops.quant import (
        record_quant_sites,
        set_quant_mode,
        set_static_amax,
    )
    from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

    mode = os.environ.get("BENCH_QUANT", "int8_static")
    set_quant_mode(mode)
    n_rois = int(os.environ.get("E2E_ROIS", "4"))
    tta = os.environ.get("E2E_TTA", "1") == "1"

    print("building SD components + tissue plan ...", flush=True)
    t0 = time.perf_counter()
    comps = build_sd_components()
    plan, seg_params = build_segmentor()
    print(f"build {time.perf_counter()-t0:.1f}s; plan patch "
          f"{plan.patch_size} batch {plan.batch_size} features "
          f"{plan.features_per_stage}", flush=True)

    emb = trajectory_text_emb(comps, comps.params, 1)
    if mode == "int8_static":
        imgs0 = jax.ShapeDtypeStruct((1, ROI, ROI, 3), jnp.float32)
        sites = record_quant_sites(
            lambda im: one_step_transform(comps, comps.params, im, emb), imgs0)
        print(f"int8_static: {len(sites)} sites", flush=True)
        set_static_amax({s: 1.0 for s in sites})
    tf_fn = jax.jit(lambda p, im: one_step_transform(comps, p, im, emb))

    predictor = SlidingWindowPredictor(plan, seg_params, use_mirroring=tta,
                                       dtype=jnp.bfloat16, tile_step_size=0.5)
    rng = np.random.default_rng(0)
    out_dir = tempfile.mkdtemp(prefix="e2e_preds_")

    def one_roi(i, timings):
        roi = rng.random((ROI, ROI, 3)).astype(np.float32)
        t0 = time.perf_counter()
        norm = ((roi - IMAGENET_MEAN) / IMAGENET_STD)[None].astype(np.float32)
        t = np.asarray(tf_fn(comps.params, jnp.asarray(norm)),
                       dtype=np.float32)  # value read = sync
        t1 = time.perf_counter()
        seg = predictor.predict(t[0])  # (H, W) uint8, internally synced
        t2 = time.perf_counter()
        Image.fromarray(seg).save(os.path.join(out_dir, f"roi_{i}.png"))
        t3 = time.perf_counter()
        timings.append((t1 - t0, t2 - t1, t3 - t2))
        return t3 - t0

    print("compiling (cold: minutes; warm via .jax_cache: seconds) ...",
          flush=True)
    t0 = time.perf_counter()
    warm = one_roi(-1, [])
    print(f"first ROI (compile+run) {time.perf_counter()-t0:.1f}s", flush=True)

    timings = []
    walls = [one_roi(i, timings) for i in range(n_rois)]
    best = min(walls)
    mean = float(np.mean(walls))
    tr, pr, ex = (float(np.mean([t[j] for t in timings])) for j in range(3))
    mpx = ROI * ROI / 1e6
    print(f"\nuser-facing inference, {ROI}² ROI, TTA={'on' if tta else 'off'}, "
          f"step 0.5, quant={mode}:")
    print(f"  per-ROI wall: best {best:.3f}s / mean {mean:.3f}s over "
          f"{n_rois} ROIs  ->  {mpx/best:.2f} Mpx/s best, {mpx/mean:.2f} mean")
    print(f"  stage means: transform {tr:.3f}s | sliding-window {pr:.3f}s | "
          f"PNG export {ex:.3f}s")
    print(f"  (tunnel adds ~0.5-1s/dispatch; 2 device dispatches per ROI)")

    if os.environ.get("E2E_FUSED", "1") != "1":
        return

    # --- FUSED path (api.py:_make_fused_predict): transform→normalize→
    # sliding-window→uint8 in ONE XLA program — one 12 MB upload, a 1 MB
    # uint8 download, no intermediate roundtrips; folder mode additionally
    # pipelines dispatches (async) against host PNG writes.
    print("\ncompiling fused single-dispatch program ...", flush=True)
    fused = jax.jit(lambda sd_p, seg_p, im: predictor.traced_seg(
        seg_p, one_step_transform(comps, sd_p, im[None], emb)[0],
        normalize=True))
    seg_p = (seg_params,)

    def fused_roi(i):
        roi = rng.random((ROI, ROI, 3)).astype(np.float32)
        t0 = time.perf_counter()
        norm = ((roi - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
        seg = np.asarray(fused(comps.params, seg_p, jnp.asarray(norm)))
        Image.fromarray(seg).save(os.path.join(out_dir, f"fused_{i}.png"))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    fused_roi(-1)
    print(f"first fused ROI (compile+run) {time.perf_counter()-t0:.1f}s",
          flush=True)
    fwalls = [fused_roi(i) for i in range(n_rois)]
    fbest, fmean = min(fwalls), float(np.mean(fwalls))
    print(f"  fused per-ROI wall: best {fbest:.3f}s / mean {fmean:.3f}s  ->  "
          f"{mpx/fbest:.2f} Mpx/s best, {mpx/fmean:.2f} mean")

    # pipelined folder mode: all dispatches in flight, sync in order
    rois = [((rng.random((ROI, ROI, 3)).astype(np.float32) - IMAGENET_MEAN)
             / IMAGENET_STD).astype(np.float32) for _ in range(2 * n_rois)]
    t0 = time.perf_counter()
    segs = [fused(comps.params, seg_p, jnp.asarray(r)) for r in rois]
    for i, s in enumerate(segs):
        Image.fromarray(np.asarray(s)).save(
            os.path.join(out_dir, f"pipe_{i}.png"))
    amort = (time.perf_counter() - t0) / len(rois)
    print(f"  pipelined folder mode ({len(rois)} ROIs in flight): "
          f"{amort:.3f}s/ROI amortized  ->  {mpx/amort:.2f} Mpx/s")


if __name__ == "__main__":
    main()
