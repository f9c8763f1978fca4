"""Time the USER-FACING cell inference path on the real TPU (BASELINE
target config 1 — the last target config without a hardware number).

The path ``LDiffusionModel.inference(level="cell")`` actually executes
(reference ``segmentor.py:490-545`` → ``model/conductor.py:175-233``):

    1024² ROI → imagenet-normalize → 1-step diffusion transform
    (SD-v1.5-sized VAE+UNet, bf16/int8_static) → instance proposer
    (watershed OR flow-net artifact) → per-instance 64² crops → frozen
    ResNet-152 encoder + adapter/classifier → id→class paint → resize.

Weights are structural zeros for the SD components (bench.py trick — the
compiled program and throughput are identical to real weights) and the
committed ``flownet_transformed`` artifact for the proposer. The proposer/
classifier stages are timed on a synthetic H&E-like blob scene with a
realistic instance count (zero-weight transforms output near-constant
images which would propose 0 instances and make those stages trivially
fast): stage costs depend on pixel/instance counts, not on provenance, so
the per-stage sum is an honest per-ROI wall-clock.

Run (claims the TPU): python tools/bench_cell_e2e.py
Env: CELL_ROIS (default 4), CELL_N_BLOBS (default 300), BENCH_QUANT
(default int8_static), CELL_PROPOSER (flownet|watershed|both, default both).
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

ROI = 1024
NUM_CLASSES = 11  # PUMA cell


def make_scene(rng, n_blobs: int):
    """H&E-like scene: dark elliptical nuclei on a light background."""
    img = np.full((ROI, ROI, 3), 0.85, np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    yy, xx = np.mgrid[:ROI, :ROI].astype(np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.uniform(10, ROI - 10, 2)
        ry, rx = rng.uniform(4, 14, 2)
        th = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = dy * np.cos(th) + dx * np.sin(th)
        v = -dy * np.sin(th) + dx * np.cos(th)
        mask = (u / ry) ** 2 + (v / rx) ** 2 <= 1.0
        tint = rng.uniform(0.15, 0.35)
        img[mask] = [tint, tint * 0.6, tint * 1.2]
    return np.clip(img, 0, 1)


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "900")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)

    from PIL import Image

    from bench_inference_e2e import build_sd_components
    from ldiffusion_tpu.cell.classifier import CellSegClassifier, extract_instance_boxes
    from ldiffusion_tpu.cell.instance import (
        DistanceWatershedProposer,
        FlowNetProposer,
    )
    from ldiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from ldiffusion_tpu.diffusion.pipeline import one_step_transform, trajectory_text_emb
    from ldiffusion_tpu.ops.quant import record_quant_sites, set_quant_mode, set_static_amax

    mode = os.environ.get("BENCH_QUANT", "int8_static")
    set_quant_mode(mode)
    n_rois = int(os.environ.get("CELL_ROIS", "4"))
    n_blobs = int(os.environ.get("CELL_N_BLOBS", "300"))
    which = os.environ.get("CELL_PROPOSER", "both")

    print("building SD components + cell classifier ...", flush=True)
    t0 = time.perf_counter()
    comps = build_sd_components()
    emb = trajectory_text_emb(comps, comps.params, 1)
    if mode == "int8_static":
        imgs0 = jax.ShapeDtypeStruct((1, ROI, ROI, 3), jnp.float32)
        sites = record_quant_sites(
            lambda im: one_step_transform(comps, comps.params, im, emb), imgs0)
        print(f"int8_static: {len(sites)} sites", flush=True)
        set_static_amax({s: 1.0 for s in sites})
    tf_fn = jax.jit(lambda p, im: one_step_transform(comps, p, im, emb))

    model = CellSegClassifier(NUM_CLASSES)  # real ResNet-152 encoder
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    scenes = [make_scene(rng, n_blobs) for _ in range(n_rois + 1)]

    # --- stage 1: the 1-step diffusion transform at 1024² (jitted) --------
    def run_transform(scene):
        norm = ((scene - IMAGENET_MEAN) / IMAGENET_STD)[None].astype(np.float32)
        t0 = time.perf_counter()
        _ = np.asarray(tf_fn(comps.params, jnp.asarray(norm)))  # value read = sync
        return time.perf_counter() - t0

    print("compiling transform (warm via .jax_cache) ...", flush=True)
    t0 = time.perf_counter()
    run_transform(scenes[0])
    print(f"transform compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    tf_times = [run_transform(s) for s in scenes[1:]]

    # --- stages 2-5 per proposer ------------------------------------------
    proposers = {}
    if which in ("watershed", "both"):
        proposers["watershed"] = DistanceWatershedProposer()
    if which in ("flownet", "both"):
        proposers["flownet"] = FlowNetProposer.load_pretrained(domain="transformed")

    for name, prop in proposers.items():
        model.proposer = prop
        # compile passes (flow net program + the classify bucket)
        t0 = time.perf_counter()
        inst0 = prop.propose(scenes[0])
        ids0, boxes0 = extract_instance_boxes(inst0)
        if ids0:
            model.classify_rois(scenes[0], boxes0)
            # pre-compile the adjacent buckets the timed scenes may hit
            # (instance counts vary ±5% around the warmup scene's); a bucket
            # compile landing inside a timed pass would corrupt the average
            for nb in (1536, 1024, 512):
                if len(ids0) > nb // 2:
                    model.classify_rois(scenes[0], boxes0[:min(len(ids0), nb)])
        print(f"[{name}] warmup (compiles) {time.perf_counter()-t0:.1f}s; "
              f"{inst0.max()} instances proposed, {len(ids0)} kept", flush=True)

        stages = []
        for s in scenes[1:]:
            t0 = time.perf_counter()
            inst = prop.propose(s)
            t1 = time.perf_counter()
            ids, boxes = extract_instance_boxes(inst)
            t2 = time.perf_counter()
            classes = (model.classify_rois(s, boxes) if ids else
                       np.zeros((0,), np.int64))
            t3 = time.perf_counter()
            if ids:
                mask = model._class_lut(inst, ids, classes)[inst].astype(np.uint8)
            else:
                mask = np.zeros(s.shape[:2], np.uint8)
            Image.fromarray(mask).resize((ROI, ROI), Image.NEAREST)
            t4 = time.perf_counter()
            stages.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, len(ids)))

        pr, ex, cl, pa = (float(np.mean([st[j] for st in stages])) for j in range(4))
        n_inst = float(np.mean([st[4] for st in stages]))
        tf = float(np.mean(tf_times))
        total = tf + pr + ex + cl + pa
        print(f"\n[{name}] cell inference, {ROI}² ROI, ~{n_inst:.0f} instances, "
              f"quant={mode}:")
        print(f"  stages: transform {tf:.3f}s | propose {pr:.3f}s | "
              f"extract {ex:.3f}s | classify {cl:.3f}s | paint+resize {pa:.3f}s")
        print(f"  per-ROI wall: {total:.3f}s  ->  {ROI*ROI/1e6/total:.2f} Mpx/s, "
              f"{n_inst/total:.0f} instances/s", flush=True)


if __name__ == "__main__":
    main()
