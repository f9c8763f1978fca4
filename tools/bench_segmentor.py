"""Segmentor (stage-2) train-step throughput on TPU.

Times the full jitted nnUNet-style train step — on-device augmentation,
deep-supervision DC+CE forward/backward, SGD update — for the plan the
planner produces for 1024² RGB data.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tpu_claim import claim_tpu  # noqa: E402

claim_tpu()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig  # noqa: E402
from ldiffusion_tpu.core.dist import make_mesh  # noqa: E402
from ldiffusion_tpu.segmentor.planner import plan_experiment  # noqa: E402
from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer  # noqa: E402

fp = {
    "shapes_after_crop": [[1024, 1024]] * 40,
    "num_channels": 3,
    "foreground_intensity_properties_per_channel": {},
}
import os

plan = plan_experiment(fp, num_classes=7)
import dataclasses as _dc

_b = os.environ.get("SEG_BENCH_BATCH")
if _b:
    plan = _dc.replace(plan, batch_size=int(_b))
if os.environ.get("SEG_BENCH_REMAT") == "1":
    plan = _dc.replace(plan, remat_decoder=True)
_f0 = os.environ.get("SEG_BENCH_F0")
if _f0:
    # layout-copy probe (VERDICT r4 item 7): widen the shallow stages to
    # min-channel F0 — if the [1024,16,129,32] space-partitioned layout
    # copies stem from the 32-channel stages, padding them may remove the
    # copies for less than their 59 ms/step cost
    plan = _dc.replace(plan, features_per_stage=tuple(
        max(int(_f0), f) for f in plan.features_per_stage))

print(f"plan: patch {plan.patch_size} batch {plan.batch_size} "
      f"features {plan.features_per_stage}", flush=True)

mesh = make_mesh(MeshConfig())
cfg = SegmentorTrainConfig()
t0 = time.time()
variant = None
if os.environ.get("SEG_BENCH_NODA") == "1":
    from ldiffusion_tpu.segmentor.variants import get_variant
    variant = get_variant("nnUNetTrainerNoDA", base=cfg)
tr = SegmentorTrainer(plan, cfg, mesh, output_dir="/tmp/seg_bench", variant=variant)
print(f"trainer init {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
ph, pw = plan.patch_size
data = jnp.asarray(rng.normal(size=(plan.batch_size, ph, pw, 3)).astype(np.float32))
seg = jnp.asarray(rng.integers(0, 7, size=(plan.batch_size, ph, pw)).astype(np.int32))
key = jax.random.key(0)

# single-dispatch scan of whole train steps: per-dispatch tunnel latency
# (~0.5-1s, high variance) would otherwise dominate a python loop
import optax
from ldiffusion_tpu.data.augment import augment_batch
from ldiffusion_tpu.losses.dice import robust_cross_entropy, soft_dice_loss

iters = 8

def scan_steps(params, opt_state, data, seg, key):
    def loss_fn(p, d, s_list):
        # mirrors the trainer's plain-regime loss: RemoveLabelTransform(-1,0)
        # already ran, so no -1 masking (trainer.py _loss)
        outs = tr.net.apply({"params": p}, d, train=True)
        total = 0.0
        for o, ss in zip(outs, s_list):
            total = total + soft_dice_loss(o, ss) + robust_cross_entropy(o, ss)
        return total

    def body(carry, k):
        p, o = carry
        d, s = augment_batch(k, data, seg, tr.augment_cfg)
        s = jnp.maximum(s, 0)
        s_list, cur = [s], s
        for st in plan.strides[1:]:
            if st > 1:
                cur = cur[:, ::st, ::st]
                s_list.append(cur)
        loss, grads = jax.value_and_grad(loss_fn)(p, d, s_list)
        updates, o = tr.tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    (_, _), losses = jax.lax.scan(body, (params, opt_state),
                                  jax.random.split(key, iters))
    return jnp.mean(losses)

jfn = jax.jit(scan_steps)
t0 = time.time()
_ = float(jfn(tr.state.params, tr.state.opt_state, data, seg, key))
print(f"scan({iters} steps) compile+run {time.time()-t0:.1f}s", flush=True)
_trace = os.environ.get("SEG_BENCH_PROFILE")
if _trace:
    with jax.profiler.trace(_trace):
        _ = float(jfn(tr.state.params, tr.state.opt_state, data, seg,
                      jax.random.fold_in(key, 9)))
    print(f"trace → {_trace}", flush=True)
t0 = time.time()
_ = float(jfn(tr.state.params, tr.state.opt_state, data, seg,
              jax.random.fold_in(key, 7)))
dt = (time.time() - t0) / iters * iters  # total for iters steps
dt = time.time() - t0
per_step = dt / iters
px_per_s = plan.batch_size * ph * pw / per_step
print(f"train step {per_step*1000:.0f} ms  ({plan.batch_size} x {ph}x{pw} patches; "
      f"{px_per_s/1e6:.1f} Mpx/s; {plan.batch_size/per_step:.2f} patches/s)", flush=True)
