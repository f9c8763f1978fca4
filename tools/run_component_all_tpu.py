"""Run the FULL user workflow — ``LDiffusionModel.train(component="all")``
followed by ``.inference()`` — on the real TPU, at random:tiny scale.

BASELINE target config 5 analog at single-chip scale: every stage of the
user-facing API (stage-1 Laplace warm-up → diffusion-transform dataset
materialization → fingerprint/plan/preprocess → stage-2 segmentor training
with validation → postprocessing determination → single-image inference)
executes on hardware through the exact code path a user calls — not through
per-stage probe tools. Tiny scale (64² images, random:tiny SD components)
keeps tunnel compiles bounded; the big-model per-stage hardware numbers live
in bench.py / tools/bench_stage1_tpu.py / tools/bench_inference_e2e.py.

Run (claims the TPU): python tools/run_component_all_tpu.py
Env: ALL_LEVELS (tissue|cell|both, default both), ALL_WORK (work dir,
default a fresh temp dir).
"""
import os
import sys
import tempfile
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.90")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


class Args:
    def __init__(self, image_dir, label_dir, num_classes):
        self.image_dir = image_dir
        self.label_dir = label_dir
        self.num_epochs = 11  # 10-subtraction leaves 1 segmentor epoch
        self.batch_size = 2
        self.num_inference_steps = 5
        self.num_classes = num_classes


def make_dataset(root):
    from PIL import Image

    img_dir, lbl_dir = os.path.join(root, "images"), os.path.join(root, "labels")
    os.makedirs(img_dir), os.makedirs(lbl_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"roi_{i}.png"))
        lab = np.zeros((64, 64), np.uint8)
        lab[:32] = 100
        lab[:, :16] = 150
        Image.fromarray(lab).save(os.path.join(lbl_dir, f"roi_{i}.png"))
    return img_dir, lbl_dir


def run_level(level, image_dir, label_dir, work_root):
    from ldiffusion_tpu.api import LDiffusionModel
    from ldiffusion_tpu.core.config import DiffusionTrainConfig, SegmentorTrainConfig

    num_classes = 7 if level == "tissue" else 11
    model = LDiffusionModel(
        "random:tiny", level=level,
        work_dir=os.path.join(work_root, level),
        diffusion_config=DiffusionTrainConfig(num_epochs=1, batch_size=2,
                                              num_inference_steps=5),
        segmentor_config=SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2,
                                              val_iters_per_epoch=1),
    )
    args = Args(image_dir, label_dir, num_classes)
    t0 = time.perf_counter()
    out = model.train(args, component="all")
    t_train = time.perf_counter() - t0
    assert os.path.exists(os.path.join(out["ldiffusion"], "unet_params.npz"))
    if level == "tissue":
        assert os.path.exists(os.path.join(out["segmentor"], "plans.json"))
        assert os.path.exists(os.path.join(out["segmentor"], "fold_0",
                                           "checkpoint_final.pkl"))
    else:
        assert os.path.exists(out["segmentor"])

    img_path = os.path.join(image_dir, sorted(os.listdir(image_dir))[0])
    t0 = time.perf_counter()
    decoded, mask = model.inference(img_path, out["ldiffusion"],
                                    out["segmentor"], num_classes=num_classes)
    t_inf = time.perf_counter() - t0
    assert mask.shape == (64, 64) and mask.max() < num_classes
    assert decoded.size == (64, 64)
    print(f"[{level}] component=all train {t_train:.1f}s | "
          f"single-image inference {t_inf:.1f}s | artifacts ok "
          f"(unet_params.npz, {'plans.json+fold_0/checkpoint_final.pkl' if level == 'tissue' else 'cellclassifier.pkl'}, mask {mask.shape})",
          flush=True)
    return t_train, t_inf


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "900")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)
    print(f"devices: {jax.devices()}", flush=True)

    work_root = os.environ.get("ALL_WORK") or tempfile.mkdtemp(prefix="component_all_tpu_")
    data_root = tempfile.mkdtemp(prefix="component_all_data_")
    image_dir, label_dir = make_dataset(data_root)
    levels = {"tissue": ["tissue"], "cell": ["cell"],
              "both": ["tissue", "cell"]}[os.environ.get("ALL_LEVELS", "both")]
    t0 = time.perf_counter()
    for level in levels:
        run_level(level, image_dir, label_dir, work_root)
    print(f"TOTAL wall (incl. compiles): {time.perf_counter()-t0:.1f}s; "
          f"work dir: {work_root}", flush=True)


if __name__ == "__main__":
    main()
