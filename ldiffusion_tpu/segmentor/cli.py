"""nnUNet-style segmentor CLI.

Behavioral contract: the reference's console entry points
(``model/pyproject.toml:69-85``): ``nnUNetv2_plan_and_preprocess`` /
``nnUNetv2_train`` / ``nnUNetv2_predict`` with the
``-d/-c/-f/-tr/--c/--val/--npz/--save_probabilities/--continue_prediction``
flag surface (``run/run_training.py:212-271``,
``experiment_planning/plan_and_preprocess_entrypoints.py:8-204``,
``inference/predict_from_raw_data.py:637-767``), mapped onto this
framework's programmatic stack:

    python -m ldiffusion_tpu.segmentor plan_and_preprocess -d 1
    python -m ldiffusion_tpu.segmentor train -d 1 -c 2d -f 0 [-tr NAME] [--c]
    python -m ldiffusion_tpu.segmentor predict -i IN -o OUT -d 1 [-f 0 1 ...]

Dataset layout = the reference's: ``$LDIFFUSION_RAW/DatasetXXX_Name/
{imagesTr,labelsTr,imagesTs,labelsTs,dataset.json}`` (PNG 2D,
NaturalImage2DIO semantics — the regime the L-Diffusion pipeline uses;
volumetric datasets go through the programmatic 3D API,
``segmentor/planner3d.py``). Preprocessed artifacts land under
``$LDIFFUSION_PREPROCESSED``, results under ``$LDIFFUSION_RESULTS``
(``core/paths.py``; nnUNet_* names honored as fallbacks).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from ldiffusion_tpu.core import paths as env_paths


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def find_dataset_dir(root: str, dataset_id: int) -> str:
    """DatasetXXX_Name lookup by integer id (reference
    ``utilities/dataset_name_id_conversion.py``)."""
    pattern = os.path.join(root, f"Dataset{int(dataset_id):03d}_*")
    hits = sorted(glob.glob(pattern))
    if not hits:
        exact = os.path.join(root, f"Dataset{int(dataset_id):03d}")
        if os.path.isdir(exact):
            return exact
        raise FileNotFoundError(f"no dataset matching {pattern}")
    if len(hits) > 1:
        raise RuntimeError(f"ambiguous dataset id {dataset_id}: {hits}")
    return hits[0]


def _require(value: Optional[str], flag: str, env: str) -> str:
    if not value:
        raise SystemExit(f"{env} is not set — export it or pass {flag}")
    return value


def load_png_cases(ds_dir: str, split: str = "Tr"):
    """(case_ids, images [0,1] float (H,W,C), labels int32 (H,W)) from an
    imagesTr/labelsTr pair (NaturalImage2DIO value semantics —
    ``data/io.py``)."""
    from PIL import Image

    img_dir = os.path.join(ds_dir, f"images{split}")
    lbl_dir = os.path.join(ds_dir, f"labels{split}")
    ids, images, labels = [], [], []
    if not os.path.isdir(img_dir):
        return ids, images, labels
    for fn in sorted(os.listdir(img_dir)):
        if not fn.lower().endswith(".png"):
            continue
        case = fn[:-9] if fn.endswith("_0000.png") else fn[:-4]
        img = np.asarray(Image.open(os.path.join(img_dir, fn)).convert("RGB"),
                         np.float32) / 255.0
        lbl_path = os.path.join(lbl_dir, f"{case}.png")
        lbl = np.asarray(Image.open(lbl_path), np.uint8).astype(np.int32) \
            if os.path.exists(lbl_path) else None
        ids.append(case)
        images.append(img)
        labels.append(lbl)
    return ids, images, labels


def _label_manager(ds_dir: str):
    from ldiffusion_tpu.segmentor.label_manager import (
        label_manager_from_dataset_json,
    )

    with open(os.path.join(ds_dir, "dataset.json")) as f:
        dataset_json = json.load(f)
    dataset_json["labels"] = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in dataset_json["labels"].items()}
    return label_manager_from_dataset_json(dataset_json), dataset_json


def _pp_dataset_dir(pp_root: str, raw_ds_dir: str) -> str:
    return os.path.join(pp_root, os.path.basename(raw_ds_dir))


def _results_config_dir(results_root: str, raw_ds_name: str, trainer: str,
                        config: str) -> str:
    """nnUNet results naming: Dataset/trainer__plans__config (reference
    ``utilities/file_path_utilities.py`` get_output_folder)."""
    return os.path.join(results_root, raw_ds_name,
                        f"{trainer}__ldPlans__{config}")


def _max_label_value(lm) -> int:
    vals = list(lm.all_labels)
    if lm.has_ignore_label:
        vals.append(lm.ignore_label)
    return max(vals)


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def cmd_plan_and_preprocess(args) -> str:
    """fingerprint → plan → preprocess (reference
    ``plan_and_preprocess_entrypoints.py:8-204``)."""
    from ldiffusion_tpu.segmentor.fingerprint import (
        extract_fingerprint,
        verify_dataset_integrity,
    )
    from ldiffusion_tpu.segmentor.planner import plan_experiment
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    lm, dataset_json = _label_manager(ds_dir)
    ids, images, labels = load_png_cases(ds_dir, "Tr")
    if not ids:
        raise SystemExit(f"no training cases under {ds_dir}/imagesTr")
    if args.verify_dataset_integrity:
        n_expected = dataset_json.get("numTraining")
        if n_expected is not None and n_expected != len(ids):
            raise SystemExit(f"dataset.json numTraining={n_expected} but "
                             f"{len(ids)} cases found")
        problems = verify_dataset_integrity(images, labels,
                                            _max_label_value(lm) + 1)
        if problems:
            raise SystemExit(f"dataset integrity check failed: {problems}")

    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, lm.num_segmentation_heads)
    out = _pp_dataset_dir(pp_root, ds_dir)
    os.makedirs(out, exist_ok=True)
    plan.save(os.path.join(out, "plans.json"))
    with open(os.path.join(out, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=2)
    # per-case npz store (the unpacked analog of nnUNet's npz+pkl pairs)
    PreprocessedDataset.build(images, labels, _max_label_value(lm) + 1,
                              case_ids=ids,
                              directory=os.path.join(out, "ldPlans_2d"))
    print(f"plans + preprocessed data written to {out}")
    return out


def _load_preprocessed(args) -> Tuple[str, str, object, object, object]:
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    pp_dir = _pp_dataset_dir(pp_root, ds_dir)
    if not os.path.isdir(pp_dir):
        raise SystemExit(f"{pp_dir} missing — run plan_and_preprocess first")
    plan = SegPlan.load(os.path.join(pp_dir, "plans.json"))
    lm, _ = _label_manager(pp_dir)
    ds = PreprocessedDataset.load(os.path.join(pp_dir, "ldPlans_2d"))
    return ds_dir, pp_dir, plan, lm, ds


def cmd_train(args) -> str:
    """fold training (reference ``run/run_training.py:212-271``)."""
    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.segmentor.splits import do_split
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer
    from ldiffusion_tpu.segmentor.variants import get_variant

    if args.c != "2d":
        raise SystemExit("the CLI drives the 2D (PNG) pathway; volumetric "
                         "configs go through the programmatic API "
                         "(segmentor.planner3d.plan_and_preprocess_3d)")
    ds_dir, pp_dir, plan, lm, ds = _load_preprocessed(args)
    results_root = _require(args.results or env_paths.results_dir(warn=False),
                            "--results", "LDIFFUSION_RESULTS")
    overrides = {}
    if args.epochs:
        overrides["num_epochs"] = args.epochs
    if args.iters:
        overrides["iters_per_epoch"] = args.iters
        overrides["val_iters_per_epoch"] = max(1, args.iters // 5)
    base = SegmentorTrainConfig(**overrides)
    variant = get_variant(args.tr, base=base)
    fold = args.f if args.f == "all" else int(args.f)
    tr_keys, va_keys = do_split(ds.keys(), fold,
                                os.path.join(pp_dir, "splits_final.json"))
    cfg_dir = _results_config_dir(results_root, os.path.basename(ds_dir),
                                  args.tr, args.c)
    os.makedirs(cfg_dir, exist_ok=True)
    plan.save(os.path.join(cfg_dir, "plans.json"))
    with open(os.path.join(pp_dir, "dataset.json")) as f:
        dj = f.read()
    with open(os.path.join(cfg_dir, "dataset.json"), "w") as f:
        f.write(dj)
    fold_dir = os.path.join(cfg_dir, f"fold_{fold}")
    # the batch shards over every mesh device (data×fsdp on the leading dim)
    # — use the largest device count that divides the planned batch
    import math

    import jax

    k = math.gcd(plan.batch_size, len(jax.devices())) or 1
    mesh = make_mesh(MeshConfig(data=k, fsdp=1, tensor=1),
                     devices=jax.devices()[:k])
    trainer = SegmentorTrainer(plan, variant.config, mesh,
                               output_dir=fold_dir, variant=variant,
                               label_manager=lm)
    if args.val:
        ck = None
        for name in ("checkpoint_final.pkl", "checkpoint_best.pkl",
                     "checkpoint_latest.pkl"):
            p = os.path.join(fold_dir, name)
            if os.path.exists(p):
                ck = p
                break
        if ck is None:
            raise SystemExit(f"--val: no checkpoint under {fold_dir}")
        trainer.load_checkpoint(ck)
    else:
        trainer.run_training(ds.subset(tr_keys), ds.subset(va_keys),
                             continue_training=args.c_continue)
    val_imgs = [ds[k].data for k in va_keys]
    val_labs = [np.maximum(ds[k].seg, 0) for k in va_keys]
    trainer.perform_actual_validation(val_imgs, val_labs)
    print(f"fold {fold} done → {fold_dir}")
    return fold_dir


def cmd_predict(args) -> str:
    """folder prediction (reference ``predict_from_raw_data.py:637-767``)."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.export import save_probabilities_npz
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

    results_root = _require(args.results or env_paths.results_dir(warn=False),
                            "--results", "LDIFFUSION_RESULTS")
    raw_root = args.raw or env_paths.raw_dir(warn=False)
    ds_name = os.path.basename(find_dataset_dir(raw_root, args.d)) \
        if raw_root else f"Dataset{int(args.d):03d}"
    cfg_dir = _results_config_dir(results_root, ds_name, args.tr, args.c)
    if not os.path.isdir(cfg_dir):
        raise SystemExit(f"{cfg_dir} missing — train first")
    plan = SegPlan.load(os.path.join(cfg_dir, "plans.json"))
    lm, _ = _label_manager(cfg_dir)
    ckpts: List[str] = []
    for f in args.f:
        d = os.path.join(cfg_dir, f"fold_{f}")
        for name in ("checkpoint_best.pkl", "checkpoint_final.pkl"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                ckpts.append(p)
                break
    if not ckpts:
        raise SystemExit(f"no fold checkpoints under {cfg_dir} for folds {args.f}")
    predictor = SlidingWindowPredictor.from_checkpoints(
        plan, ckpts, use_mirroring=not args.disable_tta, label_manager=lm)

    os.makedirs(args.o, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(args.i)):
        if not fn.lower().endswith(".png"):
            continue
        case = fn[:-9] if fn.endswith("_0000.png") else fn[:-4]
        out_png = os.path.join(args.o, f"{case}.png")
        if args.continue_prediction and os.path.exists(out_png):
            continue  # reference predict_from_raw_data.py:187-198
        img = np.asarray(Image.open(os.path.join(args.i, fn)).convert("RGB"),
                         np.float32) / 255.0
        logits = predictor.predict_logits(img)
        seg = lm.convert_logits_to_segmentation(logits)
        Image.fromarray(seg.astype(np.uint8)).save(out_png)
        if args.save_probabilities:
            save_probabilities_npz(logits, os.path.join(args.o, f"{case}.npz"),
                                   label_manager=lm)
        n += 1
    print(f"{n} predictions → {args.o}")
    return args.o


# ---------------------------------------------------------------------------
# argument surface
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m ldiffusion_tpu.segmentor",
        description="nnUNet-style segmentor pipeline CLI")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("-d", type=int, required=True, help="dataset id")
        sp.add_argument("--raw", default=None, help="override LDIFFUSION_RAW")
        sp.add_argument("--preprocessed", default=None,
                        help="override LDIFFUSION_PREPROCESSED")

    pp = sub.add_parser("plan_and_preprocess",
                        help="fingerprint + plan + preprocess (nnUNetv2_plan_and_preprocess)")
    common(pp)
    pp.add_argument("--verify_dataset_integrity", action="store_true")
    pp.set_defaults(fn=cmd_plan_and_preprocess)

    tr = sub.add_parser("train", help="train one fold (nnUNetv2_train)")
    common(tr)
    tr.add_argument("-c", default="2d", help="configuration (2d)")
    tr.add_argument("-f", default="0", help="fold index or 'all'")
    tr.add_argument("-tr", default="nnUNetTrainer", help="trainer variant name")
    tr.add_argument("--c", dest="c_continue", action="store_true",
                    help="continue from latest checkpoint")
    tr.add_argument("--val", action="store_true",
                    help="validation only (needs a trained checkpoint)")
    tr.add_argument("--epochs", type=int, default=None,
                    help="override epoch count (tests/smoke runs)")
    tr.add_argument("--iters", type=int, default=None,
                    help="override iterations/epoch (tests/smoke runs)")
    tr.add_argument("--results", default=None, help="override LDIFFUSION_RESULTS")
    tr.set_defaults(fn=cmd_train)

    pr = sub.add_parser("predict", help="predict a folder (nnUNetv2_predict)")
    pr.add_argument("-i", required=True, help="input folder of PNGs")
    pr.add_argument("-o", required=True, help="output folder")
    pr.add_argument("-d", type=int, required=True)
    pr.add_argument("-c", default="2d")
    pr.add_argument("-f", nargs="+", default=["0"], help="folds to ensemble")
    pr.add_argument("-tr", default="nnUNetTrainer")
    pr.add_argument("--save_probabilities", action="store_true")
    pr.add_argument("--continue_prediction", action="store_true")
    pr.add_argument("--disable_tta", action="store_true")
    pr.add_argument("--raw", default=None)
    pr.add_argument("--results", default=None)
    pr.set_defaults(fn=cmd_predict)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
