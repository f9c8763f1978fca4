"""nnUNet-style segmentor CLI.

Behavioral contract: the reference's console entry points
(``model/pyproject.toml:69-85``): ``nnUNetv2_plan_and_preprocess`` /
``nnUNetv2_train`` / ``nnUNetv2_predict`` with the
``-d/-c/-f/-tr/-p/-pretrained_weights/--c/--val/--val_best/--npz/
--disable_checkpointing/-chk/-step_size/-num_parts/-part_id/
--save_probabilities/--continue_prediction`` flag surface
(``run/run_training.py:212-271``,
``experiment_planning/plan_and_preprocess_entrypoints.py:8-204``,
``inference/predict_from_raw_data.py:637-767``), mapped onto this
framework's programmatic stack:

    python -m ldiffusion_tpu.segmentor plan_and_preprocess -d 1
    python -m ldiffusion_tpu.segmentor train -d 1 -c 2d -f 0 [-tr NAME] [--c]
    python -m ldiffusion_tpu.segmentor predict -i IN -o OUT -d 1 [-f 0 1 ...]

Dataset layout = the reference's: ``$LDIFFUSION_RAW/DatasetXXX_Name/
{imagesTr,labelsTr,imagesTs,labelsTs,dataset.json}``. PNG datasets drive the
2D (NaturalImage2DIO) pathway; volumetric datasets (any non-.png
``file_ending``: .nii.gz/.tif/.npy/... per ``data/io.py``) plan ALL 3D
configurations and train/predict via ``-c 3d_fullres | 3d_lowres |
3d_cascade_fullres`` (cascade consumes the lowres stage's predictions,
reference ``run/run_training.py:212-271``). Preprocessed artifacts land under
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


def _load_png_channels(paths):
    """[0,1] float (H, W, C) from a case's channel files. A single file keeps
    the historical convert-to-RGB semantics (3 channels); multiple ``_NNNN``
    channel files concatenate their NATIVE channels in filename order, like
    NaturalImage2DIO's per-file vstack (reference
    ``natural_image_reader_writer.py:22-45``)."""
    from PIL import Image

    if len(paths) == 1:
        return np.asarray(Image.open(paths[0]).convert("RGB"),
                          np.float32) / 255.0
    chans = []
    for p in paths:
        arr = np.asarray(Image.open(p), np.float32) / 255.0
        chans.append(arr[..., None] if arr.ndim == 2 else arr)
    return np.concatenate(chans, axis=-1)


def load_png_cases(ds_dir: str, split: str = "Tr"):
    """(case_ids, images [0,1] float (H,W,C), labels int32 (H,W)) from an
    imagesTr/labelsTr pair (NaturalImage2DIO value semantics —
    ``data/io.py``). Channel files ``<case>_NNNN.png`` group per case. For
    the Tr split a ``"dataset"`` file-list in dataset.json takes precedence
    over the folder scan (reference ``utilities/utils.py:51-66``, the
    Dataset988-style indirection)."""
    from PIL import Image

    if split == "Tr":
        dj_path = os.path.join(ds_dir, "dataset.json")
        if os.path.exists(dj_path):
            with open(dj_path) as f:
                dj = json.load(f)
            if "dataset" in dj:
                from ldiffusion_tpu.data.io import get_train_images_and_targets

                ids, images, labels = [], [], []
                for case, entry in sorted(
                        get_train_images_and_targets(ds_dir, dj).items()):
                    img = _load_png_channels(entry["images"])
                    lbl = (np.asarray(Image.open(entry["label"]),
                                      np.uint8).astype(np.int32)
                           if os.path.exists(entry["label"]) else None)
                    ids.append(case)
                    images.append(img)
                    labels.append(lbl)
                return ids, images, labels

    img_dir = os.path.join(ds_dir, f"images{split}")
    lbl_dir = os.path.join(ds_dir, f"labels{split}")
    ids, images, labels = [], [], []
    if not os.path.isdir(img_dir):
        return ids, images, labels
    for case, files in sorted(_group_channel_files(img_dir, ".png").items()):
        img = _load_png_channels([os.path.join(img_dir, f) for f in files])
        lbl_path = os.path.join(lbl_dir, f"{case}.png")
        lbl = np.asarray(Image.open(lbl_path), np.uint8).astype(np.int32) \
            if os.path.exists(lbl_path) else None
        ids.append(case)
        images.append(img)
        labels.append(lbl)
    return ids, images, labels


VOLUMETRIC_CONFIGS = ("3d_fullres", "3d_lowres", "3d_cascade_fullres")


def _is_volumetric_dataset(dataset_json) -> bool:
    return dataset_json.get("file_ending", ".png").lower() != ".png"


def _group_channel_files(img_dir: str, ending: str) -> dict:
    """Delegates to the canonical grouping in ``data/io.py`` (kept as a local
    name for the CLI's historical call sites)."""
    from ldiffusion_tpu.data.io import group_channel_files

    return group_channel_files(img_dir, ending)


def load_volume_cases(ds_dir: str, split: str, dataset_json):
    """(case_ids, volumes (Z,H,W,C) float32, labels (Z,H,W) int16, spacings)
    from a volumetric imagesTr/labelsTr pair via the dataset's reader-writer
    (``data/io.py``; channel files ``<case>_NNNN<ending>`` grouped per case,
    reference ``utilities/utils.py`` create_lists_from_splitted_dataset_folder)."""
    from ldiffusion_tpu.data.io import determine_reader_writer_from_dataset_json

    rw = determine_reader_writer_from_dataset_json(dataset_json)
    ending = dataset_json.get("file_ending", ".npy").lower()
    ids, vols, labs, spacings = [], [], [], []

    if split == "Tr" and "dataset" in dataset_json:
        from ldiffusion_tpu.data.io import get_train_images_and_targets

        for case, entry in sorted(
                get_train_images_and_targets(ds_dir, dataset_json).items()):
            data, props = rw.read_images(entry["images"])
            vols.append(np.moveaxis(data, 0, -1).astype(np.float32))
            labs.append(rw.read_seg(entry["label"])[0][0].astype(np.int16)
                        if os.path.exists(entry["label"]) else None)
            ids.append(case)
            spacings.append(tuple(props.get("spacing", (1.0, 1.0, 1.0))))
        return ids, vols, labs, spacings

    img_dir = os.path.join(ds_dir, f"images{split}")
    lbl_dir = os.path.join(ds_dir, f"labels{split}")
    if not os.path.isdir(img_dir):
        return ids, vols, labs, spacings
    groups = _group_channel_files(img_dir, ending)
    for case, files in sorted(groups.items()):
        data, props = rw.read_images(
            [os.path.join(img_dir, f) for f in sorted(files)])
        vols.append(np.moveaxis(data, 0, -1).astype(np.float32))  # (Z,H,W,c)
        lbl_path = os.path.join(lbl_dir, case + ending)
        labs.append(rw.read_seg(lbl_path)[0][0].astype(np.int16)
                    if os.path.exists(lbl_path) else None)
        ids.append(case)
        spacings.append(tuple(props.get("spacing", (1.0, 1.0, 1.0))))
    return ids, vols, labs, spacings


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
                        config: str, plans_name: str = "ldPlans") -> str:
    """nnUNet results naming: Dataset/trainer__plans__config (reference
    ``utilities/file_path_utilities.py`` get_output_folder). ``plans_name``
    is the ``-p`` plans identifier (default ldPlans)."""
    return os.path.join(results_root, raw_ds_name,
                        f"{trainer}__{plans_name}__{config}")


def _plans_filename(args, volumetric: bool) -> str:
    """-p plans identifier → on-disk plans filename in the preprocessed dir.
    The default identifier keeps the historical plans.json / plans_3d.json
    names; a custom ``-p NAME`` (e.g. written by a custom planner or edited
    from a plans file with ``inherits_from``) reads NAME.json / NAME_3d.json.
    Deviation vs the reference: custom plans reuse the canonical
    preprocessed store (no per-plans data_identifier re-preprocess)."""
    p = getattr(args, "p", None) or "ldPlans"
    if volumetric:
        return "plans_3d.json" if p == "ldPlans" else f"{p}_3d.json"
    return "plans.json" if p == "ldPlans" else f"{p}.json"


def _max_label_value(lm) -> int:
    vals = list(lm.all_labels)
    if lm.has_ignore_label:
        vals.append(lm.ignore_label)
    return max(vals)


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def _planner_kind(name: str) -> str:
    """-pl planner selection: "default"/"resenc" directly, or any reference
    planner class name (nnUNetPlannerResEncM/L/XL, ResEncUNetPlanner →
    resenc; ExperimentPlanner → default — reference
    ``plan_and_preprocess_entrypoints.py:95-118``). Unknown names raise."""
    n = (name or "default").lower()
    if "resenc" in n:
        return "resenc"
    if n in ("default", "experimentplanner", "nnunetplanner"):
        return "default"
    raise SystemExit(f"unknown planner {name!r} — use 'default', 'resenc', "
                     f"or a reference planner class name "
                     f"(nnUNetPlannerResEncM/L/XL, ExperimentPlanner)")


def cmd_plan_and_preprocess(args) -> str:
    """fingerprint → plan → preprocess (reference
    ``plan_and_preprocess_entrypoints.py:8-204``)."""
    from ldiffusion_tpu.segmentor.fingerprint import (
        extract_fingerprint,
        verify_dataset_integrity,
    )
    from ldiffusion_tpu.segmentor.planner import plan_experiment
    from ldiffusion_tpu.segmentor.preprocess import (
        PreprocessedDataset,
        get_preprocessor,
    )

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    lm, dataset_json = _label_manager(ds_dir)
    try:
        preprocessor = get_preprocessor(
            getattr(args, "preprocessor_name", None))
    except KeyError as e:
        raise SystemExit(str(e))
    plans_name = getattr(args, "overwrite_plans_name", None) or "ldPlans"
    spacing_override = getattr(args, "overwrite_target_spacing", None)
    if spacing_override is not None and len(spacing_override) != 3:
        raise SystemExit("-overwrite_target_spacing must be three numbers "
                         "(z y x) — reference "
                         "plan_and_preprocess_entrypoints.py:54-62")
    configurations = getattr(args, "c", None)
    clean = bool(getattr(args, "clean", False))
    if _is_volumetric_dataset(dataset_json):
        return _plan_and_preprocess_volumetric(
            ds_dir, pp_root, lm, dataset_json, hbm_budget=args.hbm_budget,
            planner=_planner_kind(getattr(args, "pl", None)),
            no_pp=bool(getattr(args, "no_pp", False)),
            target_spacing=spacing_override, preprocessor=preprocessor,
            plans_name=plans_name, configurations=configurations,
            clean=clean)
    if spacing_override is not None:
        raise SystemExit("-overwrite_target_spacing only applies to the 3D "
                         "configurations (reference help: 'Changing the "
                         "target spacing for the other configurations is "
                         "currently not implemented') — dataset "
                         f"{args.d} is 2D")
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

    out = _pp_dataset_dir(pp_root, ds_dir)
    os.makedirs(out, exist_ok=True)
    fp_path = os.path.join(out, "dataset_fingerprint.json")
    if os.path.exists(fp_path) and not clean:
        # reference cache discipline (plan_and_preprocess_api.py:22-33):
        # an existing fingerprint is reused unless --clean
        print(f"fingerprint exists, reusing {fp_path} (--clean re-extracts)")
        with open(fp_path) as f:
            fp = json.load(f)
    else:
        fp = extract_fingerprint(images, labels)
        with open(fp_path, "w") as f:
            json.dump({k: (v.tolist() if hasattr(v, "tolist") else v)
                       for k, v in fp.items()}, f, indent=2)
    plan = plan_experiment(fp, lm.num_segmentation_heads,
                           planner=_planner_kind(getattr(args, "pl", None)))
    plan.save(os.path.join(
        out, "plans.json" if plans_name == "ldPlans" else f"{plans_name}.json"))
    with open(os.path.join(out, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=2)
    if getattr(args, "no_pp", False):
        print(f"plans written to {out} (--no_pp: preprocessing skipped)")
        return out
    if configurations is not None and "2d" not in configurations:
        print(f"plans written to {out}; no requested configuration in "
              f"{configurations} exists for this 2d dataset — "
              f"preprocessing skipped (reference -c skip semantics)")
        return out
    # per-case npz store (the unpacked analog of nnUNet's npz+pkl pairs)
    PreprocessedDataset.build(images, labels, _max_label_value(lm) + 1,
                              case_ids=ids, preprocessor=preprocessor,
                              directory=os.path.join(out, "ldPlans_2d"))
    print(f"plans + preprocessed data written to {out}")
    return out


def _plan_and_preprocess_volumetric(ds_dir: str, pp_root: str, lm,
                                    dataset_json, hbm_budget=None,
                                    planner: str = "default",
                                    no_pp: bool = False,
                                    target_spacing=None,
                                    preprocessor=None,
                                    plans_name: str = "ldPlans",
                                    configurations=None,
                                    clean: bool = False) -> str:
    """Volumetric plan-and-preprocess: fingerprint → ALL 3D configurations
    (3d_fullres always; 3d_lowres + 3d_cascade_fullres for large volumes) →
    per-config preprocessed stores + a multi-config plans file (reference
    ``plan_and_preprocess_api.py:18-138`` planning every configuration).
    ``hbm_budget``: per-chip memory-budget override in bytes (plan for a
    different chip than the default; the analog of the reference's
    ``-gpu_memory_target``)."""
    from ldiffusion_tpu.segmentor.planner3d import (
        HBM_BUDGET_BYTES,
        plan_and_preprocess_3d,
    )
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    ids, vols, labs, spacings = load_volume_cases(ds_dir, "Tr", dataset_json)
    if not ids:
        raise SystemExit(f"no volumetric training cases under {ds_dir}/imagesTr")
    out = _pp_dataset_dir(pp_root, ds_dir)
    os.makedirs(out, exist_ok=True)
    fp_path = os.path.join(out, "dataset_fingerprint.json")
    fingerprint = None
    if os.path.exists(fp_path) and not clean:
        print(f"fingerprint exists, reusing {fp_path} (--clean re-extracts)")
        with open(fp_path) as f:
            fingerprint = json.load(f)
    else:
        from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint_3d

        fingerprint = extract_fingerprint_3d(vols, labs, spacings=spacings,
                                             save_path=fp_path)
    plans_file = ("plans_3d.json" if plans_name == "ldPlans"
                  else f"{plans_name}_3d.json")
    configs, datasets = plan_and_preprocess_3d(
        vols, labs, lm.num_segmentation_heads, spacings=spacings,
        planner=planner, hbm_budget=hbm_budget or HBM_BUDGET_BYTES,
        plans_path=os.path.join(out, plans_file),
        preprocess=not no_pp, target_spacing=target_spacing,
        preprocessor=preprocessor, configurations=configurations,
        fingerprint=fingerprint)
    for name, ds in datasets.items():
        keyed = {cid: ds[f"case_{i:03d}"] for i, cid in enumerate(ids)}
        PreprocessedDataset(cases=keyed).save(
            os.path.join(out, f"ldPlans_{name}"))
    with open(os.path.join(out, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=2)
    print(f"3D plans ({', '.join(sorted(configs))}) + preprocessed data "
          f"written to {out}")
    return out


def _load_preprocessed_3d(args):
    """plans_3d.json + the requested config's preprocessed store (cascade
    reads the fullres store — its own inputs are fullres data + prev-stage
    channels)."""
    from ldiffusion_tpu.segmentor.plans_file import PlansFile
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    pp_dir = _pp_dataset_dir(pp_root, ds_dir)
    plans_path = os.path.join(pp_dir, _plans_filename(args, volumetric=True))
    if not os.path.exists(plans_path):
        raise SystemExit(f"{plans_path} missing — run plan_and_preprocess "
                         f"on this (volumetric) dataset first")
    pf = PlansFile(plans_path)
    if args.c not in pf.configuration_names():
        raise SystemExit(
            f"configuration {args.c!r} was not planned for this dataset "
            f"(planned: {sorted(pf.configuration_names())}; 3d_lowres/"
            f"3d_cascade_fullres only exist when the fullres patch covers "
            f"<25% of the median volume, reference "
            f"default_experiment_planner.py:371-500)")
    plan = pf.get_configuration(args.c)
    lm, _ = _label_manager(pp_dir)
    base = "3d_fullres" if args.c == "3d_cascade_fullres" else args.c
    store = os.path.join(pp_dir, f"ldPlans_{base}")
    if not os.path.isdir(store):
        raise SystemExit(f"{store} missing — run plan_and_preprocess first")
    ds = PreprocessedDataset.load(store)
    return ds_dir, pp_dir, plan, lm, ds


def _ensure_prev_stage_predictions(pp_dir: str, results_root: str,
                                   ds_name: str, trainer_name: str,
                                   lowres_plan, ds) -> str:
    """Cascade stage-2 inputs: the lowres stage's segmentations resampled to
    the fullres grid, cached under ``predicted_next_stage/3d_cascade_fullres``.

    Fold discipline matches the reference: there, predicted_next_stage is
    written during each lowres fold's VALIDATION (``nnUNetTrainer.py:
    1140-1226`` — a case is only ever predicted by the fold that did NOT
    train on it). Reproduced here via ``splits_final.json``: each trained
    fold predicts its own validation cases with its own checkpoint. Cases
    whose covering fold is untrained fall back to an ensemble of whatever
    folds exist — with a loud leakage warning, since those checkpoints saw
    the case in training."""
    from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
    from ldiffusion_tpu.segmentor.resample import resample_data_3d
    from ldiffusion_tpu.segmentor.splits import do_split

    out = os.path.join(pp_dir, "predicted_next_stage", "3d_cascade_fullres")
    missing = [cid for cid in ds.keys()
               if not os.path.exists(os.path.join(out, f"{cid}.npy"))]
    if not missing:
        return out
    low_dir = _results_config_dir(results_root, ds_name, trainer_name,
                                  "3d_lowres")
    fold_ckpts = {}
    for f in range(5):
        for name in ("checkpoint_best.pkl", "checkpoint_final.pkl"):
            p = os.path.join(low_dir, f"fold_{f}", name)
            if os.path.exists(p):
                fold_ckpts[f] = p
                break
    if not fold_ckpts:
        raise SystemExit(
            "3d_cascade_fullres requires a trained 3d_lowres stage — run "
            f"`train -d ... -c 3d_lowres` first (no checkpoints under "
            f"{low_dir})")
    low_ds = PreprocessedDataset.load(os.path.join(pp_dir, "ldPlans_3d_lowres"))
    splits_file = os.path.join(pp_dir, "splits_final.json")
    os.makedirs(out, exist_ok=True)

    def _write(predictor, cid):
        seg = np.asarray(predictor.predict(low_ds[cid].data, normalize=False))
        tgt = tuple(ds[cid].seg.shape)
        if tuple(seg.shape) != tgt:
            seg = resample_data_3d(seg, tgt, lowres_plan.spacing, is_seg=True)
        np.save(os.path.join(out, f"{cid}.npy"), seg.astype(np.int16))

    remaining = set(missing)
    for f, ckpt in sorted(fold_ckpts.items()):
        _, va_keys = do_split(ds.keys(), f, splits_file)
        mine = remaining & set(va_keys)
        if not mine:
            continue
        predictor = SlidingWindowPredictor.from_checkpoints(
            lowres_plan, [ckpt])
        for cid in sorted(mine):
            _write(predictor, cid)
        remaining -= mine
    if remaining:
        print(f"WARNING: lowres folds "
              f"{sorted(set(range(5)) - set(fold_ckpts))} are untrained — "
              f"{len(remaining)} case(s) predicted with an ensemble of the "
              f"trained folds, which SAW them in training (train/inference "
              f"leak for the cascade stage; train all 5 lowres folds to "
              f"avoid this)")
        predictor = SlidingWindowPredictor.from_checkpoints(
            lowres_plan, sorted(fold_ckpts.values()))
        for cid in sorted(remaining):
            _write(predictor, cid)
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
    plan = SegPlan.load(os.path.join(pp_dir, _plans_filename(args, False)))
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

    if args.c in VOLUMETRIC_CONFIGS:
        ds_dir, pp_dir, plan, lm, ds = _load_preprocessed_3d(args)
    elif args.c == "2d":
        ds_dir, pp_dir, plan, lm, ds = _load_preprocessed(args)
    else:
        raise SystemExit(f"unknown configuration {args.c!r} — use 2d, "
                         f"{', '.join(VOLUMETRIC_CONFIGS)}")
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
                                  args.tr, args.c,
                                  plans_name=getattr(args, "p", None)
                                  or "ldPlans")
    os.makedirs(cfg_dir, exist_ok=True)
    plan.save(os.path.join(cfg_dir, "plans.json"))
    with open(os.path.join(pp_dir, "dataset.json")) as f:
        dj = f.read()
    with open(os.path.join(cfg_dir, "dataset.json"), "w") as f:
        f.write(dj)
    if args.c == "3d_cascade_fullres":
        # prev-stage channels: lowres predictions resampled to the fullres
        # grid, appended as foreground one-hot (reference
        # nnUNetTrainerCascadeFullRes semantics via append_prev_stage_channels)
        from ldiffusion_tpu.segmentor.plans_file import PlansFile
        from ldiffusion_tpu.segmentor.preprocess import (
            PreprocessedDataset,
            append_prev_stage_channels,
        )

        lowres_plan = PlansFile(os.path.join(pp_dir, "plans_3d.json")) \
            .get_configuration("3d_lowres")
        prev_dir = _ensure_prev_stage_predictions(
            pp_dir, results_root, os.path.basename(ds_dir), args.tr,
            lowres_plan, ds)
        ds = PreprocessedDataset(cases={
            cid: append_prev_stage_channels(
                ds[cid], np.load(os.path.join(prev_dir, f"{cid}.npy")),
                plan.num_classes)
            for cid in ds.keys()})
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
    trainer.disable_checkpointing = bool(getattr(args, "disable_checkpointing",
                                                 False))
    if args.val:
        # --val_best validates checkpoint_best instead of final (reference
        # run_training.py:241-245); plain --val prefers final
        names = ("checkpoint_best.pkl",) if getattr(args, "val_best", False) \
            else ("checkpoint_final.pkl", "checkpoint_best.pkl",
                  "checkpoint_latest.pkl")
        ck = None
        for name in names:
            p = os.path.join(fold_dir, name)
            if os.path.exists(p):
                ck = p
                break
        if ck is None:
            raise SystemExit(f"--val: no checkpoint under {fold_dir}"
                             + (" (--val_best needs checkpoint_best.pkl)"
                                if getattr(args, "val_best", False) else ""))
        trainer.load_checkpoint(ck)
    else:
        if getattr(args, "pretrained_weights", None):
            if args.c_continue:
                # reference maybe_load_checkpoint: resume wins, pretrained
                # weights are ignored with a warning (run_training.py:76-86)
                print("WARNING: --c resume requested — ignoring "
                      "-pretrained_weights (reference semantics)")
            else:
                trainer.load_pretrained(args.pretrained_weights)
        trainer.run_training(ds.subset(tr_keys), ds.subset(va_keys),
                             continue_training=args.c_continue)
    val_imgs = [ds[k].data for k in va_keys]
    val_labs = [np.maximum(ds[k].seg, 0) for k in va_keys]
    # preprocessed-store cases are already normalized (and the cascade's
    # appended one-hot channels must stay {0,1}) — do not re-normalize
    trainer.perform_actual_validation(val_imgs, val_labs, normalize=False,
                                      save_npz=bool(getattr(args, "npz",
                                                            False)))
    print(f"fold {fold} done → {fold_dir}")
    return fold_dir


def _cmd_predict_volumetric(args) -> str:
    """Volumetric folder prediction (reference
    ``predict_from_raw_data.py:637-767`` driving 3d_fullres/3d_lowres/
    3d_cascade_fullres): read → z-score → resample to the plan's spacing →
    scan-tiled 3D prediction (cascade: lowres stage first, its segmentation
    one-hot-appended) → resample back → write via the dataset's
    reader-writer. Deviation: no nonzero-crop before prediction (the 2D
    export path's bbox revert analog) — whole-volume prediction instead."""
    from ldiffusion_tpu.data.io import determine_reader_writer_from_dataset_json
    from ldiffusion_tpu.segmentor.planner3d import SegPlan3D
    from ldiffusion_tpu.segmentor.predictor import (
        SlidingWindowPredictor,
        find_fold_checkpoints,
    )
    from ldiffusion_tpu.segmentor.preprocess import append_prev_stage_channels
    from ldiffusion_tpu.segmentor.resample import (
        compute_new_shape,
        resample_data_3d,
    )

    results_root = _require(args.results or env_paths.results_dir(warn=False),
                            "--results", "LDIFFUSION_RESULTS")
    raw_root = args.raw or env_paths.raw_dir(warn=False)
    ds_name = os.path.basename(find_dataset_dir(raw_root, args.d)) \
        if raw_root else f"Dataset{int(args.d):03d}"
    cfg_dir = _results_config_dir(results_root, ds_name, args.tr, args.c,
                                  plans_name=getattr(args, "p", None)
                                  or "ldPlans")
    if not os.path.isdir(cfg_dir):
        raise SystemExit(f"{cfg_dir} missing — train first")
    plan = SegPlan3D.load(os.path.join(cfg_dir, "plans.json"))
    lm, dataset_json = _label_manager(cfg_dir)
    ckpts = find_fold_checkpoints(cfg_dir, folds=args.f,
                                  checkpoint_name=getattr(args, "chk", None))
    # variant-restricted mirror TTA (reference
    # inference_allowed_mirroring_axes — a NoMirroring/NoDA-trained model
    # must not be flipped at inference)
    from ldiffusion_tpu.segmentor.variants import (
        get_variant,
        inference_mirror_config,
    )

    vmirror, vaxes = inference_mirror_config(get_variant(args.tr), 3)
    use_mirroring = (not args.disable_tta) and vmirror
    predictor = SlidingWindowPredictor.from_checkpoints(
        plan, ckpts, use_mirroring=use_mirroring, mirror_axes=vaxes,
        label_manager=lm, tile_step_size=getattr(args, "step_size", 0.5))

    prev_predictor = prev_plan = None
    if args.c == "3d_cascade_fullres" and \
            not getattr(args, "prev_stage_predictions", None):
        low_dir = _results_config_dir(results_root, ds_name, args.tr,
                                      "3d_lowres",
                                      plans_name=getattr(args, "p", None)
                                      or "ldPlans")
        if not os.path.isdir(low_dir):
            raise SystemExit(f"cascade prediction requires the trained "
                             f"3d_lowres stage ({low_dir} missing) or an "
                             f"explicit -prev_stage_predictions folder")
        prev_plan = SegPlan3D.load(os.path.join(low_dir, "plans.json"))
        prev_predictor = SlidingWindowPredictor.from_checkpoints(
            prev_plan, find_fold_checkpoints(low_dir, folds=args.f),
            use_mirroring=use_mirroring, mirror_axes=vaxes)

    rw = determine_reader_writer_from_dataset_json(dataset_json)
    ending = dataset_json.get("file_ending", ".npy").lower()
    os.makedirs(args.o, exist_ok=True)
    groups = _group_channel_files(args.i, ending)

    def _to_grid(vol, spacing, target_spacing):
        if tuple(spacing) == tuple(target_spacing):
            return vol
        new_shape = compute_new_shape(vol.shape[:3], spacing, target_spacing)
        return resample_data_3d(vol, new_shape, spacing, order=3)

    n = 0
    cases = sorted(groups.items())
    cases = cases[getattr(args, "part_id", 0)::getattr(args, "num_parts", 1)]
    for case, files in cases:
        out_path = os.path.join(args.o, f"{case}{ending}")
        if args.continue_prediction and os.path.exists(out_path):
            continue
        data, props = rw.read_images(
            [os.path.join(args.i, f) for f in sorted(files)])
        vol = np.moveaxis(data, 0, -1).astype(np.float32)  # (Z,H,W,c)
        spacing = tuple(props.get("spacing", (1.0, 1.0, 1.0)))
        mean = vol.mean(axis=(0, 1, 2), keepdims=True)
        std = vol.std(axis=(0, 1, 2), keepdims=True)
        vol_n = (vol - mean) / np.maximum(std, 1e-8)

        # vol_n is already z-scored — predict with normalize=False so the
        # predictor does not re-normalize (which would distort post-resample
        # statistics and, for the cascade, crush the {0,1} one-hot channels)
        grid = _to_grid(vol_n, spacing, plan.spacing)
        if args.c == "3d_cascade_fullres":
            prev_dir = getattr(args, "prev_stage_predictions", None)
            if prev_dir:
                # -prev_stage_predictions: consume an existing lowres
                # prediction folder (reference predict_from_raw_data.py:
                # 676-727) instead of running the lowres stage inline
                pf = os.path.join(prev_dir, f"{case}{ending}")
                if not os.path.exists(pf):
                    raise SystemExit(f"-prev_stage_predictions: {pf} missing")
                seg_low, _ = rw.read_seg(pf)
                seg_low = seg_low[0].astype(np.int32)
            else:
                # inline lowres stage: reproduce EXACTLY what `predict -c
                # 3d_lowres` writes to disk (predict on the lowres grid,
                # resample the seg to the raw grid, uint8) so the inline and
                # -prev_stage_predictions routes are bit-identical (reference
                # semantics: the cascade always consumes raw-grid lowres
                # segmentations, predict_from_raw_data.py:676-727)
                low = _to_grid(vol_n, spacing, prev_plan.spacing)
                seg_low = np.asarray(prev_predictor.predict(low,
                                                            normalize=False))
                if tuple(seg_low.shape) != tuple(vol.shape[:3]):
                    seg_low = resample_data_3d(seg_low, vol.shape[:3],
                                               prev_plan.spacing, is_seg=True)
                seg_low = seg_low.astype(np.uint8).astype(np.int32)
            # raw grid → fullres grid (both routes, same resample)
            if tuple(seg_low.shape) != tuple(grid.shape[:3]):
                seg_low = resample_data_3d(seg_low, grid.shape[:3],
                                           spacing, is_seg=True)
            onehot = np.eye(plan.num_classes,
                            dtype=np.float32)[np.maximum(seg_low, 0)][..., 1:]
            grid = np.concatenate([grid, onehot], axis=-1)
        logits = np.asarray(predictor.predict_logits(grid, normalize=False))
        seg = lm.convert_logits_to_segmentation(logits) if lm is not None \
            else np.argmax(logits, axis=-1)
        if tuple(seg.shape) != tuple(vol.shape[:3]):
            seg = resample_data_3d(np.asarray(seg), vol.shape[:3],
                                   plan.spacing, is_seg=True)
        rw.write_seg(np.asarray(seg).astype(np.uint8), out_path,
                     properties=props)
        if args.save_probabilities:
            from ldiffusion_tpu.segmentor.export import save_probabilities_npz

            save_probabilities_npz(logits, os.path.join(args.o, f"{case}.npz"),
                                   label_manager=lm)
        n += 1
    print(f"{n} volumetric predictions → {args.o}")
    return args.o


def cmd_predict(args) -> str:
    """folder prediction (reference ``predict_from_raw_data.py:637-767``)."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.export import save_probabilities_npz
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.predictor import (
        SlidingWindowPredictor,
        find_fold_checkpoints,
    )

    if args.c in VOLUMETRIC_CONFIGS:
        return _cmd_predict_volumetric(args)
    results_root = _require(args.results or env_paths.results_dir(warn=False),
                            "--results", "LDIFFUSION_RESULTS")
    raw_root = args.raw or env_paths.raw_dir(warn=False)
    ds_name = os.path.basename(find_dataset_dir(raw_root, args.d)) \
        if raw_root else f"Dataset{int(args.d):03d}"
    cfg_dir = _results_config_dir(results_root, ds_name, args.tr, args.c,
                                  plans_name=getattr(args, "p", None)
                                  or "ldPlans")
    if not os.path.isdir(cfg_dir):
        raise SystemExit(f"{cfg_dir} missing — train first")
    plan = SegPlan.load(os.path.join(cfg_dir, "plans.json"))
    lm, _ = _label_manager(cfg_dir)
    ckpts = find_fold_checkpoints(cfg_dir, folds=args.f,
                                  checkpoint_name=getattr(args, "chk", None))
    # mirror TTA restricted to the axes the -tr variant trained with
    # (reference inference_allowed_mirroring_axes)
    from ldiffusion_tpu.segmentor.variants import (
        get_variant,
        inference_mirror_config,
    )

    vmirror, vaxes = inference_mirror_config(get_variant(args.tr),
                                             len(plan.patch_size))
    predictor = SlidingWindowPredictor.from_checkpoints(
        plan, ckpts, use_mirroring=(not args.disable_tta) and vmirror,
        mirror_axes=vaxes, label_manager=lm,
        tile_step_size=getattr(args, "step_size", 0.5))

    os.makedirs(args.o, exist_ok=True)
    n = 0
    cases = sorted(_group_channel_files(args.i, ".png").items())
    # -num_parts/-part_id folder sharding (reference
    # predict_from_raw_data.py:226-231: files[part_id::num_parts])
    cases = cases[getattr(args, "part_id", 0)::getattr(args, "num_parts", 1)]
    for case, files in cases:
        out_png = os.path.join(args.o, f"{case}.png")
        if args.continue_prediction and os.path.exists(out_png):
            continue  # reference predict_from_raw_data.py:187-198
        img = _load_png_channels([os.path.join(args.i, f) for f in files])
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
# split plan-and-preprocess phases (nnUNetv2_extract_fingerprint /
# nnUNetv2_plan_experiment / nnUNetv2_preprocess)
# ---------------------------------------------------------------------------

def cmd_extract_fingerprint(args) -> str:
    """Fingerprint extraction with the reference's cache discipline
    (``plan_and_preprocess_api.py:22-33`` → ``fingerprint_extractor.py:107-114``):
    an existing ``dataset_fingerprint.json`` is reused unless ``--clean``."""
    from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    out = _pp_dataset_dir(pp_root, ds_dir)
    path = os.path.join(out, "dataset_fingerprint.json")
    if os.path.exists(path) and not getattr(args, "clean", False):
        print(f"fingerprint exists, reusing {path} (--clean re-extracts)")
        return path
    ids, images, labels = load_png_cases(ds_dir, "Tr")
    fp = extract_fingerprint(images, labels)
    os.makedirs(out, exist_ok=True)
    with open(path, "w") as f:
        json.dump({k: (v.tolist() if hasattr(v, "tolist") else v)
                   for k, v in fp.items()}, f, indent=2)
    print(f"fingerprint → {path}")
    return path


def cmd_plan_experiment(args) -> str:
    from ldiffusion_tpu.segmentor.planner import plan_experiment

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    out = _pp_dataset_dir(pp_root, ds_dir)
    fp_path = os.path.join(out, "dataset_fingerprint.json")
    if not os.path.exists(fp_path):
        cmd_extract_fingerprint(args)
    with open(fp_path) as f:
        fp = json.load(f)
    lm, dataset_json = _label_manager(ds_dir)
    plan = plan_experiment(fp, lm.num_segmentation_heads,
                           planner=_planner_kind(getattr(args, "pl", None)))
    plan.save(os.path.join(out, "plans.json"))
    with open(os.path.join(out, "dataset.json"), "w") as f:
        json.dump(dataset_json, f, indent=2)
    print(f"plans → {os.path.join(out, 'plans.json')}")
    return out


def cmd_preprocess(args) -> str:
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    ds_dir = find_dataset_dir(raw_root, args.d)
    out = _pp_dataset_dir(pp_root, ds_dir)
    configurations = getattr(args, "c", None) or ["2d"]
    if "2d" not in configurations:
        # reference -c: configurations that do not exist for a dataset are
        # skipped; the split-phase preprocess handles PNG (2d) datasets
        print(f"no requested configuration in {configurations} exists for "
              f"this 2d dataset — nothing to preprocess")
        return out
    if not os.path.exists(os.path.join(out, "plans.json")):
        cmd_plan_experiment(args)
    lm, _ = _label_manager(ds_dir)
    ids, images, labels = load_png_cases(ds_dir, "Tr")
    PreprocessedDataset.build(images, labels, _max_label_value(lm) + 1,
                              case_ids=ids,
                              directory=os.path.join(out, "ldPlans_2d"))
    print(f"preprocessed {len(ids)} cases → {out}/ldPlans_2d")
    return out


# ---------------------------------------------------------------------------
# evaluation / postprocessing / ensembling / best-config
# (nnUNetv2_evaluate_simple, nnUNetv2_determine_postprocessing,
#  nnUNetv2_apply_postprocessing, nnUNetv2_ensemble,
#  nnUNetv2_find_best_configuration, nnUNetv2_accumulate_crossval_results)
# ---------------------------------------------------------------------------

def _load_seg_folder(folder):
    from PIL import Image

    files = sorted(f for f in os.listdir(folder) if f.lower().endswith(".png"))
    return files, [np.asarray(Image.open(os.path.join(folder, f)), np.uint8)
                   for f in files]


def cmd_evaluate_folder(args):
    """Region-aware folder evaluation — both reference entry points
    (``evaluate_predictions.py:222-232``): ``-djfile dataset.json`` derives
    labels/regions + ignore label through the label manager
    (nnUNetv2_evaluate_folder), else ``-l`` lists them explicitly
    (nnUNetv2_evaluate_simple)."""
    from ldiffusion_tpu.evaluate import compute_metrics_on_folder

    ignore = args.il
    if getattr(args, "djfile", None):
        from ldiffusion_tpu.segmentor.label_manager import (
            label_manager_from_dataset_json,
        )

        with open(args.djfile) as f:
            dj = json.load(f)
        dj["labels"] = {k: tuple(v) if isinstance(v, list) else v
                        for k, v in dj["labels"].items()}
        lm = label_manager_from_dataset_json(dj)
        labels = lm.labels_or_regions_for_eval
        if ignore is None and lm.has_ignore_label:
            ignore = lm.ignore_label
        flat = [v for entry in labels
                for v in (entry if isinstance(entry, (tuple, list))
                          else (entry,))]
    elif args.l:
        labels = [int(x) for x in args.l]
        flat = labels
    else:
        raise SystemExit("evaluate_folder needs -l labels or -djfile "
                         "dataset.json")
    summary = compute_metrics_on_folder(
        args.pred_folder, args.gt_folder,
        num_classes=int(max(flat)) + 1,
        output_file=args.o or os.path.join(args.pred_folder, "summary.json"),
        regions_or_labels=labels, ignore_label=ignore)
    print(f"foreground mean Dice {summary['foreground_mean']['Dice']:.4f}")
    return summary


def cmd_determine_postprocessing(args):
    """reference ``remove_connected_components.py:
    entry_point_determine_postprocessing_folder``."""
    from ldiffusion_tpu.segmentor.postprocess import (
        determine_postprocessing,
        save_postprocessing,
    )

    _, preds = _load_seg_folder(args.i)
    _, gts = _load_seg_folder(args.ref)
    n = int(max(int(p.max()) for p in preds + gts)) + 1
    steps = determine_postprocessing(preds, gts, n)
    out = args.o or os.path.join(args.i, "postprocessing.json")
    save_postprocessing(steps, out)
    print(f"{len(steps)} postprocessing step(s) → {out}")
    return steps


def cmd_apply_postprocessing(args):
    """reference ``entry_point_apply_postprocessing``."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.postprocess import (
        apply_postprocessing,
        load_postprocessing,
    )

    steps = load_postprocessing(args.pp_pkl_file)
    os.makedirs(args.o, exist_ok=True)
    files, segs = _load_seg_folder(args.i)
    for f, s in zip(files, segs):
        Image.fromarray(apply_postprocessing(s, steps)).save(
            os.path.join(args.o, f))
    print(f"{len(files)} files postprocessed → {args.o}")


def cmd_ensemble(args):
    """Mean-probability ensembling of prediction folders holding the
    --save_probabilities npz payloads (reference
    ``ensembling/ensemble.py:entry_point_ensemble_folders`` — the reference
    paints the merged probabilities through the label manager, so regions
    regimes need ``-d`` to locate the dataset.json; without it the plain
    argmax rule applies)."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.best_config import ensemble_probabilities

    lm = None
    if args.d is not None:
        raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                            "--raw", "LDIFFUSION_RAW")
        lm, _ = _label_manager(find_dataset_dir(raw_root, args.d))
    os.makedirs(args.o, exist_ok=True)
    names = sorted(f for f in os.listdir(args.i[0]) if f.endswith(".npz"))
    if not names:
        raise SystemExit(f"no .npz probability files in {args.i[0]} — predict "
                         f"with --save_probabilities first")
    for n in names:
        probs = [np.load(os.path.join(d, n))["probabilities"].astype(np.float32)
                 for d in args.i]
        mean = ensemble_probabilities(probs)
        if lm is not None:
            seg = lm.convert_probabilities_to_segmentation(mean).astype(np.uint8)
        else:
            seg = np.argmax(mean, axis=-1).astype(np.uint8)
        Image.fromarray(seg).save(os.path.join(args.o, n[:-4] + ".png"))
        if args.save_npz:
            np.savez_compressed(os.path.join(args.o, n),
                                probabilities=mean.astype(np.float16))
    print(f"ensembled {len(names)} cases from {len(args.i)} folders → {args.o}")


def cmd_find_best_configuration(args):
    """CV-consuming configuration selection (reference
    ``find_best_configuration_entry_point``)."""
    from ldiffusion_tpu.segmentor.best_config import (
        find_best_configuration_from_folds,
    )
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    results_root = _require(args.results or env_paths.results_dir(warn=False),
                            "--results", "LDIFFUSION_RESULTS")
    ds_dir = find_dataset_dir(raw_root, args.d)
    pp_dir = _pp_dataset_dir(pp_root, ds_dir)
    ds = PreprocessedDataset.load(os.path.join(pp_dir, "ldPlans_2d"))
    lm, _ = _label_manager(pp_dir)
    configs = {}
    for c in args.c:
        cfg_dir = _results_config_dir(results_root, os.path.basename(ds_dir),
                                      args.tr, c)
        # fold CV needs the dataset's splits next to the checkpoints
        import shutil

        src = os.path.join(pp_dir, "splits_final.json")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(cfg_dir, "splits_final.json"))
        configs[c] = (SegPlan.load(os.path.join(cfg_dir, "plans.json")), cfg_dir)
    from ldiffusion_tpu.segmentor.variants import (
        get_variant,
        inference_mirror_config,
    )

    vmirror, vaxes = inference_mirror_config(get_variant(args.tr), 2)
    info = find_best_configuration_from_folds(
        configs, ds, num_classes=lm.num_segmentation_heads,
        output_json=os.path.join(results_root, os.path.basename(ds_dir),
                                 "inference_information.json"),
        use_mirroring=(not args.disable_tta) and vmirror,
        mirror_axes=vaxes, label_manager=lm)
    print(f"best configuration: {info['best_configuration']} "
          f"(fg dice {info['score']:.4f})")
    return info


# ---------------------------------------------------------------------------
# model sharing / converters / overlays
# (nnUNetv2_export_model_to_zip, nnUNetv2_install_pretrained_model_from_zip,
#  nnUNetv2_convert_MSD_dataset, nnUNetv2_plot_overlay_pngs,
#  nnUNetv2_move_plans_between_datasets)
# ---------------------------------------------------------------------------

def cmd_predict_from_modelfolder(args):
    """Predict from an EXPLICIT model folder (reference
    ``predict_entry_point_modelfolder``): the folder holds plans.json,
    dataset.json and fold_*/checkpoints — no env-root lookup."""
    from PIL import Image

    from ldiffusion_tpu.segmentor.export import save_probabilities_npz
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.predictor import (
        SlidingWindowPredictor,
        find_fold_checkpoints,
    )

    cfg_dir = args.m
    plan = SegPlan.load(os.path.join(cfg_dir, "plans.json"))
    lm, _ = _label_manager(cfg_dir)
    ckpts = find_fold_checkpoints(cfg_dir, folds=args.f,
                                  checkpoint_name=getattr(args, "chk", None))
    # the results-folder naming encodes the trainer ({tr}__ldPlans__{cfg},
    # _results_config_dir) — recover it so variant mirror restrictions
    # (NoMirroring/NoDA/onlyMirror01) survive modelfolder prediction too
    from ldiffusion_tpu.segmentor.variants import (
        KNOWN_VARIANT_NAMES,
        get_variant,
        inference_mirror_config,
    )

    tr_name = os.path.basename(os.path.normpath(cfg_dir)).split("__")[0]
    variant = get_variant(tr_name) if tr_name in KNOWN_VARIANT_NAMES else None
    vmirror, vaxes = inference_mirror_config(variant, len(plan.patch_size))
    predictor = SlidingWindowPredictor.from_checkpoints(
        plan, ckpts, use_mirroring=(not args.disable_tta) and vmirror,
        mirror_axes=vaxes, label_manager=lm,
        tile_step_size=getattr(args, "step_size", 0.5))
    os.makedirs(args.o, exist_ok=True)
    n = 0
    for case, files in sorted(_group_channel_files(args.i, ".png").items()):
        img = _load_png_channels([os.path.join(args.i, f) for f in files])
        logits = predictor.predict_logits(img)
        seg = lm.convert_logits_to_segmentation(logits)
        Image.fromarray(seg.astype(np.uint8)).save(
            os.path.join(args.o, f"{case}.png"))
        if args.save_probabilities:
            save_probabilities_npz(logits, os.path.join(args.o, f"{case}.npz"),
                                   label_manager=lm)
        n += 1
    print(f"{n} predictions → {args.o}")
    return args.o


def cmd_accumulate_crossval_results(args):
    """Merge per-fold validation summaries into one CV summary.json
    (reference ``find_best_configuration.py:
    accumulate_cv_results`` / its entry point): per-case entries concatenate
    across folds, per-entry means recompute nan-aware."""
    cfg_dir = args.m
    folds = sorted(d for d in os.listdir(cfg_dir) if d.startswith("fold_"))
    per_case = []
    for d in folds:
        p = os.path.join(cfg_dir, d, "validation", "summary.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            per_case.extend(json.load(f)["metric_per_case"])
    if not per_case:
        raise SystemExit(f"no fold validation summaries under {cfg_dir}")
    entries = list(per_case[0]["metrics"].keys())
    mean = {}
    for e in entries:
        mean[e] = {}
        for key in ("Dice", "IoU"):
            vals = [c["metrics"][e][key] for c in per_case
                    if not (isinstance(c["metrics"][e][key], float)
                            and np.isnan(c["metrics"][e][key]))]
            mean[e][key] = float(np.mean(vals)) if vals else float("nan")
    fg = [mean[e]["Dice"] for e in entries if e not in ("0",)
          and not np.isnan(mean[e]["Dice"])]
    summary = {"metric_per_case": per_case, "mean": mean,
               "foreground_mean": {"Dice": float(np.mean(fg)) if fg
                                   else float("nan")}}
    out = args.o or os.path.join(cfg_dir, "crossval_results_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"CV summary over {len(folds)} folds ({len(per_case)} cases) → {out}")
    return summary


def cmd_export_model(args):
    from ldiffusion_tpu.segmentor.model_sharing import export_model

    export_model(args.model_dir, args.o)
    print(f"model exported → {args.o}")


def cmd_install_model(args):
    from ldiffusion_tpu.segmentor.model_sharing import import_model

    out = import_model(args.zip, args.o)
    print(f"model installed → {out}")


def cmd_download_model(args):
    from ldiffusion_tpu.segmentor.model_sharing import (
        download_and_install_from_url,
    )

    out = download_and_install_from_url(args.url, args.o)
    print(f"model downloaded and installed → {out}")


def cmd_convert_msd(args):
    from ldiffusion_tpu.data.converters import convert_msd_dataset

    out = convert_msd_dataset(args.i, args.o)
    print(f"MSD dataset converted → {out}")


def cmd_convert_old_dataset(args):
    """Old (v1) nnUNet raw dataset → current layout (reference
    ``dataset_conversion/convert_raw_dataset_from_old_nnunet_format.py:8-40``):
    copy images/labels folders verbatim, translate dataset.json —
    ``modality`` → ``channel_names``, labels invert name→id to id stays...
    the old format maps id→name, the new maps name→id — drop the training/
    test case lists and add ``file_ending``."""
    import shutil

    src = args.i
    dst = args.o
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        s = os.path.join(src, sub)
        if os.path.isdir(s):
            shutil.copytree(s, os.path.join(dst, sub), dirs_exist_ok=True)
    with open(os.path.join(src, "dataset.json")) as f:
        dj = json.load(f)
    for k in ("tensorImageSize", "numTest", "training", "test"):
        dj.pop(k, None)
    if "modality" in dj:
        dj["channel_names"] = dj.pop("modality")
    # old format: {"0": "background", "1": "tumor"} (id → name);
    # new format: {"background": 0, "tumor": 1}
    if dj.get("labels") and all(str(k).lstrip("-").isdigit()
                                for k in dj["labels"]):
        dj["labels"] = {v: int(k) for k, v in dj["labels"].items()}
    dj.setdefault("file_ending", args.file_ending)
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "dataset.json"), "w") as f:
        json.dump(dj, f, indent=2)
    print(f"old-format dataset converted → {dst}")
    return dst


def cmd_plot_overlays(args):
    from PIL import Image

    from ldiffusion_tpu.utils import save_segmentation_overlay

    os.makedirs(args.o, exist_ok=True)
    segs = {f[:-4]: f for f in os.listdir(args.seg_folder)
            if f.lower().endswith(".png")}
    n = 0
    for f in sorted(os.listdir(args.image_folder)):
        if not f.lower().endswith(".png"):
            continue
        case = f[:-9] if f.endswith("_0000.png") else f[:-4]
        if case not in segs:
            continue
        img = np.asarray(Image.open(
            os.path.join(args.image_folder, f)).convert("RGB"))
        seg = np.asarray(Image.open(
            os.path.join(args.seg_folder, segs[case])), np.uint8)
        save_segmentation_overlay(img, seg, os.path.join(args.o, f"{case}.png"))
        n += 1
    print(f"{n} overlays → {args.o}")


def cmd_move_plans(args):
    import shutil

    pp_root = _require(args.preprocessed or env_paths.preprocessed_dir(warn=False),
                       "--preprocessed", "LDIFFUSION_PREPROCESSED")
    raw_root = _require(args.raw or env_paths.raw_dir(warn=False),
                        "--raw", "LDIFFUSION_RAW")
    src = _pp_dataset_dir(pp_root, find_dataset_dir(raw_root, args.s))
    dst = _pp_dataset_dir(pp_root, find_dataset_dir(raw_root, args.t))
    os.makedirs(dst, exist_ok=True)
    shutil.copy(os.path.join(src, "plans.json"),
                os.path.join(dst, "plans.json"))
    print(f"plans moved {src} → {dst}")


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
    pp.add_argument("--hbm_budget", type=int, default=None,
                    help="volumetric planning memory budget in bytes "
                         "(per-chip; the -gpu_memory_target analog)")
    pp.add_argument("-pl", default="default",
                    help="planner: default | resenc (reference planner "
                         "class names like nnUNetPlannerResEncM accepted)")
    pp.add_argument("--no_pp", action="store_true",
                    help="plan only, skip preprocessing (reference --no_pp)")
    pp.add_argument("-overwrite_target_spacing", nargs="+", type=float,
                    default=None,
                    help="custom target spacing (z y x) for the 3d_fullres/"
                         "3d_cascade_fullres configurations (reference "
                         "-overwrite_target_spacing)")
    pp.add_argument("-preprocessor_name", default=None,
                    help="custom preprocessor class (registered via "
                         "@register('preprocessor') or found in "
                         "ldiffusion_tpu.segmentor; default "
                         "DefaultPreprocessor)")
    pp.add_argument("-overwrite_plans_name", default=None,
                    help="write plans under a custom identifier (consume "
                         "with -p NAME in train/predict)")
    pp.add_argument("-c", nargs="+",
                    default=["2d", "3d_fullres", "3d_lowres"],
                    help="configurations to preprocess (reference -c, "
                         "default: 2d 3d_fullres 3d_lowres; "
                         "3d_cascade_fullres reuses 3d_fullres data; "
                         "configurations that do not exist for a dataset "
                         "are skipped)")
    pp.add_argument("--clean", action="store_true",
                    help="re-extract the dataset fingerprint even if a "
                         "cached dataset_fingerprint.json exists "
                         "(reference --clean)")
    pp.set_defaults(fn=cmd_plan_and_preprocess)

    tr = sub.add_parser("train", help="train one fold (nnUNetv2_train)")
    common(tr)
    tr.add_argument("-c", default="2d", help="configuration: 2d | 3d_fullres | 3d_lowres | 3d_cascade_fullres")
    tr.add_argument("-f", default="0", help="fold index or 'all'")
    tr.add_argument("-tr", default="nnUNetTrainer", help="trainer variant name")
    tr.add_argument("-p", default="ldPlans",
                    help="plans identifier (custom NAME reads NAME.json / "
                         "NAME_3d.json from the preprocessed dir and names "
                         "the results dir trainer__NAME__config)")
    tr.add_argument("-pretrained_weights", default=None,
                    help="checkpoint .pkl whose shape-matched tensors "
                         "initialize the fresh model (nnUNetv2_train "
                         "-pretrained_weights)")
    tr.add_argument("--c", dest="c_continue", action="store_true",
                    help="continue from latest checkpoint")
    tr.add_argument("--val", action="store_true",
                    help="validation only (needs a trained checkpoint)")
    tr.add_argument("--val_best", action="store_true",
                    help="with --val: validate checkpoint_best instead of "
                         "final")
    tr.add_argument("--npz", action="store_true",
                    help="save validation probabilities as npz (feeds "
                         "find_best_configuration ensembling)")
    tr.add_argument("--disable_checkpointing", action="store_true",
                    help="skip every checkpoint save (testing)")
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
    pr.add_argument("-c", default="2d", help="configuration: 2d | 3d_fullres | 3d_lowres | 3d_cascade_fullres")
    pr.add_argument("-f", nargs="+", default=["0", "1", "2", "3", "4"],
                    help="folds to ensemble (default: all five, matching "
                         "nnUNetv2_predict; untrained folds are skipped "
                         "with a warning)")
    pr.add_argument("-tr", default="nnUNetTrainer")
    pr.add_argument("-p", default="ldPlans", help="plans identifier")
    pr.add_argument("-chk", default=None,
                    help="exact checkpoint file name (e.g. "
                         "checkpoint_final.pkl); default prefers best, "
                         "falling back to final")
    pr.add_argument("-step_size", type=float, default=0.5,
                    help="sliding-window step as a fraction of patch size")
    pr.add_argument("-num_parts", type=int, default=1,
                    help="split the input folder into this many parts")
    pr.add_argument("-part_id", type=int, default=0,
                    help="which part this invocation predicts "
                         "(files[part_id::num_parts])")
    pr.add_argument("-prev_stage_predictions", default=None,
                    help="3d_cascade_fullres: folder of lowres-stage "
                         "segmentations (one per case, same ending); "
                         "default runs the trained lowres stage inline")
    pr.add_argument("--save_probabilities", action="store_true")
    pr.add_argument("--continue_prediction", action="store_true")
    pr.add_argument("--disable_tta", action="store_true")
    pr.add_argument("--raw", default=None)
    pr.add_argument("--results", default=None)
    pr.set_defaults(fn=cmd_predict)

    # split plan-and-preprocess phases
    for name, fn in (("extract_fingerprint", cmd_extract_fingerprint),
                     ("plan_experiment", cmd_plan_experiment),
                     ("preprocess", cmd_preprocess)):
        sp = sub.add_parser(name, help=f"nnUNetv2_{name} analog")
        common(sp)
        if name == "plan_experiment":
            sp.add_argument("-pl", default="default",
                            help="planner: default | resenc")
        if name == "extract_fingerprint":
            sp.add_argument("--clean", action="store_true",
                            help="overwrite an existing cached fingerprint "
                                 "(reference --clean; without it an "
                                 "existing dataset_fingerprint.json is "
                                 "reused)")
        if name == "preprocess":
            sp.add_argument("-c", nargs="+",
                            default=["2d", "3d_fullres", "3d_lowres"],
                            help="configurations to preprocess "
                                 "(reference -c)")
        sp.set_defaults(fn=fn)

    ev = sub.add_parser("evaluate_folder",
                        help="region-aware folder metrics (nnUNetv2_evaluate_simple)")
    ev.add_argument("gt_folder")
    ev.add_argument("pred_folder")
    ev.add_argument("-l", nargs="+", default=None, help="labels to score")
    ev.add_argument("-djfile", default=None,
                    help="dataset.json: labels/regions + ignore label come "
                         "from the label manager (nnUNetv2_evaluate_folder)")
    ev.add_argument("-il", type=int, default=None, help="ignore label")
    ev.add_argument("-o", default=None)
    ev.set_defaults(fn=cmd_evaluate_folder)

    dp = sub.add_parser("determine_postprocessing",
                        help="nnUNetv2_determine_postprocessing analog")
    dp.add_argument("-i", required=True, help="prediction folder")
    dp.add_argument("-ref", required=True, help="ground-truth folder")
    dp.add_argument("-o", default=None)
    dp.set_defaults(fn=cmd_determine_postprocessing)

    ap = sub.add_parser("apply_postprocessing",
                        help="nnUNetv2_apply_postprocessing analog")
    ap.add_argument("-i", required=True)
    ap.add_argument("-o", required=True)
    ap.add_argument("-pp_pkl_file", required=True,
                    help="postprocessing.json from determine_postprocessing")
    ap.set_defaults(fn=cmd_apply_postprocessing)

    en = sub.add_parser("ensemble", help="nnUNetv2_ensemble analog "
                                         "(mean of npz probabilities)")
    en.add_argument("-i", nargs="+", required=True, help="prediction folders")
    en.add_argument("-o", required=True)
    en.add_argument("-d", type=int, default=None,
                    help="dataset id — REQUIRED for regions regimes so the "
                         "merged probabilities paint through the label manager")
    en.add_argument("--raw", default=None)
    en.add_argument("--save_npz", action="store_true")
    en.set_defaults(fn=cmd_ensemble)

    bc = sub.add_parser("find_best_configuration",
                        help="nnUNetv2_find_best_configuration analog")
    common(bc)
    bc.add_argument("-c", nargs="+", default=["2d"])
    bc.add_argument("-tr", default="nnUNetTrainer")
    bc.add_argument("--results", default=None)
    bc.add_argument("--disable_tta", action="store_true")
    bc.set_defaults(fn=cmd_find_best_configuration)

    pm = sub.add_parser("predict_from_modelfolder",
                        help="nnUNetv2_predict_from_modelfolder analog")
    pm.add_argument("-i", required=True)
    pm.add_argument("-o", required=True)
    pm.add_argument("-m", required=True, help="model (config) folder")
    pm.add_argument("-f", nargs="+", default=["0", "1", "2", "3", "4"],
                    help="folds to ensemble (default: all five; untrained "
                         "folds are skipped with a warning)")
    pm.add_argument("-chk", default=None, help="exact checkpoint file name")
    pm.add_argument("-step_size", type=float, default=0.5,
                    help="sliding-window step as a fraction of patch size")
    pm.add_argument("--save_probabilities", action="store_true")
    pm.add_argument("--disable_tta", action="store_true")
    pm.set_defaults(fn=cmd_predict_from_modelfolder)

    ac = sub.add_parser("accumulate_crossval_results",
                        help="nnUNetv2_accumulate_crossval_results analog")
    ac.add_argument("-m", required=True, help="model (config) folder with fold_*")
    ac.add_argument("-o", default=None)
    ac.set_defaults(fn=cmd_accumulate_crossval_results)

    ex = sub.add_parser("export_model", help="nnUNetv2_export_model_to_zip analog")
    ex.add_argument("model_dir")
    ex.add_argument("-o", required=True)
    ex.set_defaults(fn=cmd_export_model)

    im = sub.add_parser("install_model",
                        help="nnUNetv2_install_pretrained_model_from_zip analog")
    im.add_argument("zip")
    im.add_argument("-o", required=True)
    im.set_defaults(fn=cmd_install_model)

    dl = sub.add_parser("download_model",
                        help="nnUNetv2_download_pretrained_model_by_url analog "
                             "(http(s):// needs egress; file:// works offline)")
    dl.add_argument("url")
    dl.add_argument("-o", required=True, help="install target directory")
    dl.set_defaults(fn=cmd_download_model)

    ms = sub.add_parser("convert_msd", help="nnUNetv2_convert_MSD_dataset analog")
    ms.add_argument("-i", required=True)
    ms.add_argument("-o", required=True)
    ms.set_defaults(fn=cmd_convert_msd)

    co = sub.add_parser("convert_old_dataset",
                        help="nnUNetv2_convert_old_nnUNet_dataset analog")
    co.add_argument("-i", required=True, help="old-format dataset folder")
    co.add_argument("-o", required=True, help="target DatasetXXX_Name folder")
    co.add_argument("--file_ending", default=".nii.gz")
    co.set_defaults(fn=cmd_convert_old_dataset)

    ov = sub.add_parser("plot_overlays", help="nnUNetv2_plot_overlay_pngs analog")
    ov.add_argument("image_folder")
    ov.add_argument("seg_folder")
    ov.add_argument("-o", required=True)
    ov.set_defaults(fn=cmd_plot_overlays)

    mv = sub.add_parser("move_plans",
                        help="nnUNetv2_move_plans_between_datasets analog")
    mv.add_argument("-s", type=int, required=True, help="source dataset id")
    mv.add_argument("-t", type=int, required=True, help="target dataset id")
    mv.add_argument("--raw", default=None)
    mv.add_argument("--preprocessed", default=None)
    mv.set_defaults(fn=cmd_move_plans)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
