"""Segmentor CLI smoke tests (reference console entry points
``nnUNetv2_plan_and_preprocess`` / ``nnUNetv2_train`` / ``nnUNetv2_predict``,
``model/pyproject.toml:69-85``): all three subcommands run end-to-end on a
tiny synthetic dataset, including a regions-regime dataset predicted through
the painted-label path.
"""
import json
import os

import numpy as np
import pytest

from ldiffusion_tpu.data.converters import generate_integration_test_dataset
from ldiffusion_tpu.segmentor.cli import main


def _roots(tmp_path):
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    res = tmp_path / "res"
    for d in (raw, pp, res):
        d.mkdir(exist_ok=True)
    return str(raw), str(pp), str(res)


def _run_all(tmp_path, regime, dataset_id, num_classes=3):
    raw, pp, res = _roots(tmp_path)
    ds_dir = os.path.join(raw, f"Dataset{dataset_id:03d}_Test")
    generate_integration_test_dataset(ds_dir, n_cases=4, size=32,
                                      num_classes=num_classes, regime=regime)
    main(["plan_and_preprocess", "-d", str(dataset_id),
          "--verify_dataset_integrity", "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{dataset_id:03d}_Test")
    assert os.path.exists(os.path.join(pp_dir, "plans.json"))
    assert os.path.exists(os.path.join(pp_dir, "dataset.json"))
    assert any(f.endswith(".npz")
               for f in os.listdir(os.path.join(pp_dir, "ldPlans_2d")))

    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "0",
          "--epochs", "1", "--iters", "2",
          "--raw", raw, "--preprocessed", pp, "--results", res])
    cfg_dir = os.path.join(res, f"Dataset{dataset_id:03d}_Test",
                           "nnUNetTrainer__ldPlans__2d")
    fold_dir = os.path.join(cfg_dir, "fold_0")
    assert os.path.exists(os.path.join(pp_dir, "splits_final.json"))
    assert os.path.exists(os.path.join(fold_dir, "checkpoint_final.pkl"))
    assert os.path.exists(os.path.join(fold_dir, "validation", "summary.json"))

    out = str(tmp_path / "preds")
    main(["predict", "-i", os.path.join(ds_dir, "imagesTs"), "-o", out,
          "-d", str(dataset_id), "-f", "0", "--save_probabilities",
          "--disable_tta", "--raw", raw, "--results", res])
    preds = [f for f in os.listdir(out) if f.endswith(".png")]
    assert preds
    assert any(f.endswith(".npz") for f in os.listdir(out))
    return ds_dir, fold_dir, out


@pytest.mark.slow
def test_cli_plain_regime_end_to_end(tmp_path):
    from PIL import Image

    ds_dir, fold_dir, out = _run_all(tmp_path, "plain", dataset_id=1)
    for f in sorted(os.listdir(out)):
        if f.endswith(".png"):
            vals = np.unique(np.asarray(Image.open(os.path.join(out, f))))
            assert vals.max() < 3  # class ids


@pytest.mark.slow
def test_cli_regions_regime_end_to_end(tmp_path):
    """Regions dataset: the CLI trains sigmoid heads and predictions are
    PAINTED label values (regions_class_order), with region-keyed
    summary.json."""
    from PIL import Image

    ds_dir, fold_dir, out = _run_all(tmp_path, "regions", dataset_id=2)
    summary = json.load(open(os.path.join(fold_dir, "validation",
                                          "summary.json")))
    assert set(summary["mean"].keys()) == {"(1, 2)", "(2,)"}
    for f in sorted(os.listdir(out)):
        if f.endswith(".png"):
            vals = set(np.unique(np.asarray(Image.open(os.path.join(out, f)))))
            assert vals <= {0, 1, 2}
    # probabilities npz: sigmoid per region head (2 channels)
    npz = [f for f in os.listdir(out) if f.endswith(".npz")][0]
    probs = np.load(os.path.join(out, npz))["probabilities"]
    assert probs.shape[-1] == 2


def test_cli_unknown_trainer_fails_loudly(tmp_path):
    raw, pp, res = _roots(tmp_path)
    ds_dir = os.path.join(raw, "Dataset003_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=2, regime="plain")
    main(["plan_and_preprocess", "-d", "3", "--raw", raw, "--preprocessed", pp])
    with pytest.raises(ValueError, match="unknown trainer variant"):
        main(["train", "-d", "3", "-tr", "nnUNetTrainerTypo", "--epochs", "1",
              "--iters", "1", "--raw", raw, "--preprocessed", pp,
              "--results", res])


def test_cli_missing_dataset_errors(tmp_path):
    raw, pp, res = _roots(tmp_path)
    with pytest.raises(FileNotFoundError):
        main(["plan_and_preprocess", "-d", "99", "--raw", raw,
              "--preprocessed", pp])


# ---------------------------------------------------------------------------
# the rest of the reference's console-script surface
# (model/pyproject.toml:60-85), as subcommands
# ---------------------------------------------------------------------------

def test_cli_split_phases(tmp_path):
    """extract_fingerprint → plan_experiment → preprocess compose into the
    same artifacts plan_and_preprocess produces."""
    raw, pp, res = _roots(tmp_path)
    ds_dir = os.path.join(raw, "Dataset004_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=2, regime="plain")
    main(["extract_fingerprint", "-d", "4", "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, "Dataset004_Test")
    assert os.path.exists(os.path.join(pp_dir, "dataset_fingerprint.json"))
    main(["plan_experiment", "-d", "4", "--raw", raw, "--preprocessed", pp])
    assert os.path.exists(os.path.join(pp_dir, "plans.json"))
    main(["preprocess", "-d", "4", "--raw", raw, "--preprocessed", pp])
    assert any(f.endswith(".npz")
               for f in os.listdir(os.path.join(pp_dir, "ldPlans_2d")))


def _seg_folders(tmp_path, n=2, size=16):
    from PIL import Image

    rng = np.random.default_rng(0)
    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(exist_ok=True)
    gt.mkdir(exist_ok=True)
    for i in range(n):
        g = np.zeros((size, size), np.uint8)
        g[4:10, 4:10] = 1
        p = g.copy()
        p[0, 0] = 1  # a spurious component
        Image.fromarray(g).save(gt / f"case_{i:03d}.png")
        Image.fromarray(p).save(pred / f"case_{i:03d}.png")
    return str(pred), str(gt)


def test_cli_evaluate_and_postprocessing_roundtrip(tmp_path):
    import json as _json

    pred, gt = _seg_folders(tmp_path)
    summary = main(["evaluate_folder", gt, pred, "-l", "1",
                    "-o", str(tmp_path / "summary.json")])
    assert "1" in summary["mean"]
    assert os.path.exists(tmp_path / "summary.json")

    steps = main(["determine_postprocessing", "-i", pred, "-ref", gt,
                  "-o", str(tmp_path / "pp.json")])
    assert steps  # removing the spurious component improves dice
    out = str(tmp_path / "pp_out")
    main(["apply_postprocessing", "-i", pred, "-o", out,
          "-pp_pkl_file", str(tmp_path / "pp.json")])
    from PIL import Image
    fixed = np.asarray(Image.open(os.path.join(out, "case_000.png")))
    assert fixed[0, 0] == 0  # spurious component removed
    assert (fixed[4:10, 4:10] == 1).all()


def test_cli_ensemble(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    # two 3-class probability maps that disagree; the mean decides
    pa = np.zeros((8, 8, 3), np.float16)
    pa[..., 1] = 0.9
    pb = np.zeros((8, 8, 3), np.float16)
    pb[..., 2] = 0.6
    pb[..., 1] = 0.4
    np.savez_compressed(a / "case_000.npz", probabilities=pa)
    np.savez_compressed(b / "case_000.npz", probabilities=pb)
    out = str(tmp_path / "ens")
    main(["ensemble", "-i", str(a), str(b), "-o", out, "--save_npz"])
    from PIL import Image
    seg = np.asarray(Image.open(os.path.join(out, "case_000.png")))
    assert (seg == 1).all()  # mean prob: class1 0.65 vs class2 0.3
    assert os.path.exists(os.path.join(out, "case_000.npz"))


def test_cli_model_sharing_and_overlays_and_move_plans(tmp_path):
    from PIL import Image

    raw, pp, res = _roots(tmp_path)
    # model zip round trip over an arbitrary artifact dir
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "plans.json").write_text("{}")
    (model_dir / "checkpoint_final.pkl").write_bytes(b"x")
    zpath = str(tmp_path / "m.zip")
    main(["export_model", str(model_dir), "-o", zpath])
    out = str(tmp_path / "installed")
    main(["install_model", zpath, "-o", out])
    assert os.path.exists(os.path.join(out, "plans.json"))

    # overlays
    imgs = tmp_path / "imgs"
    segs = tmp_path / "segs"
    imgs.mkdir()
    segs.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        imgs / "case_000_0000.png")
    Image.fromarray((np.ones((16, 16)) * 1).astype(np.uint8)).save(
        segs / "case_000.png")
    ovl = str(tmp_path / "ovl")
    main(["plot_overlays", str(imgs), str(segs), "-o", ovl])
    assert os.path.exists(os.path.join(ovl, "case_000.png"))

    # move plans between datasets
    for i in (5, 6):
        generate_integration_test_dataset(
            os.path.join(raw, f"Dataset{i:03d}_Test"), n_cases=2, size=32,
            num_classes=2, regime="plain")
    main(["plan_experiment", "-d", "5", "--raw", raw, "--preprocessed", pp])
    main(["move_plans", "-s", "5", "-t", "6", "--raw", raw,
          "--preprocessed", pp])
    assert os.path.exists(os.path.join(pp, "Dataset006_Test", "plans.json"))


@pytest.mark.slow
def test_cli_find_best_configuration(tmp_path):
    """Two folds trained via the CLI, then the CV-consuming best-config
    selection writes inference_information.json."""
    raw, pp, res = _roots(tmp_path)
    ds_dir = os.path.join(raw, "Dataset007_Test")
    generate_integration_test_dataset(ds_dir, n_cases=5, size=32,
                                      num_classes=2, regime="plain")
    main(["plan_and_preprocess", "-d", "7", "--raw", raw, "--preprocessed", pp])
    for f in ("0", "1"):
        main(["train", "-d", "7", "-f", f, "--epochs", "1", "--iters", "2",
              "--raw", raw, "--preprocessed", pp, "--results", res])
    info = main(["find_best_configuration", "-d", "7", "--raw", raw,
                 "--preprocessed", pp, "--results", res, "--disable_tta"])
    assert info["best_configuration"] == "2d"
    assert os.path.exists(os.path.join(res, "Dataset007_Test",
                                       "inference_information.json"))


@pytest.mark.slow
def test_cli_modelfolder_predict_and_crossval_accumulate(tmp_path):
    """predict_from_modelfolder works off an explicit folder, and
    accumulate_crossval_results merges the fold validation summaries."""
    raw, pp, res = _roots(tmp_path)
    ds_dir = os.path.join(raw, "Dataset008_Test")
    generate_integration_test_dataset(ds_dir, n_cases=5, size=32,
                                      num_classes=2, regime="plain")
    main(["plan_and_preprocess", "-d", "8", "--raw", raw, "--preprocessed", pp])
    for f in ("0", "1"):
        main(["train", "-d", "8", "-f", f, "--epochs", "1", "--iters", "2",
              "--raw", raw, "--preprocessed", pp, "--results", res])
    cfg_dir = os.path.join(res, "Dataset008_Test", "nnUNetTrainer__ldPlans__2d")

    out = str(tmp_path / "mf_preds")
    main(["predict_from_modelfolder", "-i", os.path.join(ds_dir, "imagesTs"),
          "-o", out, "-m", cfg_dir, "-f", "0", "1", "--disable_tta"])
    assert any(f.endswith(".png") for f in os.listdir(out))

    summary = main(["accumulate_crossval_results", "-m", cfg_dir,
                    "-o", str(tmp_path / "cv.json")])
    assert os.path.exists(tmp_path / "cv.json")
    # both folds' validation cases merged
    n0 = len(json.load(open(os.path.join(cfg_dir, "fold_0", "validation",
                                         "summary.json")))["metric_per_case"])
    n1 = len(json.load(open(os.path.join(cfg_dir, "fold_1", "validation",
                                         "summary.json")))["metric_per_case"])
    assert len(summary["metric_per_case"]) == n0 + n1
    assert "Dice" in summary["foreground_mean"]


def test_cli_convert_old_dataset(tmp_path):
    """Old-format (v1) dataset.json translates: modality → channel_names,
    id→name labels invert to name→id, case lists dropped (reference
    convert_raw_dataset_from_old_nnunet_format.py:8-40)."""
    from PIL import Image

    src = tmp_path / "Task01_Old"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        src / "imagesTr" / "case_000_0000.png")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        src / "labelsTr" / "case_000.png")
    old = {
        "tensorImageSize": "4D",
        "modality": {"0": "R", "1": "G", "2": "B"},
        "labels": {"0": "background", "1": "tumor"},
        "numTraining": 1, "numTest": 0,
        "training": [{"image": "x", "label": "y"}], "test": [],
    }
    with open(src / "dataset.json", "w") as f:
        json.dump(old, f)
    dst = str(tmp_path / "Dataset010_New")
    main(["convert_old_dataset", "-i", str(src), "-o", dst,
          "--file_ending", ".png"])
    dj = json.load(open(os.path.join(dst, "dataset.json")))
    assert dj["channel_names"] == {"0": "R", "1": "G", "2": "B"}
    assert dj["labels"] == {"background": 0, "tumor": 1}
    assert dj["file_ending"] == ".png"
    assert "training" not in dj and "modality" not in dj
    assert os.path.exists(os.path.join(dst, "imagesTr", "case_000_0000.png"))


@pytest.mark.slow
def test_cli_train_flag_parity(tmp_path):
    """The nnUNetv2_train flag family (reference run_training.py:212-271):
    --npz writes validation probabilities, --disable_checkpointing skips
    every save, --val_best validates checkpoint_best, -pretrained_weights
    transfers shape-matched tensors, -p selects a custom plans identifier."""
    import shutil

    raw, pp, res = _roots(tmp_path)
    dataset_id = 7
    ds_dir = os.path.join(raw, f"Dataset{dataset_id:03d}_Test")
    generate_integration_test_dataset(ds_dir, n_cases=4, size=32,
                                      num_classes=3)
    main(["plan_and_preprocess", "-d", str(dataset_id),
          "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{dataset_id:03d}_Test")
    base = ["--raw", raw, "--preprocessed", pp, "--results", res,
            "--epochs", "1", "--iters", "2"]

    # fold 0: normal train (checkpoints exist) + --npz validation output
    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "0", "--npz",
          *base])
    fold0 = os.path.join(res, f"Dataset{dataset_id:03d}_Test",
                         "nnUNetTrainer__ldPlans__2d", "fold_0")
    val_files = os.listdir(os.path.join(fold0, "validation"))
    assert any(f.endswith(".npz") for f in val_files)
    assert os.path.exists(os.path.join(fold0, "checkpoint_best.pkl"))

    # --val --val_best revalidates from checkpoint_best
    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "0",
          "--val", "--val_best", *base])

    # fold 1: --disable_checkpointing + -pretrained_weights from fold 0
    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "1",
          "--disable_checkpointing", "-pretrained_weights",
          os.path.join(fold0, "checkpoint_final.pkl"), *base])
    fold1 = os.path.join(res, f"Dataset{dataset_id:03d}_Test",
                         "nnUNetTrainer__ldPlans__2d", "fold_1")
    assert not [f for f in os.listdir(fold1) if f.startswith("checkpoint")]
    assert os.path.exists(os.path.join(fold1, "validation", "summary.json"))

    # -p custom: reads custom.json, names the results dir with it
    shutil.copy(os.path.join(pp_dir, "plans.json"),
                os.path.join(pp_dir, "customPlans.json"))
    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "0",
          "-p", "customPlans", *base])
    assert os.path.isdir(os.path.join(
        res, f"Dataset{dataset_id:03d}_Test",
        "nnUNetTrainer__customPlans__2d", "fold_0"))


@pytest.mark.slow
def test_cli_predict_flag_parity(tmp_path):
    """nnUNetv2_predict's -chk / -step_size / -num_parts / -part_id
    (reference predict_from_raw_data.py:637-767): exact-checkpoint
    selection, sliding-window overlap, and folder sharding that tiles the
    input exactly once across parts."""
    raw, pp, res = _roots(tmp_path)
    dataset_id = 8
    ds_dir = os.path.join(raw, f"Dataset{dataset_id:03d}_Test")
    generate_integration_test_dataset(ds_dir, n_cases=4, size=32,
                                      num_classes=3)
    main(["plan_and_preprocess", "-d", str(dataset_id),
          "--raw", raw, "--preprocessed", pp])
    main(["train", "-d", str(dataset_id), "-c", "2d", "-f", "0",
          "--epochs", "1", "--iters", "2",
          "--raw", raw, "--preprocessed", pp, "--results", res])
    src = os.path.join(ds_dir, "imagesTs")
    n_inputs = len([f for f in os.listdir(src) if f.endswith(".png")])
    assert n_inputs >= 2

    # -chk with a bogus name fails loudly; with final it works
    with pytest.raises(FileNotFoundError):
        main(["predict", "-i", src, "-o", str(tmp_path / "x"),
              "-d", str(dataset_id), "-f", "0", "-chk", "nope.pkl",
              "--disable_tta", "--raw", raw, "--results", res])
    out = str(tmp_path / "sharded")
    for part in range(2):
        main(["predict", "-i", src, "-o", out, "-d", str(dataset_id),
              "-f", "0", "-chk", "checkpoint_final.pkl",
              "-step_size", "0.75", "-num_parts", "2", "-part_id", str(part),
              "--disable_tta", "--raw", raw, "--results", res])
    preds = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(preds) == n_inputs  # both parts together cover every case


def test_cli_planner_selection_and_no_pp(tmp_path):
    """-pl routes to the ResEnc planner (reference -pl nnUNetPlannerResEnc*)
    and --no_pp plans without preprocessing (plan_and_preprocess_entrypoints
    --no_pp)."""
    raw, pp, res = _roots(tmp_path)
    dataset_id = 9
    ds_dir = os.path.join(raw, f"Dataset{dataset_id:03d}_Test")
    generate_integration_test_dataset(ds_dir, n_cases=3, size=32,
                                      num_classes=3)
    main(["plan_and_preprocess", "-d", str(dataset_id),
          "-pl", "nnUNetPlannerResEncM", "--no_pp",
          "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{dataset_id:03d}_Test")
    plans = json.load(open(os.path.join(pp_dir, "plans.json")))
    assert plans["block_type"] == "residual"
    assert not os.path.isdir(os.path.join(pp_dir, "ldPlans_2d"))  # --no_pp

    with pytest.raises(SystemExit):
        main(["plan_and_preprocess", "-d", str(dataset_id), "-pl", "bogus",
              "--raw", raw, "--preprocessed", pp])

    # full run with the default planner still preprocesses
    main(["plan_and_preprocess", "-d", str(dataset_id),
          "--raw", raw, "--preprocessed", pp])
    assert os.path.isdir(os.path.join(pp_dir, "ldPlans_2d"))
    assert json.load(open(os.path.join(pp_dir, "plans.json")))[
        "block_type"] == "plain"


def test_cli_evaluate_folder_djfile(tmp_path):
    """-djfile derives labels/regions + ignore label from dataset.json
    (nnUNetv2_evaluate_folder, reference evaluate_predictions.py:222-232)."""
    from PIL import Image

    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        g = rng.integers(0, 3, (16, 16)).astype(np.uint8)
        p = g.copy()
        p[:4] = 0  # some disagreement
        Image.fromarray(g).save(gt / f"c{i}.png")
        Image.fromarray(p).save(pred / f"c{i}.png")
    dj = tmp_path / "dataset.json"
    json.dump({"channel_names": {"0": "x"},
               "labels": {"background": 0, "a": 1, "b": 2},
               "numTraining": 2, "file_ending": ".png"}, open(dj, "w"))
    summary = main(["evaluate_folder", str(gt), str(pred),
                    "-djfile", str(dj), "-o", str(tmp_path / "s.json")])
    assert os.path.exists(tmp_path / "s.json")
    assert 0 < summary["foreground_mean"]["Dice"] < 1
    # neither -l nor -djfile → loud error
    with pytest.raises(SystemExit):
        main(["evaluate_folder", str(gt), str(pred)])
