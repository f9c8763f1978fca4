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
