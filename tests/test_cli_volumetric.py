"""Volumetric CLI (VERDICT r3 item 2): plan_and_preprocess plans ALL 3D
configurations for a non-PNG dataset; train/predict drive 3d_fullres,
3d_lowres and 3d_cascade_fullres through the console surface, cascade
consuming the lowres stage's predictions (reference
``run/run_training.py:212-271``, ``plan_and_preprocess_entrypoints.py:8-204``,
``predict_from_raw_data.py:637-767``).
"""
import json
import os

import numpy as np
import pytest

from ldiffusion_tpu.segmentor.cli import main

DSID = 310
BUDGET = str(16 << 20)  # 16 MiB planning budget → tiny patches + all configs


def _make_raw_3d(tmp_path, n=3):
    raw = tmp_path / "raw"
    ds = raw / f"Dataset{DSID}_Vol3D"
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        (ds / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        vol = (rng.random((24, 48, 48)) + 0.1).astype(np.float32)
        lab = np.zeros((24, 48, 48), np.uint8)
        lab[8:16, 16:32, 16:32] = 1
        vol[lab == 1] += 1.0  # learnable contrast
        np.save(ds / "imagesTr" / f"case{i}_0000.npy", vol)
        np.save(ds / "labelsTr" / f"case{i}.npy", lab)
    np.save(ds / "imagesTs" / "t0_0000.npy", vol)
    with open(ds / "dataset.json", "w") as f:
        json.dump({"channel_names": {"0": "CT"},
                   "labels": {"background": 0, "lesion": 1},
                   "numTraining": n, "file_ending": ".npy"}, f)
    for d in ("pp", "res"):
        (tmp_path / d).mkdir(exist_ok=True)
    return str(raw), str(tmp_path / "pp"), str(tmp_path / "res"), str(ds)


@pytest.mark.slow
def test_volumetric_cli_all_three_configs(tmp_path):
    raw, pp, res, ds_dir = _make_raw_3d(tmp_path)

    main(["plan_and_preprocess", "-d", str(DSID), "--hbm_budget", BUDGET,
          "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{DSID}_Vol3D")
    assert os.path.exists(os.path.join(pp_dir, "plans_3d.json"))
    with open(os.path.join(pp_dir, "plans_3d.json")) as f:
        plans = json.load(f)
    assert {"3d_fullres", "3d_lowres", "3d_cascade_fullres"} \
        <= set(plans["configurations"])
    for cfg in ("3d_fullres", "3d_lowres"):
        store = os.path.join(pp_dir, f"ldPlans_{cfg}")
        assert any(f.endswith(".npz") for f in os.listdir(store)), cfg
    # cascade shares the fullres store — no own preprocessed data
    assert not os.path.isdir(os.path.join(pp_dir, "ldPlans_3d_cascade_fullres"))

    common = ["--raw", raw, "--preprocessed", pp, "--results", res,
              "--epochs", "1", "--iters", "2"]
    # cascade before lowres must fail loudly
    with pytest.raises(SystemExit, match="3d_lowres"):
        main(["train", "-d", str(DSID), "-c", "3d_cascade_fullres", "-f", "0",
              *common])

    for cfg in ("3d_lowres", "3d_fullres", "3d_cascade_fullres"):
        main(["train", "-d", str(DSID), "-c", cfg, "-f", "0", *common])
        fold = os.path.join(res, f"Dataset{DSID}_Vol3D",
                            f"nnUNetTrainer__ldPlans__{cfg}", "fold_0")
        assert os.path.exists(os.path.join(fold, "checkpoint_final.pkl")), cfg
        with open(os.path.join(fold, "validation", "summary.json")) as f:
            summary = json.load(f)
        assert np.isfinite(summary["foreground_mean"]["Dice"]), cfg
        # 3D validation cases are .npy volumes
        assert any(f.endswith(".npy") for f in
                   os.listdir(os.path.join(fold, "validation"))), cfg

    # cascade training materialized the lowres stage's predictions
    prev = os.path.join(pp_dir, "predicted_next_stage", "3d_cascade_fullres")
    assert len([f for f in os.listdir(prev) if f.endswith(".npy")]) == 3

    for cfg in ("3d_fullres", "3d_lowres", "3d_cascade_fullres"):
        out = str(tmp_path / f"preds_{cfg}")
        main(["predict", "-i", os.path.join(ds_dir, "imagesTs"), "-o", out,
              "-d", str(DSID), "-c", cfg, "-f", "0", "--disable_tta",
              "--raw", raw, "--results", res])
        seg = np.load(os.path.join(out, "t0.npy"))
        assert seg.shape == (24, 48, 48), cfg
        assert set(np.unique(seg)) <= {0, 1}, cfg

    # -prev_stage_predictions: cascade consumes an explicit lowres folder
    # (reference predict_from_raw_data.py:676-727) instead of running the
    # lowres stage — feed it the lowres predictions from above
    out = str(tmp_path / "preds_cascade_prevdir")
    main(["predict", "-i", os.path.join(ds_dir, "imagesTs"), "-o", out,
          "-d", str(DSID), "-c", "3d_cascade_fullres", "-f", "0",
          "-prev_stage_predictions", str(tmp_path / "preds_3d_lowres"),
          "--disable_tta", "--raw", raw, "--results", res])
    seg = np.load(os.path.join(out, "t0.npy"))
    assert seg.shape == (24, 48, 48)
    # inline-lowres and explicit-folder cascade are bit-identical: the inline
    # route materializes the lowres seg on the raw grid exactly as `predict
    # -c 3d_lowres` writes it, so both routes feed the cascade the same
    # prev-stage channels (VERDICT r4 item 7)
    inline = np.load(os.path.join(str(tmp_path / "preds_3d_cascade_fullres"),
                                  "t0.npy"))
    np.testing.assert_array_equal(seg, inline)
    # missing case in the folder fails loudly
    with pytest.raises(SystemExit, match="prev_stage_predictions"):
        main(["predict", "-i", os.path.join(ds_dir, "imagesTs"),
              "-o", str(tmp_path / "x"), "-d", str(DSID),
              "-c", "3d_cascade_fullres", "-f", "0",
              "-prev_stage_predictions", str(tmp_path / "empty_prev"),
              "--disable_tta", "--raw", raw, "--results", res])


def test_volumetric_plan_no_pp_and_resenc(tmp_path):
    """--no_pp plans all 3D configurations without building stores; -pl
    resenc plans residual encoders for every 3D config."""
    raw, pp, res, ds_dir = _make_raw_3d(tmp_path)
    main(["plan_and_preprocess", "-d", str(DSID), "--hbm_budget", BUDGET,
          "-pl", "resenc", "--no_pp", "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{DSID}_Vol3D")
    with open(os.path.join(pp_dir, "plans_3d.json")) as f:
        plans = json.load(f)
    assert {"3d_fullres", "3d_lowres"} <= set(plans["configurations"])
    for cfg, c in plans["configurations"].items():
        assert c["block_type"] == "residual", cfg
    assert not os.path.isdir(os.path.join(pp_dir, "ldPlans_3d_fullres"))
