"""Planner override flags (VERDICT r4 item 5): -overwrite_target_spacing /
-preprocessor_name / -overwrite_plans_name on plan_and_preprocess (reference
``experiment_planning/plan_and_preprocess_entrypoints.py:43-69``)."""
import json
import os

import numpy as np
import pytest

from ldiffusion_tpu.core.registry import register
from ldiffusion_tpu.data.converters import generate_integration_test_dataset
from ldiffusion_tpu.segmentor.cli import main
from ldiffusion_tpu.segmentor.preprocess import (
    DefaultPreprocessor,
    get_preprocessor,
)

DSID = 311


def _make_raw_3d(tmp_path, n=3):
    raw = tmp_path / "raw"
    ds = raw / f"Dataset{DSID}_Vol3D"
    for sub in ("imagesTr", "labelsTr"):
        (ds / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        vol = (rng.random((24, 48, 48)) + 0.1).astype(np.float32)
        lab = np.zeros((24, 48, 48), np.uint8)
        lab[8:16, 16:32, 16:32] = 1
        np.save(ds / "imagesTr" / f"case{i}_0000.npy", vol)
        np.save(ds / "labelsTr" / f"case{i}.npy", lab)
    with open(ds / "dataset.json", "w") as f:
        json.dump({"channel_names": {"0": "CT"},
                   "labels": {"background": 0, "lesion": 1},
                   "numTraining": n, "file_ending": ".npy"}, f)
    (tmp_path / "pp").mkdir(exist_ok=True)
    return str(raw), str(tmp_path / "pp")


def test_overwrite_target_spacing_lands_in_plans(tmp_path):
    raw, pp = _make_raw_3d(tmp_path)
    main(["plan_and_preprocess", "-d", str(DSID), "--no_pp",
          "-overwrite_target_spacing", "2.0", "1.5", "1.5",
          "-overwrite_plans_name", "myPlans",
          "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{DSID}_Vol3D")
    # custom plans identifier → custom filename; canonical one absent
    plans_path = os.path.join(pp_dir, "myPlans_3d.json")
    assert os.path.exists(plans_path)
    assert not os.path.exists(os.path.join(pp_dir, "plans_3d.json"))
    with open(plans_path) as f:
        plans = json.load(f)
    fullres = plans["configurations"]["3d_fullres"]
    assert fullres["spacing"] == [2.0, 1.5, 1.5]
    # the cascade (if planned) shares the fullres spacing (reference:
    # override applies to 3d_fullres AND 3d_cascade_fullres)
    if "3d_cascade_fullres" in plans["configurations"]:
        assert plans["configurations"]["3d_cascade_fullres"]["spacing"] \
            == [2.0, 1.5, 1.5]


def test_overwrite_target_spacing_rejected_for_2d(tmp_path):
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    for d in (raw, pp):
        d.mkdir(exist_ok=True)
    ds_dir = os.path.join(str(raw), "Dataset312_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=3, regime="plain")
    with pytest.raises(SystemExit, match="3D"):
        main(["plan_and_preprocess", "-d", "312",
              "-overwrite_target_spacing", "1", "1", "1",
              "--raw", str(raw), "--preprocessed", str(pp)])


def test_bad_spacing_arity_rejected(tmp_path):
    raw, pp = _make_raw_3d(tmp_path)
    with pytest.raises(SystemExit, match="three numbers"):
        main(["plan_and_preprocess", "-d", str(DSID),
              "-overwrite_target_spacing", "1", "1",
              "--raw", raw, "--preprocessed", pp])


def test_unknown_preprocessor_raises(tmp_path):
    raw, pp = _make_raw_3d(tmp_path)
    with pytest.raises(SystemExit, match="NoSuchPreprocessor"):
        main(["plan_and_preprocess", "-d", str(DSID),
              "-preprocessor_name", "NoSuchPreprocessor",
              "--raw", raw, "--preprocessed", pp])


@register("preprocessor")
class _CountingPreprocessor(DefaultPreprocessor):
    """Registered plugin; counts run_case calls to prove it is used."""
    calls_2d = 0
    calls_3d = 0

    def run_case(self, *a, **k):
        _CountingPreprocessor.calls_2d += 1
        return super().run_case(*a, **k)

    def run_case_3d(self, *a, **k):
        _CountingPreprocessor.calls_3d += 1
        return super().run_case_3d(*a, **k)


def test_custom_preprocessor_is_used_3d(tmp_path):
    raw, pp = _make_raw_3d(tmp_path, n=2)
    _CountingPreprocessor.calls_3d = 0
    main(["plan_and_preprocess", "-d", str(DSID),
          "-preprocessor_name", "_CountingPreprocessor",
          "--raw", raw, "--preprocessed", pp])
    assert _CountingPreprocessor.calls_3d >= 2


def test_custom_preprocessor_is_used_2d(tmp_path):
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    for d in (raw, pp):
        d.mkdir(exist_ok=True)
    ds_dir = os.path.join(str(raw), "Dataset313_Test")
    generate_integration_test_dataset(ds_dir, n_cases=3, size=32,
                                      num_classes=3, regime="plain")  # 2 Tr
    _CountingPreprocessor.calls_2d = 0
    main(["plan_and_preprocess", "-d", "313",
          "-preprocessor_name", "_CountingPreprocessor",
          "--raw", str(raw), "--preprocessed", str(pp)])
    assert _CountingPreprocessor.calls_2d == 2


def test_get_preprocessor_default():
    assert isinstance(get_preprocessor(None), DefaultPreprocessor)
    assert isinstance(get_preprocessor("DefaultPreprocessor"),
                      DefaultPreprocessor)


def test_c_flag_filters_preprocessing_3d(tmp_path, capsys):
    """Reference -c (plan_and_preprocess_entrypoints.py:80-84): only the
    requested configurations are preprocessed; requested names that do not
    exist for the dataset are skipped with a message; planning is whole
    either way."""
    raw, pp = _make_raw_3d(tmp_path, n=2)
    main(["plan_and_preprocess", "-d", str(DSID), "-c", "3d_lowres",
          "--raw", raw, "--preprocessed", pp])
    out = capsys.readouterr().out
    pp_dir = os.path.join(pp, f"Dataset{DSID}_Vol3D")
    # plans file still contains every planned configuration
    assert os.path.exists(os.path.join(pp_dir, "plans_3d.json"))
    # the small volume plans 3d_fullres only, so nothing was preprocessed:
    # no per-config store, and the unavailable request was called out
    assert not os.path.exists(os.path.join(pp_dir, "ldPlans_3d_fullres"))
    assert "3d_lowres not found" in out


def test_c_flag_default_preprocesses_3d_fullres(tmp_path):
    raw, pp = _make_raw_3d(tmp_path, n=2)
    main(["plan_and_preprocess", "-d", str(DSID),
          "--raw", raw, "--preprocessed", pp])
    pp_dir = os.path.join(pp, f"Dataset{DSID}_Vol3D")
    assert os.path.exists(os.path.join(pp_dir, "ldPlans_3d_fullres"))


def test_c_flag_2d_dataset_skip(tmp_path, capsys):
    """-c without '2d' on a 2d dataset: plans written, preprocessing
    skipped (reference: configurations that do not exist are skipped)."""
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    for d in (raw, pp):
        d.mkdir(exist_ok=True)
    ds_dir = os.path.join(str(raw), "Dataset314_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=3, regime="plain")
    main(["plan_and_preprocess", "-d", "314", "-c", "3d_fullres",
          "--raw", str(raw), "--preprocessed", str(pp)])
    out_dir = os.path.join(str(pp), "Dataset314_Test")
    assert os.path.exists(os.path.join(out_dir, "plans.json"))
    assert not os.path.exists(os.path.join(out_dir, "ldPlans_2d"))
    assert "preprocessing skipped" in capsys.readouterr().out


def test_clean_recontrols_fingerprint_cache(tmp_path, capsys):
    """Reference --clean discipline (plan_and_preprocess_api.py:22-33):
    an existing dataset_fingerprint.json is REUSED on re-runs unless
    --clean re-extracts it. Proven by planting a sentinel key in the
    cached file: it survives a plain re-run and dies under --clean."""
    raw, pp = _make_raw_3d(tmp_path, n=2)
    args = ["plan_and_preprocess", "-d", str(DSID), "--no_pp",
            "--raw", raw, "--preprocessed", pp]
    main(args)
    fp_path = os.path.join(pp, f"Dataset{DSID}_Vol3D",
                           "dataset_fingerprint.json")
    assert os.path.exists(fp_path)
    with open(fp_path) as f:
        fp = json.load(f)
    fp["_sentinel"] = True
    with open(fp_path, "w") as f:
        json.dump(fp, f)
    capsys.readouterr()
    main(args)
    assert "reusing" in capsys.readouterr().out
    with open(fp_path) as f:
        assert json.load(f).get("_sentinel") is True  # cache untouched
    main(args + ["--clean"])
    with open(fp_path) as f:
        assert "_sentinel" not in json.load(f)  # re-extracted


def test_clean_fingerprint_cache_2d(tmp_path, capsys):
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    for d in (raw, pp):
        d.mkdir(exist_ok=True)
    ds_dir = os.path.join(str(raw), "Dataset315_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=3, regime="plain")
    args = ["plan_and_preprocess", "-d", "315", "--no_pp",
            "--raw", str(raw), "--preprocessed", str(pp)]
    main(args)
    fp_path = os.path.join(str(pp), "Dataset315_Test",
                           "dataset_fingerprint.json")
    assert os.path.exists(fp_path)
    capsys.readouterr()
    main(args)
    assert "reusing" in capsys.readouterr().out
    main(args + ["--clean"])
    assert "reusing" not in capsys.readouterr().out


def test_split_extract_fingerprint_respects_cache(tmp_path, capsys):
    """The split-phase extract_fingerprint subcommand (nnUNetv2_extract_fingerprint
    analog) reuses an existing fingerprint unless --clean."""
    raw = tmp_path / "raw"
    pp = tmp_path / "pp"
    for d in (raw, pp):
        d.mkdir(exist_ok=True)
    ds_dir = os.path.join(str(raw), "Dataset316_Test")
    generate_integration_test_dataset(ds_dir, n_cases=2, size=32,
                                      num_classes=3, regime="plain")
    args = ["extract_fingerprint", "-d", "316",
            "--raw", str(raw), "--preprocessed", str(pp)]
    main(args)
    capsys.readouterr()
    main(args)
    assert "reusing" in capsys.readouterr().out
    main(args + ["--clean"])
    assert "reusing" not in capsys.readouterr().out
