"""batch_running: command generation, REAL local execution, and the
nnUNet-style cross-validation result collection/summarize pair (reference
``batch_running/collect_results_custom_Decathlon.py``,
``generate_lsf_runs_customDecathlon.py``)."""
import json
import os

import numpy as np

from ldiffusion_tpu.segmentor.batch_running import (
    collect_crossval_results,
    collect_results,
    generate_training_commands,
    get_output_folder,
    run_local,
    summarize_benchmarks,
    summarize_crossval,
)


def test_generate_training_commands_matrix():
    cmds = generate_training_commands(["Dataset101", "Dataset102"],
                                      variants=("default", "DA5"),
                                      folds=(0, 1), launcher="local")
    assert len(cmds) == 2 * 2 * 2
    assert all("ldiffusion_tpu.ldiffusion" in c for c in cmds)


def test_run_local_executes_and_logs(tmp_path):
    log_dir = str(tmp_path / "logs")
    recs = run_local(["echo hello-from-run", "exit 3", "echo after-failure"],
                     log_dir)
    assert [r["returncode"] for r in recs] == [0, 3, 0]
    assert "hello-from-run" in open(recs[0]["log"]).read()
    # the manifest persists
    manifest = json.load(open(os.path.join(log_dir, "runs.json")))
    assert len(manifest) == 3

    recs = run_local(["exit 1", "echo never"], str(tmp_path / "logs2"),
                     stop_on_error=True)
    assert len(recs) == 1 and recs[0]["returncode"] == 1


def _write_summary(root, ds, trainer, plans, config, fold, dice):
    d = os.path.join(get_output_folder(root, ds, trainer, plans, config, fold),
                     "validation")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump({"foreground_mean": {"Dice": dice}}, f)


def test_collect_and_summarize_crossval(tmp_path):
    root = str(tmp_path / "results")
    trainers = {"SegmentorTrainer": ["ldPlans"], "SegmentorTrainerDA5": ["ldPlans"]}
    # SegmentorTrainer has folds 0,1 on Dataset101 2d; fold 2 missing
    _write_summary(root, "Dataset101", "SegmentorTrainer", "ldPlans", "2d", 0, 0.80)
    _write_summary(root, "Dataset101", "SegmentorTrainer", "ldPlans", "2d", 1, 0.90)
    # DA5 trained only on Dataset102 3d_fullres fold 0
    _write_summary(root, "Dataset102", "SegmentorTrainerDA5", "ldPlans",
                   "3d_fullres", 0, 0.70)

    csv = str(tmp_path / "collected.csv")
    rows = collect_crossval_results(root, trainers,
                                    ["Dataset101", "Dataset102"], csv,
                                    folds=(0, 1, 2))
    assert len(rows) == 2
    lines = open(csv).read().splitlines()
    # reference CSV shape: ds,config,trainer,plans,<fold cells>,mean
    r101 = [ln for ln in lines if ln.startswith("Dataset101,2d,SegmentorTrainer")][0]
    cells = r101.split(",")
    assert cells[4:7] == ["0.8000", "0.9000", ""]  # missing fold = blank cell
    assert abs(float(cells[7]) - 0.85) < 1e-6      # nanmean ignores the blank

    out = str(tmp_path / "summary.csv")
    summarize_crossval(csv, out, folds=(0, 1), configs=("2d", "3d_fullres"),
                       datasets=["Dataset101", "Dataset102"], trainers=trainers)
    slines = open(out).read().splitlines()
    assert slines[0] == "name,Dataset101_2d,Dataset102_3d_f,mean"
    by_name = {ln.split(",")[0]: ln.split(",")[1:] for ln in slines[1:]}
    assert by_name["SegmentorTrainer__ldPlans"][0] == "0.8500"
    assert by_name["SegmentorTrainer__ldPlans"][1] == "nan"
    assert by_name["SegmentorTrainerDA5__ldPlans"][1] == "0.7000"


def test_collect_results_and_summarize_benchmarks(tmp_path):
    d = tmp_path / "run" / "validation"
    d.mkdir(parents=True)
    (d / "summary.json").write_text(json.dumps(
        {"foreground_mean": {"Dice": 0.5}}))
    got = collect_results([str(tmp_path / "run"), str(tmp_path / "missing")])
    assert got[str(tmp_path / "run")] == 0.5
    assert got[str(tmp_path / "missing")] is None

    b = tmp_path / "bench.json"
    b.write_text('{"metric": "m", "value": 15.5}\n')
    s = summarize_benchmarks([str(b)], output=str(tmp_path / "s.json"))
    assert s["best"] == 15.5 and s["n_runs"] == 1
