"""Batch-run command generation for TPU fleets.

Behavioral contract: nnUNet's ``batch_running/**`` (reference: LSF cluster
command generators, result collectors, benchmark summarizers, ~600 LoC).
The TPU-native analog generates gcloud/queued-resources style launch
commands for sweeping datasets × variants × folds over TPU slices, collects
per-run ``summary.json`` results, and summarizes benchmark jsons.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence


def generate_training_commands(
    dataset_ids: Sequence[str],
    variants: Sequence[str] = ("default",),
    folds: Sequence[int] = (0,),
    tpu_type: str = "v5litepod-8",
    zone: str = "us-central1-a",
    project: str = "my-project",
    image_dir: str = "data/images",
    label_dir: str = "data/labels",
    launcher: str = "gcloud",
) -> List[str]:
    """One command per (dataset, variant, fold) — the analog of the LSF
    ``bsub`` generators (``batch_running/generate_lsf_runs_customDecathlon.py``)."""
    cmds = []
    for ds in dataset_ids:
        for variant in variants:
            for fold in folds:
                train_cmd = (
                    f"python -m ldiffusion_tpu.ldiffusion --diffusion-path $SD_PATH "
                    f"--image-dir {image_dir} --label-dir {label_dir} "
                    f"--num-epochs 100 --batch-size 8 --num-inference-steps 25 "
                    f"--num-classes 7 --component all"
                )
                if launcher == "gcloud":
                    cmds.append(
                        f"gcloud compute tpus tpu-vm ssh {ds}-{variant}-f{fold} "
                        f"--zone {zone} --project {project} --worker=all "
                        f"--command '{train_cmd}'"
                    )
                else:
                    cmds.append(train_cmd + f"  # {ds} {variant} fold{fold}")
    return cmds


def run_local(commands: Sequence[str], log_dir: str,
              stop_on_error: bool = False, env: Optional[Dict[str, str]] = None
              ) -> List[Dict]:
    """Execute generated commands sequentially on THIS host, one log file
    per run (the batch analog of actually submitting the LSF array —
    reference ``generate_lsf_runs_customDecathlon.py`` only prints bsub
    strings; here the local path really launches). Returns one record per
    command: {cmd, returncode, log, seconds}."""
    import subprocess
    import time as _time

    os.makedirs(log_dir, exist_ok=True)
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    records = []
    for i, cmd in enumerate(commands):
        log_path = os.path.join(log_dir, f"run_{i:03d}.log")
        t0 = _time.perf_counter()
        with open(log_path, "w") as log:
            log.write(f"$ {cmd}\n")
            log.flush()
            rc = subprocess.call(cmd, shell=True, stdout=log,
                                 stderr=subprocess.STDOUT, env=full_env)
        records.append({"cmd": cmd, "returncode": rc, "log": log_path,
                        "seconds": round(_time.perf_counter() - t0, 3)})
        if rc != 0 and stop_on_error:
            break
    with open(os.path.join(log_dir, "runs.json"), "w") as f:
        json.dump(records, f, indent=2)
    return records


def get_output_folder(results_root: str, dataset: str, trainer: str,
                      plans: str, config: str, fold: Optional[int] = None) -> str:
    """Results layout ``Dataset/trainer__plans__config[/fold_N]`` (reference
    ``utilities/file_path_utilities.py:get_output_folder``)."""
    d = os.path.join(results_root, dataset, f"{trainer}__{plans}__{config}")
    return os.path.join(d, f"fold_{fold}") if fold is not None else d


def _fold_dice(results_root, dataset, trainer, plans, config, fold) -> Optional[float]:
    summary = os.path.join(
        get_output_folder(results_root, dataset, trainer, plans, config, fold),
        "validation", "summary.json")
    if not os.path.exists(summary):
        return None
    with open(summary) as f:
        return json.load(f).get("foreground_mean", {}).get("Dice")


def collect_crossval_results(
    results_root: str,
    trainers: Dict[str, Sequence[str]],
    datasets: Sequence[str],
    output_file: str,
    configurations: Sequence[str] = ("2d", "3d_fullres", "3d_lowres",
                                     "3d_cascade_fullres"),
    folds: Sequence[int] = (0, 1, 2, 3, 4),
) -> List[List]:
    """Reference ``collect_results_custom_Decathlon.py:collect_results``:
    one CSV row per existing (dataset, config, trainer, plans) results dir —
    ``dataset,config,trainer,plans,<per-fold fg-mean Dice>,nanmean`` with
    blank cells for missing folds. ``trainers`` maps trainer name → plans
    identifiers, as in the reference."""
    import numpy as np

    rows = []
    with open(output_file, "w") as f:
        for ds in datasets:
            for config in configurations:
                for trainer, plans_list in trainers.items():
                    for plans in plans_list:
                        if not os.path.isdir(get_output_folder(
                                results_root, ds, trainer, plans, config)):
                            continue
                        dices = [_fold_dice(results_root, ds, trainer, plans,
                                            config, fl) for fl in folds]
                        cells = ["" if d is None else f"{d:02.4f}" for d in dices]
                        vals = [np.nan if d is None else d for d in dices]
                        mean = float(np.nanmean(vals)) if not all(
                            d is None for d in dices) else float("nan")
                        f.write(",".join([ds, config, trainer, plans] + cells
                                         + [f"{mean:02.4f}"]) + "\n")
                        rows.append([ds, config, trainer, plans] + dices + [mean])
    return rows


def summarize_crossval(input_file: str, output_file: str,
                       folds: Sequence[int], configs: Sequence[str],
                       datasets: Sequence[str],
                       trainers: Dict[str, Sequence[str]]) -> None:
    """Reference ``collect_results_custom_Decathlon.py:summarize``: pivot the
    collected CSV into one row per trainer__plans, one ``dataset_config``
    column (mean over the requested folds), plus the row mean."""
    import numpy as np

    txt = [line.rstrip("\n").split(",") for line in open(input_file)
           if line.strip()]
    num_folds = len(txt[0]) - 5 if txt else 0
    assert not txt or max(folds) < num_folds, "fold index beyond collected data"
    valid = {d: sorted({r[1] for r in txt if r[0] == d and r[1] in configs})
             for d in datasets}
    with open(output_file, "w") as f:
        f.write("name")
        for d in datasets:
            for c in valid[d]:
                f.write(f",{d}_{c[:4]}")
        f.write(",mean\n")
        for trainer, plans_list in trainers.items():
            for plans in plans_list:
                f.write(f"{trainer}__{plans}")
                row_means = []
                for d in datasets:
                    for c in valid[d]:
                        match = [r for r in txt if r[0] == d and r[1] == c
                                 and r[2] == trainer and r[3] == plans]
                        if not match:
                            f.write(",nan")
                            row_means.append(np.nan)
                            continue
                        cells = [match[0][4 + fl] for fl in folds]
                        vals = [float(x) for x in cells if x != ""]
                        m = float(np.mean(vals)) if vals else float("nan")
                        f.write(f",{m:02.4f}")
                        row_means.append(m)
                f.write(f",{np.nanmean(row_means):02.4f}\n")


def collect_results(result_dirs: Sequence[str]) -> Dict[str, Optional[float]]:
    """Gather foreground-mean dice from each run's validation summary.json
    (analog of ``batch_running/collect_results_custom_Decathlon.py``)."""
    out: Dict[str, Optional[float]] = {}
    for d in result_dirs:
        summary = os.path.join(d, "validation", "summary.json")
        if os.path.exists(summary):
            s = json.load(open(summary))
            out[d] = s.get("foreground_mean", {}).get("Dice")
        else:
            out[d] = None
    return out


def summarize_benchmarks(bench_jsons: Sequence[str], output: Optional[str] = None) -> Dict:
    """Merge bench.py JSON lines into one table (analog of
    ``batch_running/benchmarking/summarize_benchmark_results.py``)."""
    rows = []
    for p in bench_jsons:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rows.append(json.loads(line))
    summary = {
        "n_runs": len(rows),
        "runs": rows,
        "best": max((r.get("value", 0) for r in rows), default=None),
    }
    if output:
        with open(output, "w") as f:
            json.dump(summary, f, indent=2)
    return summary
