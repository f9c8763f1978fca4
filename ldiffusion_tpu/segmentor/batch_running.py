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
