"""Multi-host final validation (reference nnUNetTrainer.py:1226-1243):
every rank writes its interleaved cases, a barrier fences the shared
folder, and ONLY rank 0 computes metrics/postprocessing — over ALL ranks'
cases. Faked process count/index on a single host.
"""
import dataclasses
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
from ldiffusion_tpu.core.dist import make_mesh
from ldiffusion_tpu.segmentor import trainer as trainer_mod
from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint
from ldiffusion_tpu.segmentor.planner import plan_experiment
from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer


def _mk_trainer(tmp_path):
    rng = np.random.default_rng(0)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) + 1
              for _ in range(4)]
    labels = [(rng.random((16, 16)) > 0.5).astype(np.int32) for _ in range(4)]
    plan = plan_experiment(extract_fingerprint(images, labels), num_classes=2)
    plan = dataclasses.replace(plan, patch_size=(16, 16), batch_size=2,
                               features_per_stage=(4, 8), strides=(1, 2))
    cfg = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1,
                               val_iters_per_epoch=1, compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    tr = SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path))
    return tr, images, labels


def test_nonzero_rank_skips_metrics_and_barriers(tmp_path, monkeypatch):
    tr, images, labels = _mk_trainer(tmp_path)
    barriers = []
    monkeypatch.setattr(trainer_mod, "_validation_barrier", barriers.append)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    called = []
    import ldiffusion_tpu.evaluate as eval_mod
    real_metrics = eval_mod.compute_metrics_on_folder
    monkeypatch.setattr(eval_mod, "compute_metrics_on_folder",
                        lambda *a, **k: called.append("metrics") or
                        real_metrics(*a, **k))

    # simulate rank 0's summary already on the shared FS
    out_dir = tmp_path / "validation"
    out_dir.mkdir()
    sentinel = {"foreground_mean": {"Dice": 0.5}, "sentinel": True}
    (out_dir / "summary.json").write_text(json.dumps(sentinel))

    summary = tr.perform_actual_validation(images, labels)
    assert summary["sentinel"] is True          # read, not recomputed
    assert called == []                          # rank 1 never scores
    assert barriers == ["final_validation_cases_written",
                        "final_validation_summary_written"]
    # rank 1 wrote exactly its interleave (cases 1 and 3)
    names = sorted(p.name for p in out_dir.glob("case_*.png"))
    assert names == ["case_001.png", "case_003.png"]


def test_rank0_scores_all_ranks_cases(tmp_path, monkeypatch):
    tr, images, labels = _mk_trainer(tmp_path)
    monkeypatch.setattr(trainer_mod, "_validation_barrier", lambda name: None)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # pass 1: rank 1 writes its cases (needs rank 0's summary pre-seeded to
    # return — overwritten by the real one in pass 2)
    out_dir = tmp_path / "validation"
    out_dir.mkdir()
    (out_dir / "summary.json").write_text(
        json.dumps({"foreground_mean": {"Dice": 0.0}}))
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    tr.perform_actual_validation(images, labels, determine_pp=False)

    # pass 2: rank 0 writes cases 0/2 and scores the WHOLE folder
    pp_sizes = []
    import ldiffusion_tpu.segmentor.postprocess as pp_mod
    real_pp = pp_mod.determine_postprocessing
    monkeypatch.setattr(pp_mod, "determine_postprocessing",
                        lambda preds, gts, n, **k:
                        pp_sizes.append(len(preds)) or real_pp(preds, gts, n, **k))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    summary = tr.perform_actual_validation(images, labels)
    assert len(summary["metric_per_case"]) == 4   # merged: both ranks' cases
    assert pp_sizes == [4]                        # pp determined on all cases
    assert (tmp_path / "postprocessing.json").exists()
