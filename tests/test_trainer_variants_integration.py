"""Variant-driven trainer + final validation integration test."""
import dataclasses
import os

import numpy as np
import pytest

from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
from ldiffusion_tpu.core.dist import make_mesh
from ldiffusion_tpu.losses.dice import dc_and_bce_loss, soft_dice_loss_sigmoid
from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint
from ldiffusion_tpu.segmentor.planner import plan_experiment
from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer
from ldiffusion_tpu.segmentor.variants import get_variant


def _synth(n=3, size=32):
    rng = np.random.default_rng(0)
    images, labels = [], []
    for _ in range(n):
        images.append(rng.normal(size=(size, size, 3)).astype(np.float32) + 1)
        lab = np.zeros((size, size), np.int32)
        lab[: size // 2] = 1
        labels.append(lab)
    return images, labels


def test_variant_trainer_runs(tmp_path):
    images, labels = _synth()
    ds = PreprocessedDataset.build(images, labels, num_classes=3)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=3)
    plan = dataclasses.replace(plan, patch_size=(16, 16), batch_size=8,
                               features_per_stage=(8, 16), strides=(1, 2))
    base = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2, val_iters_per_epoch=1,
                                compute_dtype="float32")
    variant = get_variant("nnUNetTrainerDiceLoss", base=base)  # base: 1 epoch
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, tensor=1))
    tr = SegmentorTrainer(plan, variant.config, mesh, output_dir=str(tmp_path),
                          variant=variant)
    tr.run_training(ds, ds, num_epochs=1)
    assert (tmp_path / "checkpoint_final.pkl").exists()

    # final validation with summary.json + postprocessing determination
    summary = tr.perform_actual_validation(images, labels)
    assert os.path.exists(tmp_path / "validation" / "summary.json")
    assert "foreground_mean" in summary


def test_adam_variant_builds(tmp_path):
    images, labels = _synth(n=2, size=16)
    ds = PreprocessedDataset.build(images, labels, num_classes=3)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=3)
    plan = dataclasses.replace(plan, patch_size=(16, 16), batch_size=8,
                               features_per_stage=(8, 16), strides=(1, 2))
    base = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1, val_iters_per_epoch=1,
                                compute_dtype="float32")
    variant = get_variant("nnUNetTrainerAdam", base=base)  # base: 1 epoch
    mesh = make_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    tr = SegmentorTrainer(plan, variant.config, mesh, output_dir=str(tmp_path),
                          variant=variant)
    tr.run_training(ds, ds, num_epochs=1)


def test_region_losses():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    regions = jnp.asarray((rng.random((1, 8, 8, 2)) > 0.5).astype(np.float32))
    l1 = float(dc_and_bce_loss(logits, regions))
    assert np.isfinite(l1)
    # perfect prediction → low dice loss
    perfect = jnp.where(regions > 0, 20.0, -20.0)
    assert float(soft_dice_loss_sigmoid(perfect, regions)) < 0.01
