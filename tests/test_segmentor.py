"""Segmentor subsystem tests: fingerprint → plan → preprocess → patch
sampling → trainer step → sliding-window prediction, on tiny synthetic data."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
from ldiffusion_tpu.core.dist import make_mesh
from ldiffusion_tpu.data.patches import PatchSampler
from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint, verify_dataset_integrity
from ldiffusion_tpu.segmentor.planner import SegPlan, plan_experiment
from ldiffusion_tpu.segmentor.predictor import (
    SlidingWindowPredictor,
    compute_steps,
    gaussian_importance_map,
)
from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset, preprocess_case
from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer, poly_lr


def _synth_dataset(n=4, size=64, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for _ in range(n):
        img = rng.normal(size=(size, size, 3)).astype(np.float32) + 1.0
        lab = np.zeros((size, size), np.int32)
        lab[: size // 2, : size // 2] = 1
        lab[size // 2:, : size // 2] = 2
        lab[: size // 4, size // 2:] = 3
        images.append(img)
        labels.append(lab)
    return images, labels


def test_fingerprint_and_integrity():
    images, labels = _synth_dataset()
    problems = verify_dataset_integrity(images, labels, num_classes=4)
    assert problems == []
    fp = extract_fingerprint(images, labels)
    assert fp["num_cases"] == 4
    assert "0" in fp["foreground_intensity_properties_per_channel"]
    assert fp["shapes_after_crop"][0] == [64, 64]


def test_planner_produces_valid_plan():
    images, labels = _synth_dataset()
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4)
    assert plan.patch_size[0] >= 8 and plan.batch_size >= 2
    assert len(plan.features_per_stage) == len(plan.strides)
    # patch divisible by total pooling factor
    factor = int(np.prod(plan.strides))
    assert plan.patch_size[0] % factor == 0


def test_planner_large_images_shrink_to_budget():
    fp = {
        "shapes_after_crop": [[1024, 1024]] * 10,
        "num_channels": 3,
        "foreground_intensity_properties_per_channel": {},
    }
    plan = plan_experiment(fp, num_classes=7)
    assert plan.patch_size[0] <= 1024 and plan.batch_size >= 2
    # SD-standard depth: features capped at 512
    assert max(plan.features_per_stage) == 512


def test_plan_roundtrip(tmp_path):
    fp = {"shapes_after_crop": [[64, 64]], "num_channels": 3,
          "foreground_intensity_properties_per_channel": {}}
    plan = plan_experiment(fp, num_classes=4)
    plan.save(str(tmp_path / "plan.json"))
    loaded = SegPlan.load(str(tmp_path / "plan.json"))
    assert loaded == plan


def test_preprocess_crop_and_norm():
    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 4:28] = np.random.default_rng(0).normal(size=(16, 24, 3)) + 5
    seg = np.zeros((32, 32), np.int32)
    seg[10:20, 10:20] = 1
    pc = preprocess_case(img, seg, num_classes=2)
    assert pc.data.shape == (16, 24, 3)
    assert abs(pc.data.mean()) < 1e-4  # z-scored
    assert pc.properties["bbox"] == [[8, 24], [4, 28]]
    assert 1 in pc.properties["class_locations"]


def test_patch_sampler_oversampling():
    images, labels = _synth_dataset(n=2, size=32)
    ds = PreprocessedDataset.build(images, labels, num_classes=4)
    sampler = PatchSampler(ds, patch_size=(16, 16), batch_size=4, oversample_fg=0.5, seed=0)
    data, seg = next(iter(sampler))
    assert data.shape == (4, 16, 16, 3)
    assert seg.shape == (4, 16, 16)
    # forced-fg patches must contain fg
    for i in range(2, 4):
        assert (seg[i] > 0).any()


def test_patch_sampler_pads_small_cases():
    images, labels = _synth_dataset(n=1, size=16)
    ds = PreprocessedDataset.build(images, labels, num_classes=4)
    sampler = PatchSampler(ds, patch_size=(32, 32), batch_size=2, seed=0)
    data, seg = next(iter(sampler))
    assert data.shape == (2, 32, 32, 3)
    assert (seg == -1).any()  # padding marked with -1


def test_preprocessed_dataset_disk_roundtrip(tmp_path):
    images, labels = _synth_dataset(n=2, size=16)
    ds = PreprocessedDataset.build(images, labels, num_classes=4, directory=str(tmp_path))
    ds2 = PreprocessedDataset.load(str(tmp_path))
    assert ds2.keys() == ds.keys()
    np.testing.assert_allclose(ds2["case_000"].data, ds["case_000"].data)
    assert 1 in ds2["case_000"].properties["class_locations"]


def test_poly_lr():
    assert poly_lr(0.01, 0, 100) == 0.01
    assert poly_lr(0.01, 50, 100) == pytest.approx(0.01 * 0.5 ** 0.9)
    assert poly_lr(0.01, 99, 100) < 0.001


def test_compute_steps_and_gaussian():
    steps = compute_steps(64, 32)
    assert steps[0] == 0 and steps[-1] == 32
    assert compute_steps(32, 32) == [0]
    g = gaussian_importance_map((16, 16))
    assert g.max() == 1.0 and g.min() > 0
    assert g[8, 8] == g.max()


def test_trainer_epoch_and_resume(tmp_path):
    images, labels = _synth_dataset(n=3, size=32)
    train_ds = PreprocessedDataset.build(images, labels, num_classes=4)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4, max_batch=4)
    # shrink for test speed
    import dataclasses
    plan = dataclasses.replace(plan, patch_size=(16, 16), batch_size=4,
                               features_per_stage=(8, 16), strides=(1, 2))
    cfg = SegmentorTrainConfig(num_epochs=2, iters_per_epoch=2, val_iters_per_epoch=1,
                               compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, tensor=2))
    tr = SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path))
    tr.run_training(train_ds, train_ds, num_epochs=2)
    assert (tmp_path / "checkpoint_final.pkl").exists()
    assert (tmp_path / "checkpoint_best.pkl").exists()
    assert tr.epoch_log.get("ema_fg_dice") >= 0

    tr2 = SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path / "resume"))
    tr2.load_checkpoint(str(tmp_path / "checkpoint_final.pkl"))
    assert tr2.current_epoch == 2
    assert tr2.best_ema == tr.best_ema


def test_sliding_window_predictor(tmp_path):
    import dataclasses
    images, labels = _synth_dataset(n=2, size=48)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4)
    plan = dataclasses.replace(plan, patch_size=(32, 32), batch_size=2,
                               features_per_stage=(8, 16), strides=(1, 2))
    from ldiffusion_tpu.models.dynunet import DynUNet

    net = DynUNet(plan.network_config())
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    pred = SlidingWindowPredictor(plan, params, dtype=jnp.float32)
    out = pred.predict(images[0])
    assert out.shape == (48, 48)
    assert out.dtype == np.uint8
    assert out.max() < 4
    logits = pred.predict_logits(images[0])
    assert logits.shape == (48, 48, 4)
    assert np.isfinite(logits).all()


def test_predictor_fold_ensembling():
    import dataclasses
    images, labels = _synth_dataset(n=1, size=32)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4)
    plan = dataclasses.replace(plan, patch_size=(32, 32), batch_size=2,
                               features_per_stage=(8, 16), strides=(1, 2))
    from ldiffusion_tpu.models.dynunet import DynUNet

    net = DynUNet(plan.network_config())
    p1 = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    p2 = net.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))["params"]
    single = SlidingWindowPredictor(plan, p1, dtype=jnp.float32,
                                    use_mirroring=False).predict_logits(images[0])
    ens = SlidingWindowPredictor(plan, [p1, p2], dtype=jnp.float32,
                                 use_mirroring=False).predict_logits(images[0])
    assert not np.allclose(single, ens)


def test_device_seg_matches_host_conversion():
    """predict()'s on-device label conversion must reproduce the host
    logits→LabelManager path exactly (plain, regions, and no-manager
    regimes) — it exists only to shrink the device→host transfer."""
    import dataclasses

    from ldiffusion_tpu.segmentor.label_manager import LabelManager

    images, labels = _synth_dataset(n=1, size=48)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4)
    plan = dataclasses.replace(plan, patch_size=(32, 32), batch_size=2,
                               features_per_stage=(8, 16), strides=(1, 2))
    from ldiffusion_tpu.models.dynunet import DynUNet

    net = DynUNet(plan.network_config())
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    managers = [
        None,
        LabelManager({"background": 0, "a": 3, "b": 5, "c": 7}),  # plain, mapped values
        LabelManager({"background": 0, "whole": (1, 2), "core": (2,), "x": (3,)},
                     regions_class_order=(1, 2, 3)),  # regions painting
    ]
    for lm in managers:
        pred = SlidingWindowPredictor(plan, params, dtype=jnp.float32,
                                      label_manager=lm)
        seg_dev = pred.predict(images[0])
        logits = pred.predict_logits(images[0])
        if lm is None:
            seg_host = np.argmax(logits, axis=-1).astype(np.uint8)
        else:
            seg_host = lm.convert_logits_to_segmentation(logits)
        assert seg_dev.dtype == np.uint8
        np.testing.assert_array_equal(seg_dev, np.asarray(seg_host, np.uint8))


def test_traced_seg_matches_predict():
    """traced_seg (the jit-composable core the fused api path embeds) must
    equal the standalone predict() dispatch — including the padding branch
    (image smaller than patch)."""
    import dataclasses

    images, labels = _synth_dataset(n=1, size=48)
    fp = extract_fingerprint(images, labels)
    plan = plan_experiment(fp, num_classes=4)
    plan = dataclasses.replace(plan, patch_size=(32, 32), batch_size=2,
                               features_per_stage=(8, 16), strides=(1, 2))
    from ldiffusion_tpu.models.dynunet import DynUNet

    net = DynUNet(plan.network_config())
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    pred = SlidingWindowPredictor(plan, params, dtype=jnp.float32)
    for img in (images[0], images[0][:24, :20]):  # tiled + padded cases
        fused = jax.jit(lambda pl, im: pred.traced_seg(pl, im))(
            tuple(pred.params_list), jnp.asarray(img))
        np.testing.assert_array_equal(np.asarray(fused), pred.predict(img))
