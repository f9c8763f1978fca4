"""The full reference trainer-variant matrix (reference
``training/nnUNetTrainer/variants/**``): every variant class name resolves to
a distinct, correct recipe; unknown names raise (the reference crashes on
unknown trainer names, ``run/run_training.py:32-68``).
"""
import dataclasses

import numpy as np
import pytest

from ldiffusion_tpu.core.config import SegmentorTrainConfig
from ldiffusion_tpu.segmentor.variants import (
    KNOWN_VARIANT_NAMES,
    get_variant,
)


def test_unknown_variant_raises():
    with pytest.raises(ValueError, match="unknown trainer variant"):
        get_variant("nnUNetTrainerDoesNotExist")
    with pytest.raises(ValueError):
        get_variant("nnUNetTrainerDiceLoss_1epochs")  # invented compound


def test_every_known_name_resolves():
    for name in KNOWN_VARIANT_NAMES:
        v = get_variant(name)
        assert v.name == name
        assert v.loss in ("dc_and_ce", "dice", "ce", "topk10",
                          "dc_and_topk10", "dc_and_focal")


def test_training_length_family():
    for n in (1, 5, 10, 20, 50, 100, 250, 2000, 4000, 8000):
        suffix = "epoch" if n == 1 else "epochs"
        v = get_variant(f"nnUNetTrainer_{n}{suffix}")
        assert v.config.num_epochs == n
    v = get_variant("nnUNetTrainer_250epochs_NoMirroring")
    assert v.config.num_epochs == 250
    assert v.augment.p_mirror == 0 and not v.mirror_tta


def test_da_family():
    assert get_variant("nnUNetTrainerNoDA").augment.p_rotation == 0
    assert get_variant("nnUNetTrainerNoDA").augment.p_mirror == 0
    # reference nnUNetTrainerNoDA.py:37-38: inference mirroring disabled too
    assert not get_variant("nnUNetTrainerNoDA").mirror_tta
    v5 = get_variant("nnUNetTrainerDA5")
    # full reference recipe (nnUNetTrainerDA5.py:120-264): p_rot 0.4 /
    # p_scale 0.2, contrast OneOf p 0.2, DA5-only transforms engaged
    assert v5.augment.p_rotation == 0.4 and v5.augment.p_scaling == 0.2
    assert v5.augment.p_contrast == 0.2 and v5.augment.contrast_clip_half
    assert v5.augment.p_blank_rect == 0.4 and v5.augment.p_sharpen == 0.2
    assert get_variant("nnUNetTrainerDA5_10epochs").config.num_epochs == 10
    assert get_variant("nnUNetTrainerDAOrd0").spatial_order0_data
    assert get_variant("nnUNetTrainerDA5ord0").spatial_order0_data
    # seg-order-only variants: distinct names, data order unchanged
    assert not get_variant("nnUNetTrainer_DASegOrd0").spatial_order0_data
    assert not get_variant("nnUNetTrainerDA5Segord0").spatial_order0_data
    om = get_variant("nnUNetTrainer_onlyMirror01")
    assert om.augment.mirror_axes == (0, 1)   # 3D: axes 0, 1
    assert om.mirror_axes_2d == (0,)          # 2D: axis 0 ONLY (reference)


def test_loss_family():
    assert get_variant("nnUNetTrainerCELoss").loss == "ce"
    assert get_variant("nnUNetTrainerCELoss_5epochs").config.num_epochs == 5
    assert get_variant("nnUNetTrainerDiceLoss").loss == "dice"
    v = get_variant("nnUNetTrainerDiceCELoss_noSmooth")
    assert v.loss == "dc_and_ce" and v.dice_smooth == 0.0
    assert get_variant("nnUNetTrainerTopk10Loss").loss == "topk10"
    ls = get_variant("nnUNetTrainerTopk10LossLS01")
    assert ls.loss == "topk10" and ls.label_smoothing == 0.1
    assert get_variant("nnUNetTrainerDiceTopK10Loss").loss == "dc_and_topk10"


def test_optimizer_family():
    # the BARE Adam/VanillaAdam/Adan classes keep the trainer's base lr
    # (reference nnUNetTrainerAdam.py: self.initial_lr stays 1e-2); only
    # the explicit lr-suffixed subclasses override it
    for name, opt, lr in (("nnUNetTrainerAdam", "adam", 1e-2),
                          ("nnUNetTrainerVanillaAdam", "adam", 1e-2),
                          ("nnUNetTrainerAdan", "adan", 1e-2),
                          ("nnUNetTrainerAdam1en3", "adam", 1e-3),
                          ("nnUNetTrainerAdam3en4", "adam", 3e-4),
                          ("nnUNetTrainerVanillaAdam1en3", "adam", 1e-3),
                          ("nnUNetTrainerAdan1en1", "adan", 1e-1),
                          ("nnUNetTrainerAdan3en4", "adan", 3e-4)):
        v = get_variant(name)
        assert v.optimizer == opt and v.config.initial_lr == lr, name
    v = get_variant("nnUNetTrainerAdanCosAnneal")
    assert v.optimizer == "adan" and v.lr_schedule == "cosine"


def test_sampling_family():
    from ldiffusion_tpu.data.patches import PatchSampler

    base = get_variant("nnUNetTrainer_probabilisticOversampling")
    assert base.probabilistic_oversampling and base.oversample_fg is None
    assert get_variant(
        "nnUNetTrainer_probabilisticOversampling_033").oversample_fg == 0.33
    assert get_variant(
        "nnUNetTrainer_probabilisticOversampling_010").oversample_fg == 0.10
    # the base class's effective positional percentage: bs=2, 33% → 0.5
    # (reference nnUNetTrainer_probabilisticOversampling.__init__)
    assert PatchSampler.effective_oversample_percent(2, 0.33) == 0.5
    assert PatchSampler.effective_oversample_percent(3, 0.33) == pytest.approx(1 / 3)


def test_benchmark_and_bn_and_ds():
    b = get_variant("nnUNetTrainerBenchmark_5epochs")
    assert b.benchmark and b.config.num_epochs == 5 and not b.no_data_loading
    nb = get_variant("nnUNetTrainerBenchmark_5epochs_noDataLoading")
    assert nb.benchmark and nb.no_data_loading
    assert get_variant("nnUNetTrainerBN").norm == "batch"
    assert get_variant("nnUNetTrainerNoDeepSupervision").config.deep_supervision \
        is False


def test_recipes_are_distinct():
    """Every variant name maps to a recipe distinguishable from the plain
    default by at least one field (or is an alias of the base trainer)."""
    default = get_variant("default")
    aliases = {"default", "nnUNetTrainer",
               # seg-resampling-order variants: behavioral no-ops here (seg
               # already resamples nearest), distinct by name only
               "nnUNetTrainer_DASegOrd0"}
    for name in KNOWN_VARIANT_NAMES:
        if name in aliases:
            continue
        v = get_variant(name)
        differs = (v.config != default.config or v.augment != default.augment
                   or dataclasses.replace(v, name="d", config=default.config,
                                          augment=default.augment)
                   != dataclasses.replace(default, name="d"))
        assert differs, f"{name} resolves to the default recipe"


# ---------------------------------------------------------------------------
# behavioral smoke tests for the new trainer mechanics
# ---------------------------------------------------------------------------

def _tiny_setup(tmp_path, variant_name):
    import jax

    from ldiffusion_tpu.core.config import MeshConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    rng = np.random.default_rng(0)
    imgs = [rng.normal(size=(24, 24, 3)).astype(np.float32) for _ in range(3)]
    labs = [(rng.random((24, 24)) > 0.5).astype(np.int32) for _ in range(3)]
    ds = PreprocessedDataset.build(imgs, labs, num_classes=2)
    plan = SegPlan(patch_size=(16, 16), batch_size=2,
                   features_per_stage=(4, 8), strides=(1, 2),
                   n_conv_per_stage=1, num_classes=2, in_channels=3,
                   normalization="zscore_image", intensity_properties={},
                   median_shape=(24, 24), batch_dice=True,
                   deep_supervision=True)
    base = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2,
                                val_iters_per_epoch=1, compute_dtype="float32")
    variant = get_variant(variant_name, base=base)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    tr = SegmentorTrainer(plan, variant.config, mesh,
                          output_dir=str(tmp_path / variant_name),
                          variant=variant)
    return tr, ds


@pytest.mark.slow
def test_bn_variant_trains_and_checkpoints(tmp_path):
    """nnUNetTrainerBN: BatchNorm net trains (running stats update), the
    checkpoint carries batch_stats, and from_checkpoints predicts with
    them."""
    import jax

    from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor

    tr, ds = _tiny_setup(tmp_path, "nnUNetTrainerBN")
    assert tr._has_bn
    before = jax.device_get(
        jax.tree_util.tree_leaves(tr.state.batch_stats)[0]).copy()
    tr.run_training(ds, ds)
    after = jax.device_get(jax.tree_util.tree_leaves(tr.state.batch_stats)[0])
    assert not np.allclose(before, after)  # running stats moved
    ck = str(tmp_path / "nnUNetTrainerBN" / "checkpoint_final.pkl")
    pred = SlidingWindowPredictor.from_checkpoints(tr.plan, [ck])
    assert isinstance(pred.params_list[0], dict) \
        and "batch_stats" in pred.params_list[0]
    out = pred.predict(np.random.default_rng(1).normal(
        size=(24, 24, 3)).astype(np.float32))
    assert out.shape == (24, 24)


@pytest.mark.slow
def test_no_data_loading_variant_trains(tmp_path):
    tr, ds = _tiny_setup(tmp_path, "nnUNetTrainerBenchmark_5epochs_noDataLoading")
    tr.run_training(ds, ds, num_epochs=1)
    assert np.isfinite(tr.epoch_log.get("train_loss"))


@pytest.mark.slow
def test_probabilistic_oversampling_variant_trains(tmp_path):
    tr, ds = _tiny_setup(tmp_path, "nnUNetTrainer_probabilisticOversampling_033")
    tr.run_training(ds, ds, num_epochs=1)
    assert np.isfinite(tr.epoch_log.get("train_loss"))


def test_order0_host_augment_uses_nearest():
    """DAOrd0: the host affine transform resamples DATA with nearest — every
    output value must be an exact input value (no bilinear blends)."""
    from ldiffusion_tpu.native import affine_augment_batch_numpy

    rng = np.random.default_rng(0)
    data = rng.random((1, 12, 12, 1)).astype(np.float32)
    seg = np.zeros((1, 12, 12), np.int16)
    angles = np.asarray([0.7])
    scales = np.asarray([1.1])
    apply = np.asarray([True])
    d0, _ = affine_augment_batch_numpy(data, seg, angles, scales, apply,
                                       data_order=0)
    vals = set(np.round(data.reshape(-1), 6)) | {0.0}
    assert set(np.round(d0.reshape(-1), 6)) <= vals
    d1, _ = affine_augment_batch_numpy(data, seg, angles, scales, apply,
                                       data_order=1)
    assert not np.allclose(d0, d1)  # bilinear differs from nearest


def test_order0_native_matches_numpy():
    from ldiffusion_tpu.native import (
        affine_augment_batch_native,
        affine_augment_batch_numpy,
    )

    rng = np.random.default_rng(1)
    data = np.ascontiguousarray(rng.random((2, 10, 10, 2)), np.float32)
    seg = np.ascontiguousarray(rng.integers(0, 3, (2, 10, 10)), np.int16)
    angles = np.asarray([0.4, -1.2])
    scales = np.asarray([0.9, 1.3])
    apply = np.asarray([True, True])
    nat = affine_augment_batch_native(data, seg, angles, scales, apply,
                                      data_order=0)
    if nat is None:
        pytest.skip("native library unavailable")
    ref = affine_augment_batch_numpy(data, seg, angles, scales, apply,
                                     data_order=0)
    np.testing.assert_allclose(nat[0], ref[0], atol=1e-6)
    np.testing.assert_array_equal(nat[1], ref[1])
