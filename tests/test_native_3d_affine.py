"""Host-side 3D spatial augmentation (rotation+scale): native C++ vs numpy
parity, label-set preservation, and trainer wiring — the batchgenerators 3D
SpatialTransform analog (reference ``nnUNetTrainer.py:673-795``; closes the
r2 "3D spatial DA omitted" deviation).
"""
import numpy as np
import pytest

from ldiffusion_tpu.native import (
    affine_augment_batch_3d_native,
    affine_augment_batch_3d_numpy,
)


def _vol(b=2, d=10, h=12, w=14, c=2, seed=0):
    rng = np.random.default_rng(seed)
    data = np.ascontiguousarray(rng.random((b, d, h, w, c)), np.float32)
    seg = np.ascontiguousarray(rng.integers(0, 3, (b, d, h, w)), np.int16)
    return data, seg


def test_native_matches_numpy_3d():
    data, seg = _vol()
    ax = np.asarray([0.3, -0.2])
    ay = np.asarray([-0.4, 0.1])
    az = np.asarray([0.2, 0.5])
    sc = np.asarray([0.9, 1.2])
    ap = np.asarray([True, True])
    nat = affine_augment_batch_3d_native(data, seg, ax, ay, az, sc, ap)
    if nat is None:
        pytest.skip("native library unavailable")
    ref = affine_augment_batch_3d_numpy(data, seg, ax, ay, az, sc, ap)
    np.testing.assert_allclose(nat[0], ref[0], atol=1e-5)
    np.testing.assert_array_equal(nat[1], ref[1])
    # order-0 data mode too
    nat0 = affine_augment_batch_3d_native(data, seg, ax, ay, az, sc, ap,
                                          data_order=0)
    ref0 = affine_augment_batch_3d_numpy(data, seg, ax, ay, az, sc, ap,
                                         data_order=0)
    np.testing.assert_allclose(nat0[0], ref0[0], atol=1e-6)
    np.testing.assert_array_equal(nat0[1], ref0[1])


def test_identity_and_semantics_3d():
    data, seg = _vol(b=3)
    zeros = np.zeros(3)
    ones = np.ones(3)
    # apply=False → bytewise identity
    out_d, out_s = affine_augment_batch_3d_numpy(
        data, seg, zeros, zeros, zeros, ones, np.asarray([False] * 3))
    np.testing.assert_array_equal(out_d, data)
    np.testing.assert_array_equal(out_s, seg)
    # zero-angle unit-scale applied → near identity (trilinear at integer
    # coordinates samples exactly)
    out_d, out_s = affine_augment_batch_3d_numpy(
        data, seg, zeros, zeros, zeros, ones, np.asarray([True] * 3))
    np.testing.assert_allclose(out_d, data, atol=1e-6)
    np.testing.assert_array_equal(out_s, seg)
    # a real rotation: labels stay within the original set ∪ {0} (nearest,
    # zero outside — RemoveLabelTransform(-1,0) convention), and content moves
    ax = np.asarray([0.6, 0.6, 0.6])
    out_d, out_s = affine_augment_batch_3d_numpy(
        data, seg, ax, ax, ax, ones, np.asarray([True] * 3))
    assert set(np.unique(out_s)) <= set(np.unique(seg)) | {0}
    assert not np.array_equal(out_s, seg)
    # scale < 1 samples beyond the source extent → zero-filled corners
    out_d, out_s = affine_augment_batch_3d_numpy(
        data, seg + 1, zeros, zeros, zeros, np.asarray([0.4] * 3),
        np.asarray([True] * 3))
    assert (out_s[:, 0, 0, 0] == 0).all()


@pytest.mark.slow
def test_trainer_uses_host_3d_spatial(tmp_path):
    """A 3D SegmentorTrainer with spatial probabilities enabled builds the
    host 3D augmenter and trains."""
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.data.augment import AugmentConfig, HostSpatialAugmenter3D
    from ldiffusion_tpu.segmentor.planner3d import SegPlan3D
    from ldiffusion_tpu.segmentor.preprocess import (
        PreprocessedDataset,
        preprocess_case_3d,
    )
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    rng = np.random.default_rng(0)
    cases = {}
    for i in range(2):
        vol = rng.normal(size=(8, 16, 16, 1)).astype(np.float32) + 1
        lab = (rng.random((8, 16, 16)) > 0.5).astype(np.int32)
        cases[f"c{i}"] = preprocess_case_3d(vol, lab, num_classes=2)
    ds = PreprocessedDataset(cases=cases)
    plan = SegPlan3D(
        patch_size=(8, 16, 16), batch_size=2, spacing=(1.0, 1.0, 1.0),
        features_per_stage=(4, 8), strides=((1, 1, 1), (2, 2, 2)),
        kernel_sizes=((3, 3, 3), (3, 3, 3)), n_conv_per_stage=1,
        num_classes=2, in_channels=1, normalization="zscore",
        median_shape=(8, 16, 16), batch_dice=True, deep_supervision=True)
    cfg = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2,
                               val_iters_per_epoch=1, compute_dtype="float32")
    aug = AugmentConfig(p_rotation=1.0, p_scaling=0.5, p_noise=0, p_blur=0,
                        p_brightness=0, p_contrast=0, p_lowres=0,
                        p_gamma_invert=0, p_gamma=0, p_mirror=0.5)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    tr = SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path),
                          augment=aug)
    assert isinstance(tr.host_spatial, HostSpatialAugmenter3D)
    assert tr.augment_cfg.p_rotation == 0.0  # device spatial zeroed
    tr.run_training(ds, ds)
    assert np.isfinite(tr.epoch_log.get("train_loss"))
