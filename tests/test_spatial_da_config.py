"""Spatial-DA configuration parity: aspect-dependent rotation ranges,
dummy-2D DA for anisotropic 3D patches, rotation-aware INITIAL patch
enlargement + center crop (reference
``nnUNetTrainer.py:375-431`` configure_rotation_dummyDA_mirroring_and_
inital_patch_size + ``data_augmentation/compute_initial_patch_size.py``).
"""
import numpy as np
import pytest

from ldiffusion_tpu.data.augment import (
    AugmentConfig,
    HostSpatialAugmenter,
    HostSpatialAugmenter3D,
    center_crop_batch,
    configure_spatial_da,
    get_initial_patch_size,
)


# --- reference formula, re-derived independently (batchgenerators
#     row-vector rotate_coords_{2d,3d} + get_patch_size) ------------------

def _ref_get_patch_size(final_patch_size, rot_x, rot_y, rot_z, scale_range):
    rot_x = min(np.pi / 2, abs(rot_x))
    rot_y = min(np.pi / 2, abs(rot_y))
    rot_z = min(np.pi / 2, abs(rot_z))
    coords = np.array(final_patch_size, np.float64)
    final = coords.copy()
    if len(coords) == 3:
        def rx(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

        def ry(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

        def rz(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

        for m in (rx(rot_x), ry(rot_y), rz(rot_z)):
            final = np.maximum(final, np.abs(coords @ m))
    else:
        c, s = np.cos(rot_x), np.sin(rot_x)
        final = np.maximum(final, np.abs(coords @ np.array([[c, -s],
                                                            [s, c]])))
    return tuple((final / min(scale_range)).astype(int))


@pytest.mark.parametrize("patch,rots,scale", [
    ((256, 256), (np.pi, 0, 0), (0.85, 1.25)),
    ((320, 160), (np.pi / 12, 0, 0), (0.85, 1.25)),
    ((48, 192, 160), (np.pi / 6, np.pi / 6, np.pi / 6), (0.85, 1.25)),
    ((20, 320, 256), (np.pi, 0, 0), (0.7, 1.43)),
])
def test_get_initial_patch_size_matches_reference(patch, rots, scale):
    got = get_initial_patch_size(patch, *rots, scale)
    want = _ref_get_patch_size(patch, *rots, scale)
    assert got == want
    # enlargement is real (rotation/zoom-out headroom)
    assert all(g >= p for g, p in zip(got, patch))


def test_get_initial_patch_size_range_inputs():
    # tuple ranges take max |angle|, clamped at 90° — (-180°, 180°) and 90°
    # produce the same enlargement
    a = get_initial_patch_size((64, 64), (-np.pi, np.pi), 0, 0, (0.85, 1.25))
    b = get_initial_patch_size((64, 64), np.pi / 2, 0, 0, (0.85, 1.25))
    assert a == b
    # 90°-rotated square: extent unchanged, only the zoom-out factor remains
    assert a == (int(64 / 0.85), int(64 / 0.85))


def test_configure_spatial_da_2d():
    # square → full ±180° rotation
    sq = configure_spatial_da((256, 256))
    assert sq.rotation_max[0] == pytest.approx(np.pi)
    assert not sq.do_dummy_2d
    assert sq.mirror_axes == (0, 1)
    assert sq.initial_patch_size == _ref_get_patch_size(
        (256, 256), np.pi, 0, 0, (0.85, 1.25))
    # elongated (aspect > 1.5) → ±15°
    el = configure_spatial_da((320, 160))
    assert el.rotation_max[0] == pytest.approx(np.pi / 12)
    assert el.initial_patch_size == _ref_get_patch_size(
        (320, 160), np.pi / 12, 0, 0, (0.85, 1.25))


def test_configure_spatial_da_3d_isotropic():
    p = configure_spatial_da((128, 128, 128))
    assert not p.do_dummy_2d
    assert p.rotation_max == tuple([pytest.approx(np.pi / 6)] * 3)
    assert p.mirror_axes == (0, 1, 2)
    assert p.initial_patch_size == _ref_get_patch_size(
        (128, 128, 128), np.pi / 6, np.pi / 6, np.pi / 6, (0.85, 1.25))


def test_configure_spatial_da_3d_anisotropic_dummy2d():
    # max(patch)/patch[0] = 320/20 = 16 > 3 → dummy-2D, in-plane ±180°,
    # z extent NOT enlarged
    p = configure_spatial_da((20, 320, 256))
    assert p.do_dummy_2d
    assert p.rotation_max[0] == pytest.approx(np.pi)
    assert p.initial_patch_size[0] == 20
    want_inplane = _ref_get_patch_size((320, 256), np.pi, 0, 0, (0.85, 1.25))
    assert p.initial_patch_size[1:] == want_inplane
    # DA5 feeds its true scale range
    p5 = configure_spatial_da((20, 320, 256), initial_scale_range=(0.7, 1.43))
    assert p5.initial_patch_size[1] > p.initial_patch_size[1]


def test_center_crop_batch():
    data = np.arange(2 * 10 * 12 * 3, dtype=np.float32).reshape(2, 10, 12, 3)
    seg = np.arange(2 * 10 * 12, dtype=np.int32).reshape(2, 10, 12)
    d, s = center_crop_batch(data, seg, (6, 8))
    assert d.shape == (2, 6, 8, 3) and s.shape == (2, 6, 8)
    np.testing.assert_array_equal(d, data[:, 2:8, 2:10])
    np.testing.assert_array_equal(s, seg[:, 2:8, 2:10])


def test_host_augmenter_out_size_2d():
    rng = np.random.default_rng(3)
    data = rng.random((4, 40, 40, 2)).astype(np.float32)
    seg = rng.integers(0, 3, (4, 40, 40)).astype(np.int32)
    # no transform engages → output is exactly the center crop
    aug = HostSpatialAugmenter(AugmentConfig(p_rotation=0.0, p_scaling=0.0),
                               seed=0, out_size=(32, 32))
    d, s = aug(data, seg)
    np.testing.assert_array_equal(d, data[:, 4:36, 4:36])
    np.testing.assert_array_equal(s, seg[:, 4:36, 4:36])
    # transforms engaged → still the final size, labels stay in-set
    aug = HostSpatialAugmenter(AugmentConfig(p_rotation=1.0, p_scaling=1.0),
                               seed=0, out_size=(32, 32))
    d, s = aug(data, seg)
    assert d.shape == (4, 32, 32, 2) and s.shape == (4, 32, 32)
    assert set(np.unique(s)) <= set(np.unique(seg)) | {0}


def test_host_augmenter3d_dummy2d_same_transform_per_sample():
    """dummy-2D: every z-slice of a sample gets the SAME in-plane transform
    (Convert3DTo2D semantics) — z-constant input stays z-constant."""
    rng = np.random.default_rng(5)
    sl = rng.random((24, 24, 1)).astype(np.float32)
    data = np.broadcast_to(sl, (2, 6, 24, 24, 1)).copy()
    seg_sl = rng.integers(0, 3, (24, 24)).astype(np.int32)
    seg = np.broadcast_to(seg_sl, (2, 6, 24, 24)).copy()
    aug = HostSpatialAugmenter3D(
        AugmentConfig(p_rotation=1.0, p_scaling=1.0), seed=1,
        out_size=(6, 16, 16), dummy_2d=True)
    d, s = aug(data, seg)
    assert d.shape == (2, 6, 16, 16, 1) and s.shape == (2, 6, 16, 16)
    for b in range(2):
        for z in range(1, 6):
            np.testing.assert_array_equal(d[b, z], d[b, 0])
            np.testing.assert_array_equal(s[b, z], s[b, 0])
    # content actually moved for at least one sample
    center = data[:, :, 4:20, 4:20]
    assert not np.allclose(d, center)


def test_trainer_enlarges_train_patch_and_crops_back(tmp_path):
    """2D trainer wiring: PatchSampler crops the INITIAL size, the host
    augmenter center-crops back to plan.patch_size; the aspect rule rewrites
    rotation_max."""
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    plan = SegPlan(
        patch_size=(32, 16), batch_size=2, features_per_stage=(4, 8),
        strides=(1, 2), n_conv_per_stage=1, num_classes=2, in_channels=1,
        normalization="zscore", intensity_properties={},
        median_shape=(32, 16), batch_dice=True, deep_supervision=False)
    cfg = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1,
                               val_iters_per_epoch=1,
                               compute_dtype="float32")
    aug = AugmentConfig(p_rotation=1.0, p_scaling=0.5, p_noise=0, p_blur=0,
                        p_brightness=0, p_contrast=0, p_lowres=0,
                        p_gamma_invert=0, p_gamma=0, p_mirror=0)
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                     devices=jax.devices()[:1])
    tr = SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path),
                          augment=aug)
    # aspect 32/16 = 2 > 1.5 → ±15°
    assert tr.augment_cfg.p_rotation == 0.0  # device spatial zeroed
    assert tr.host_spatial is not None
    assert tr.host_spatial.cfg.rotation_max == pytest.approx(np.pi / 12)
    assert tr.host_spatial.out_size == (32, 16)
    assert tr.train_patch_size == _ref_get_patch_size(
        (32, 16), np.pi / 12, 0, 0, (0.85, 1.25))
    assert all(t >= p for t, p in zip(tr.train_patch_size, plan.patch_size))
    # the augmenter restores the model's patch size
    rng = np.random.default_rng(0)
    ip = tr.train_patch_size
    d = rng.random((2, *ip, 1)).astype(np.float32)
    s = rng.integers(0, 2, (2, *ip)).astype(np.int32)
    od, os_ = tr.host_spatial(d, s)
    assert od.shape == (2, 32, 16, 1) and os_.shape == (2, 32, 16)


# --- out_size fused crop: kernel output == transform-then-center-crop ------

def test_out_size_2d_matches_crop_after_transform():
    from ldiffusion_tpu.native import (
        affine_augment_batch_native,
        affine_augment_batch_numpy,
    )

    rng = np.random.default_rng(11)
    data = np.ascontiguousarray(rng.random((3, 21, 17, 2)), np.float32)
    seg = np.ascontiguousarray(rng.integers(0, 4, (3, 21, 17)), np.int16)
    ang = np.asarray([0.7, -0.3, 0.0])
    sc = np.asarray([0.9, 1.2, 1.0])
    ap = np.asarray([True, True, False])
    for order in (1, 0):
        full = affine_augment_batch_numpy(data, seg, ang, sc, ap,
                                          data_order=order)
        fused = affine_augment_batch_numpy(data, seg, ang, sc, ap,
                                           data_order=order,
                                           out_size=(16, 12))
        want_d, want_s = center_crop_batch(full[0], full[1], (16, 12))
        np.testing.assert_array_equal(fused[0], want_d)
        np.testing.assert_array_equal(fused[1], want_s)
        nat = affine_augment_batch_native(data, seg, ang, sc, ap,
                                          data_order=order,
                                          out_size=(16, 12))
        if nat is not None:
            np.testing.assert_allclose(nat[0], want_d, atol=1e-5)
            np.testing.assert_array_equal(nat[1], want_s)


def test_out_size_3d_matches_crop_after_transform():
    from ldiffusion_tpu.native import (
        affine_augment_batch_3d_native,
        affine_augment_batch_3d_numpy,
    )

    rng = np.random.default_rng(13)
    data = np.ascontiguousarray(rng.random((2, 9, 12, 10, 1)), np.float32)
    seg = np.ascontiguousarray(rng.integers(0, 3, (2, 9, 12, 10)), np.int16)
    ax = np.asarray([0.4, 0.0])
    ay = np.asarray([-0.2, 0.0])
    az = np.asarray([0.3, 0.0])
    sc = np.asarray([1.1, 1.0])
    ap = np.asarray([True, False])
    out_size = (6, 8, 7)
    for order in (1, 0):
        full = affine_augment_batch_3d_numpy(data, seg, ax, ay, az, sc, ap,
                                             data_order=order)
        fused = affine_augment_batch_3d_numpy(data, seg, ax, ay, az, sc, ap,
                                              data_order=order,
                                              out_size=out_size)
        want_d, want_s = center_crop_batch(full[0], full[1], out_size)
        np.testing.assert_array_equal(fused[0], want_d)
        np.testing.assert_array_equal(fused[1], want_s)
        nat = affine_augment_batch_3d_native(data, seg, ax, ay, az, sc, ap,
                                             data_order=order,
                                             out_size=out_size)
        if nat is not None:
            np.testing.assert_allclose(nat[0], want_d, atol=1e-5)
            np.testing.assert_array_equal(nat[1], want_s)
