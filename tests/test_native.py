"""Native C++ patch-extraction library: build, exact parity with the numpy
path (2D + 3D, out-of-bounds padding), and PatchSampler integration."""
import numpy as np
import pytest

from ldiffusion_tpu.data.patches import PatchSampler, _crop_with_pad
from ldiffusion_tpu.native import crop_with_pad_batch_native, load_library


def _random_case(rng, shape, c=3):
    data = rng.random((*shape, c)).astype(np.float32)
    seg = rng.integers(0, 4, shape).astype(np.int16)
    return data, seg


@pytest.mark.parametrize("shape,patch", [
    ((40, 56), (16, 16)),
    ((10, 12), (16, 16)),          # patch larger than case → padding
    ((12, 40, 56), (8, 16, 16)),   # 3D
])
def test_native_matches_numpy(shape, patch):
    if load_library() is None:
        pytest.skip("no C++ toolchain in this environment")
    rng = np.random.default_rng(0)
    cases = [_random_case(rng, shape) for _ in range(5)]
    nd = len(patch)
    lbs = np.stack([
        [int(rng.integers(-4, max(shape[a] - patch[a] + 4, -3)))
         for a in range(nd)]
        for _ in range(5)
    ]).astype(np.int64)
    # include fully out-of-bounds and aligned corners
    lbs[0] = [-p for p in patch]
    lbs[1] = [0] * nd
    out = crop_with_pad_batch_native(cases, lbs, patch)
    assert out is not None
    data_n, seg_n = out
    for b, (d, s) in enumerate(cases):
        d_ref, s_ref = _crop_with_pad(d, s, tuple(lbs[b]), patch)
        np.testing.assert_array_equal(data_n[b], d_ref)
        np.testing.assert_array_equal(seg_n[b], s_ref)


def test_patch_sampler_uses_native_and_matches():
    """The sampler's native batch path must produce byte-identical batches
    to the numpy path for the same seed."""
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset

    rng = np.random.default_rng(0)
    imgs = [rng.random((48, 48, 3)).astype(np.float32) for _ in range(3)]
    segs = [rng.integers(0, 3, (48, 48)) for _ in range(3)]
    ds = PreprocessedDataset.build(imgs, segs, num_classes=3)

    s1 = PatchSampler(ds, (32, 32), batch_size=4, seed=7)
    batch_native = next(iter(s1))
    s2 = PatchSampler(ds, (32, 32), batch_size=4, seed=7)
    s2._try_native = lambda picks: None  # force numpy path
    batch_numpy = next(iter(s2))
    np.testing.assert_array_equal(batch_native[0], batch_numpy[0])
    np.testing.assert_array_equal(batch_native[1], batch_numpy[1])


def test_affine_native_matches_numpy_fallback():
    if load_library() is None:
        pytest.skip("no C++ toolchain in this environment")
    from ldiffusion_tpu.native import (
        affine_augment_batch_native,
        affine_augment_batch_numpy,
    )

    rng = np.random.default_rng(0)
    data = rng.random((3, 32, 32, 3)).astype(np.float32)
    seg = rng.integers(0, 5, (3, 32, 32)).astype(np.int16)
    angles = np.array([0.7, -2.1, 0.0])
    scales = np.array([1.0, 0.8, 1.25])
    apply = np.array([1, 1, 1], np.uint8)
    dn, sn = affine_augment_batch_native(data, seg, angles, scales, apply)
    dr, sr = affine_augment_batch_numpy(data, seg, angles, scales, apply)
    np.testing.assert_allclose(dn, dr, rtol=1e-5, atol=1e-5)
    # nearest rounding differs only at exact .5 coordinates (none with these
    # irrational angles)
    np.testing.assert_array_equal(sn, sr)
    # apply=0 is a passthrough
    dn2, sn2 = affine_augment_batch_native(data, seg, angles, scales,
                                           np.zeros(3, np.uint8))
    np.testing.assert_array_equal(dn2, data)
    np.testing.assert_array_equal(sn2, seg)


def test_affine_native_matches_device_bilinear():
    """The host resample must equal the device map_coordinates path (same
    inverse-map convention, zero border)."""
    if load_library() is None:
        pytest.skip("no C++ toolchain in this environment")
    import jax.numpy as jnp

    from ldiffusion_tpu.data.augment import _affine_coords, _bilinear_sample
    from ldiffusion_tpu.native import affine_augment_batch_native

    rng = np.random.default_rng(1)
    data = rng.random((1, 24, 24, 3)).astype(np.float32)
    seg = rng.integers(0, 4, (1, 24, 24)).astype(np.int16)
    angle, scale = 0.537, 1.21
    sy, sx = _affine_coords(24, 24, angle, scale)
    dev = np.asarray(_bilinear_sample(jnp.asarray(data[0]), sy, sx, 1))
    dn, _ = affine_augment_batch_native(data, seg, np.array([angle]),
                                        np.array([scale]), np.array([1], np.uint8))
    np.testing.assert_allclose(dn[0], dev, rtol=1e-4, atol=1e-4)


def test_host_spatial_augmenter_in_trainer_path():
    """Seg labels survive the host spatial transform (no interpolated ids)."""
    from ldiffusion_tpu.data.augment import AugmentConfig, HostSpatialAugmenter

    rng = np.random.default_rng(0)
    data = rng.random((4, 32, 32, 3)).astype(np.float32)
    seg = np.zeros((4, 32, 32), np.int32)
    seg[:, 8:24, 8:24] = 3
    aug = HostSpatialAugmenter(AugmentConfig(p_rotation=1.0, p_scaling=1.0),
                               seed=5)
    d2, s2 = aug(data, seg)
    assert d2.shape == data.shape and s2.shape == seg.shape
    assert s2.dtype == seg.dtype
    assert set(np.unique(s2)) <= {0, 3}
    assert (s2 == 3).any()
    assert not np.array_equal(d2, data)  # transform actually applied
