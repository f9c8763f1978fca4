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
