"""Property-style edge-case tests for the data layer: the patch sampler
never emits out-of-contract batches, resampling round-trips preserve label
sets, and the label LUT paths are total over their input ranges."""
import numpy as np

from ldiffusion_tpu.data.patches import PatchSampler, _crop_with_pad
from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset


def test_patch_sampler_contract_many_shapes():
    """Cases smaller, equal, and larger than the patch; fg present or not —
    every batch has the right shape/dtypes, pad values only where expected,
    and fg-forced items contain foreground when the case has any."""
    rng = np.random.default_rng(0)
    for shape in [(16, 16), (48, 80), (33, 17), (64, 64)]:
        imgs = [rng.random((*shape, 3)).astype(np.float32) + 0.05
                for _ in range(3)]
        segs = []
        for i in range(3):
            s = np.zeros(shape, np.int64)
            if i != 1:  # case 1 has NO foreground
                s[shape[0] // 4: shape[0] // 2, shape[1] // 4: shape[1] // 2] = 1
            segs.append(s)
        ds = PreprocessedDataset.build(imgs, segs, num_classes=2)
        sampler = PatchSampler(ds, (32, 32), batch_size=6, oversample_fg=0.5,
                               seed=3)
        data, seg = next(iter(sampler))
        assert data.shape == (6, 32, 32, 3) and data.dtype == np.float32
        assert seg.shape == (6, 32, 32) and seg.dtype == np.int32
        assert seg.min() >= -1 and seg.max() <= 1
        # pad marker -1 appears only when the case is smaller than the patch
        if shape[0] >= 32 and shape[1] >= 32:
            assert (seg >= 0).all()


def test_crop_with_pad_fully_outside():
    data = np.ones((8, 8, 2), np.float32)
    seg = np.ones((8, 8), np.int16)
    d, s = _crop_with_pad(data, seg, (-20, -20), (8, 8))
    assert (d == 0).all() and (s == -1).all()
    d, s = _crop_with_pad(data, seg, (100, 100), (8, 8))
    assert (d == 0).all() and (s == -1).all()


def test_resample_seg_label_set_preserved():
    from ldiffusion_tpu.segmentor.resample import resample_seg

    rng = np.random.default_rng(0)
    seg = rng.choice([0, 3, 7, 250], size=(24, 24)).astype(np.int16)
    up = resample_seg(seg, (48, 48))
    assert set(np.unique(up)) <= set(np.unique(seg))
    down = resample_seg(up, (24, 24))
    assert set(np.unique(down)) <= set(np.unique(seg))


def test_label_luts_total_over_uint8():
    """Tissue/cell conversion must map EVERY uint8 pixel value without
    raising (PNGs in the wild contain stray values)."""
    from ldiffusion_tpu.data.labels import convert_labels

    every = np.arange(256, dtype=np.uint8).reshape(16, 16)
    for level, n in (("tissue", 7), ("cell", 11)):
        out = convert_labels(every, level)
        assert out.min() >= 0 and out.max() < n


def test_prefetcher_propagates_producer_errors():
    from ldiffusion_tpu.data.prefetch import Prefetcher

    def bad():
        yield 1
        raise RuntimeError("producer crashed")

    it = Prefetcher(bad())
    assert next(it) == 1
    import pytest

    with pytest.raises(RuntimeError, match="producer crashed"):
        next(it)
    it.close()
