"""Regression tests for round-2 advisor findings (ADVICE.md):
in-plane lowres-axis resampling, lowres batch-cap voxel rescale, cascade
foreground-only one-hot channels.
"""
import numpy as np


def test_separate_z_handles_in_plane_lowres_axis():
    """spacing (1, 5, 1): the low-res axis is axis 1 — the separate-z path
    must transpose instead of asserting (reference get_lowres_axis supports
    any axis)."""
    from ldiffusion_tpu.segmentor.resample import resample_data_3d

    rng = np.random.default_rng(0)
    vol = rng.normal(size=(16, 4, 16)).astype(np.float32)
    out = resample_data_3d(vol, (16, 8, 16), spacing=(1.0, 5.0, 1.0), order=1)
    assert out.shape == (16, 8, 16)
    # the z-pass is nearest along the low-res axis: output slices are copies
    # of input slices along axis 1
    matches = [np.any([np.allclose(out[:, j], vol[:, i]) for i in range(4)])
               for j in range(8)]
    assert all(matches)

    # seg + channel variants exercise the transposed code paths too
    seg = (vol > 0).astype(np.int16)
    out_s = resample_data_3d(seg, (16, 8, 16), spacing=(1.0, 5.0, 1.0),
                             is_seg=True)
    assert out_s.shape == (16, 8, 16)
    assert set(np.unique(out_s)) <= {0, 1}
    volc = np.stack([vol, vol * 2], axis=-1)
    out_c = resample_data_3d(volc, (16, 8, 16), spacing=(1.0, 5.0, 1.0), order=1)
    assert out_c.shape == (16, 8, 16, 2)
    np.testing.assert_allclose(out_c[..., 1], out_c[..., 0] * 2, rtol=1e-5)


def test_lowres_batch_cap_uses_rescaled_voxels():
    """With spacing_override the 5%-of-dataset cap must count voxels at the
    NEW spacing (the reference recomputes dataset voxels after resampling) —
    the lowres cap was inflated by fullres voxel counts before."""
    from ldiffusion_tpu.segmentor.planner3d import plan_experiment_3d

    fp = {
        "shapes_after_crop": [[64, 256, 256]] * 4,
        "spacings": [[1.0, 1.0, 1.0]] * 4,
        "num_channels": 1,
    }
    # 4x coarser spacing shrinks the dataset 64x; with a generous HBM budget
    # the batch is cap-limited, so the override plan's cap must be ~64x lower
    full = plan_experiment_3d(fp, num_classes=2, hbm_budget=1 << 40)
    low = plan_experiment_3d(fp, num_classes=2, hbm_budget=1 << 40,
                             spacing_override=(4.0, 4.0, 4.0))
    full_cap = 0.05 * 4 * 64 * 256 * 256 / np.prod(full.patch_size)
    low_cap = 0.05 * 4 * 64 * 256 * 256 / 64 / np.prod(low.patch_size)
    assert full.batch_size == max(2, int(round(full_cap)))
    assert low.batch_size == max(2, int(round(low_cap)))


def test_cascade_appends_foreground_channels_only():
    """reference label_handling.py:296-297: cascades append
    len(foreground_labels) one-hot channels, not num_classes."""
    from ldiffusion_tpu.segmentor.preprocess import (
        PreprocessedCase,
        append_prev_stage_channels,
    )

    seg = np.zeros((4, 6, 6), np.int16)
    seg[1, 2, 2] = 1
    seg[2, 3, 3] = 2
    case = PreprocessedCase(
        data=np.zeros((4, 6, 6, 1), np.float32), seg=seg,
        properties={"class_locations": {}})
    out = append_prev_stage_channels(case, seg.astype(np.int64), num_classes=3)
    assert out.data.shape[-1] == 1 + 2  # image + 2 foreground channels
    # channel 0 = label 1 mask, channel 1 = label 2 mask
    assert out.data[1, 2, 2, 1] == 1.0 and out.data[1, 2, 2, 2] == 0.0
    assert out.data[2, 3, 3, 2] == 1.0 and out.data[2, 3, 3, 1] == 0.0
    # background pixels contribute no one-hot mass
    assert out.data[0, 0, 0, 1:].sum() == 0.0
