"""Regression tests for round-2 review findings (see commit message):
3D dice reduction axes, DS mode-pool label coverage, separate-z centering,
planner batch_dice rule, chunked-GN guard, PQ threshold guard.
"""
import numpy as np
import pytest


def test_soft_dice_reduces_all_spatial_axes_3d():
    """(B, Z, H, W, C) volumes must produce ONE global dice per class, not a
    per-W-column mean (the old hard-coded (0,1,2) axes)."""
    import jax.numpy as jnp

    from ldiffusion_tpu.losses.dice import soft_dice_loss

    rng = np.random.default_rng(0)
    tgt3d = rng.integers(0, 3, (2, 4, 6, 8)).astype(np.int32)
    logits3d = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 3)).astype(np.float32))
    # flattening z into the batch must give the SAME batch-dice value —
    # only true when all spatial axes reduce into the same accumulator
    flat = soft_dice_loss(logits3d.reshape(8, 6, 8, 3),
                          jnp.asarray(tgt3d.reshape(8, 6, 8)), batch_dice=True)
    vol = soft_dice_loss(logits3d, jnp.asarray(tgt3d), batch_dice=True)
    np.testing.assert_allclose(float(vol), float(flat), rtol=1e-6)
    # sample dice: per-sample accumulators, scalar loss
    out = soft_dice_loss(logits3d, jnp.asarray(tgt3d), batch_dice=False)
    assert np.isfinite(float(out))


def test_downsample_seg_covers_labels_beyond_num_heads():
    """Region/ignore label VALUES can exceed the head count; the mode-pool
    one-hot must not drop their votes."""
    import jax.numpy as jnp

    from ldiffusion_tpu.segmentor.trainer import _downsample_seg

    seg = jnp.full((1, 4, 4), 3, jnp.int32)   # label 3, e.g. ignore/region id
    out = _downsample_seg(seg, 2, num_labels=4)
    assert int(out[0, 0, 0]) == 3             # label survives pooling
    # -1 padding still wins a uniform padding window
    seg2 = jnp.full((1, 4, 4), -1, jnp.int32)
    out2 = _downsample_seg(seg2, 2, num_labels=4)
    assert int(out2[0, 0, 0]) == -1


def test_separate_z_nearest_is_centered():
    """z nearest mapping uses the ndimage order-0 convention — 2x upsample of
    [a, b] gives [a, a, b, b]-style centered replication, not a half-slice
    shift."""
    from ldiffusion_tpu.segmentor.resample import resample_data_3d

    seg = np.zeros((2, 4, 4), np.int16)
    seg[1] = 7
    out = resample_data_3d(seg, (4, 4, 4), spacing=(5.0, 1.0, 1.0), is_seg=True)
    np.testing.assert_array_equal(out[:, 0, 0], [0, 0, 7, 7])


def test_planner3d_batch_dice_follows_lowres_rule():
    """Reference :437-441: fullres batch_dice=True ONLY when a lowres stage
    exists; standalone 3d configs (and lowres itself) use sample dice."""
    from ldiffusion_tpu.segmentor.planner3d import plan_all_configurations

    small = {"shapes_after_crop": [[64, 96, 96]] * 4,
             "spacings": [[1.0, 1.0, 1.0]] * 4, "num_channels": 1}
    cfg = plan_all_configurations(small, num_classes=2)
    if "3d_lowres" not in cfg:
        assert cfg["3d_fullres"].batch_dice is False
    big = {"shapes_after_crop": [[256, 512, 512]] * 4,
           "spacings": [[1.0, 1.0, 1.0]] * 4, "num_channels": 1}
    cfg = plan_all_configurations(big, num_classes=2, hbm_budget=1 * 1024 ** 3)
    assert "3d_lowres" in cfg
    assert cfg["3d_fullres"].batch_dice is True
    assert cfg["3d_lowres"].batch_dice is False


def test_chunked_groupnorm_guards_unchunkable_shapes():
    """Explicit hybrid/chunked modes must fall back to XLA (not divide by
    zero) for spatial sizes with no valid chunking."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.ops.groupnorm import (
        _hybrid_groupnorm_silu,
        _xla_groupnorm_silu,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 48, 48, 128), jnp.float32)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    got = _hybrid_groupnorm_silu(x, scale, bias, 32, 1e-5, True)
    want = _xla_groupnorm_silu(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pq_rejects_sub_half_threshold():
    from ldiffusion_tpu.evaluate import panoptic_quality

    z = np.zeros((4, 4), np.int32)
    with pytest.raises(AssertionError):
        panoptic_quality(z, z, iou_threshold=0.3)
