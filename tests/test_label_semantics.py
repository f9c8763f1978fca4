"""One convention for out-of-bounds labels (VERDICT r2 Weak #3): the
reference runs ``RemoveLabelTransform(-1, 0)`` after spatial DA
(``nnUNetTrainer.py:733,776``) so crop padding AND rotated-out pixels train
as BACKGROUND. Both the device and host paths here follow that convention,
and the trainer maps any remaining -1 to 0 before loss/metrics.
"""
import numpy as np
import pytest


def _tiny_trainer(tmp_path):
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.data.augment import AugmentConfig
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    plan = SegPlan(patch_size=(16, 16), batch_size=2,
                   features_per_stage=(4, 8), strides=(1, 2),
                   n_conv_per_stage=1, num_classes=2, in_channels=1,
                   normalization="zscore_image", intensity_properties={},
                   median_shape=(16, 16), batch_dice=True,
                   deep_supervision=False)
    cfg = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1,
                               val_iters_per_epoch=1, compute_dtype="float32")
    aug = AugmentConfig(p_rotation=0, p_scaling=0, p_noise=0, p_blur=0,
                        p_brightness=0, p_contrast=0, p_lowres=0,
                        p_gamma_invert=0, p_gamma=0, p_mirror=0)
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                     devices=jax.devices()[:1])
    return SegmentorTrainer(plan, cfg, mesh, output_dir=str(tmp_path),
                            augment=aug)


def test_minus_one_padding_equals_background(tmp_path):
    """Crop padding (-1) must produce EXACTLY the loss/metrics of explicit
    background — not be masked out of the loss."""
    import jax.numpy as jnp

    tr = _tiny_trainer(tmp_path)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    seg_pad = np.zeros((2, 16, 16), np.int32)
    seg_pad[:, :, :4] = -1            # crop padding strip
    seg_pad[:, 4:8, 4:8] = 1
    seg_bg = np.where(seg_pad < 0, 0, seg_pad)

    la, tpa, fpa, fna = tr._val_step(tr.state.params, tr.state.batch_stats,
                                     data, jnp.asarray(seg_pad))
    lb, tpb, fpb, fnb = tr._val_step(tr.state.params, tr.state.batch_stats,
                                     data, jnp.asarray(seg_bg))
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tpa), np.asarray(tpb))
    np.testing.assert_allclose(np.asarray(fpa), np.asarray(fpb))
    np.testing.assert_allclose(np.asarray(fna), np.asarray(fnb))
    # every pixel is counted: tp+fp+fn over foreground+background covers all
    total = float(np.asarray(tpa).sum() + np.asarray(fna).sum())
    assert total == 2 * 16 * 16  # tp+fn == |pixels| per one-hot accounting


def test_train_step_maps_padding_before_loss(tmp_path):
    """The jitted train step gives identical losses for -1 padding and
    explicit background (RemoveLabelTransform runs inside the step)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    data = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    seg_pad = np.zeros((2, 16, 16), np.int32)
    seg_pad[:, :3] = -1
    seg_pad[:, 6:9, 6:9] = 1
    seg_bg = np.where(seg_pad < 0, 0, seg_pad)

    losses = []
    for seg in (seg_pad, seg_bg):
        tr = _tiny_trainer(tmp_path)  # fresh state (donated buffers)
        key = jax.random.key(0)
        _, loss = tr._train_step(tr.state, jnp.asarray(data), jnp.asarray(seg),
                                 key, jnp.float32(1e-2))
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_rotated_out_pixels_are_background_host_and_device():
    """Both spatial-augment paths fill rotated-out seg with 0 (background),
    never -1 — matching SpatialTransform(border_cval_seg=-1) followed by
    RemoveLabelTransform(-1, 0)."""
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.data.augment import AugmentConfig, augment_batch
    from ldiffusion_tpu.native import affine_augment_batch_numpy

    # host path (the production route for 2D spatial DA)
    data = np.ones((1, 12, 12, 1), np.float32)
    seg = np.full((1, 12, 12), 2, np.int16)
    out_d, out_s = affine_augment_batch_numpy(
        data, seg, np.asarray([0.8]), np.asarray([1.0]), np.asarray([True]))
    assert (out_s >= 0).all()
    assert (out_s == 0).any()  # corners rotated out -> background

    # device path (used when host spatial is disabled)
    cfg = AugmentConfig(p_rotation=1.0, p_scaling=0, p_noise=0, p_blur=0,
                        p_brightness=0, p_contrast=0, p_lowres=0,
                        p_gamma_invert=0, p_gamma=0, p_mirror=0)
    d, s = augment_batch(jax.random.key(3), jnp.asarray(data.astype(np.float32)),
                         jnp.asarray(seg.astype(np.int32)), cfg)
    s = np.asarray(s)
    assert (s >= 0).all()
    assert (s == 0).any()
