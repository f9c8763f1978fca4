"""Convergence smoke tests — "runs" is not "trains" (VERDICT r1 item 5).

* Stage 2: the segmentor trainer reaches fg-Dice > 0.9 on a deterministic
  color↔class task within a few epochs (reference train-step semantics:
  ``nnUNetTrainer.py:883-913``).
* Stage 1: the Laplace warm-up step (InfoNCE + content loss over the
  trajectory scan) decreases its loss when iterated (reference
  ``ldiffusion.py:121-295``).

Any future change that silently breaks optimization (lr plumbing, gradient
path, loss signs, sharding of the update) fails here.
"""
import numpy as np
import pytest


def _color_task(rng, n=6, size=64, num_classes=3):
    """Pixel color deterministically encodes the class: background gray,
    class 1 red-ish, class 2 blue-ish blobs."""
    images, segs = [], []
    for _ in range(n):
        img = np.full((size, size, 3), 0.5, np.float32)
        seg = np.zeros((size, size), np.int64)
        for c, color in ((1, (0.9, 0.2, 0.2)), (2, (0.2, 0.3, 0.9))):
            for _ in range(3):
                cy, cx = rng.integers(8, size - 8, 2)
                r = rng.integers(5, 10)
                yy, xx = np.mgrid[:size, :size]
                m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
                seg[m] = c
                img[m] = color
        img += rng.normal(0, 0.02, img.shape).astype(np.float32)
        images.append(np.clip(img, 0, 1))
        segs.append(seg)
    return images, segs


@pytest.mark.slow
def test_segmentor_converges_on_color_task(tmp_path):
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.data.augment import AugmentConfig
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    rng = np.random.default_rng(0)
    tr_images, tr_segs = _color_task(rng, n=6)
    va_images, va_segs = _color_task(rng, n=2)
    train_ds = PreprocessedDataset.build(tr_images, tr_segs, num_classes=3)
    val_ds = PreprocessedDataset.build(va_images, va_segs, num_classes=3)

    plan = SegPlan(patch_size=(32, 32), batch_size=4,
                   features_per_stage=(8, 16, 32), strides=(1, 2, 2),
                   n_conv_per_stage=2, num_classes=3, in_channels=3,
                   normalization="zscore_image", intensity_properties={},
                   median_shape=(64, 64), batch_dice=True, deep_supervision=True)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    cfg = SegmentorTrainConfig(num_epochs=8, iters_per_epoch=12,
                               val_iters_per_epoch=3, compute_dtype="float32",
                               save_every=50)
    # geometric DA only: color jitter would fight the color→class mapping
    aug = AugmentConfig(p_noise=0.0, p_blur=0.0, p_brightness=0.0,
                        p_contrast=0.0, p_lowres=0.0, p_gamma_invert=0.0,
                        p_gamma=0.0)
    trainer = SegmentorTrainer(plan, cfg, mesh,
                               output_dir=str(tmp_path / "seg"), augment=aug)
    trainer.run_training(train_ds, val_ds)

    losses = trainer.epoch_log.data["train_loss"]
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"
    final_dice = trainer.epoch_log.get("mean_fg_dice")
    assert final_dice > 0.9, (
        f"segmentor failed to learn the trivial color task: "
        f"fg-dice {final_dice:.3f}, losses {losses}")


@pytest.mark.slow
def test_warmup_loss_decreases():
    import jax
    import jax.numpy as jnp

    from ldiffusion_tpu.core.config import DiffusionTrainConfig, MeshConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.diffusion.pipeline import SDComponents
    from ldiffusion_tpu.losses.infonce import InfoNceLoss
    from ldiffusion_tpu.train.ldiffusion import DiffusionWarmupTrainer

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    comps = SDComponents.random(jax.random.key(0), image_size=64)
    cfg = DiffusionTrainConfig(num_inference_steps=5, batch_size=2,
                               learning_rate=1e-3)
    info = InfoNceLoss.create(num_anchors=16, num_negatives=32)
    trainer = DiffusionWarmupTrainer(comps, cfg, mesh, info_nce=info,
                                     fsdp_min_size=1 << 20)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 64, 64)).astype(np.int32))
    images = mesh.shard_batch(images)
    labels = mesh.shard_batch(labels)

    losses = []
    key = jax.random.key(7)
    for _ in range(12):
        # fixed key: optimize a deterministic objective so the descent
        # assertion is not washed out by anchor-resampling noise
        trainer.state, metrics = trainer._train_step(
            trainer.state, trainer.frozen, images, labels, key)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), (
        f"warm-up loss did not decrease: {losses}")
