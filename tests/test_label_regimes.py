"""End-to-end training across all four label regimes — the analog of the
reference's integration-test matrix (Dataset996-999: plain / ignore /
regions / regions+ignore, ``dataset_conversion/datasets_for_integration_tests``,
``run_integration_test.sh``). The fork trains regions with sigmoid heads and
DC+Focal (``nnUNetTrainer.py:350-355``).
"""
import os

import numpy as np
import pytest


def _dataset(rng, n=4, size=32, labels=(1, 2), ignore_label=None):
    imgs, segs = [], []
    for _ in range(n):
        img = np.full((size, size, 3), 0.5, np.float32)
        seg = np.zeros((size, size), np.int64)
        for c, color in zip(labels, ((0.9, 0.2, 0.2), (0.2, 0.3, 0.9))):
            cy, cx = rng.integers(8, size - 8, 2)
            yy, xx = np.mgrid[:size, :size]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 36
            seg[m] = c
            img[m] = color
        if ignore_label is not None:
            seg[:2] = ignore_label  # a strip of ignore pixels
        imgs.append(img + rng.normal(0, 0.02, img.shape).astype(np.float32))
        segs.append(seg)
    return imgs, segs


def _train(label_dict, regions_class_order=None, ignore_label=None, tmp_path="."):
    import jax

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.data.augment import AugmentConfig
    from ldiffusion_tpu.segmentor.label_manager import LabelManager
    from ldiffusion_tpu.segmentor.planner import SegPlan
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer

    lm = LabelManager(label_dict, regions_class_order)
    rng = np.random.default_rng(0)
    imgs, segs = _dataset(rng, ignore_label=ignore_label)
    ds = PreprocessedDataset.build(imgs, segs, num_classes=4)

    plan = SegPlan(patch_size=(32, 32), batch_size=2,
                   features_per_stage=(8, 16), strides=(1, 2),
                   n_conv_per_stage=1, num_classes=lm.num_segmentation_heads,
                   in_channels=3, normalization="zscore_image",
                   intensity_properties={}, median_shape=(32, 32),
                   batch_dice=True, deep_supervision=True)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    cfg = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=2,
                               val_iters_per_epoch=1, compute_dtype="float32",
                               save_every=50)
    aug = AugmentConfig(p_rotation=0.0, p_scaling=0.0, p_noise=0.0, p_blur=0.0,
                        p_brightness=0.0, p_contrast=0.0, p_lowres=0.0,
                        p_gamma_invert=0.0, p_gamma=0.0)
    out = os.path.join(str(tmp_path), "seg")
    trainer = SegmentorTrainer(plan, cfg, mesh, output_dir=out, augment=aug,
                               label_manager=lm)
    trainer.run_training(ds, ds)
    return trainer


@pytest.mark.slow
def test_plain_labels_regime(tmp_path):
    t = _train({"background": 0, "a": 1, "b": 2}, tmp_path=tmp_path)
    assert np.isfinite(t.epoch_log.get("train_loss"))
    assert np.isfinite(t.epoch_log.get("mean_fg_dice"))


@pytest.mark.slow
def test_ignore_label_regime(tmp_path):
    t = _train({"background": 0, "a": 1, "b": 2, "ignore": 3},
               ignore_label=3, tmp_path=tmp_path)
    assert t._mask_lut is not None and t._region_lut is None
    assert float(t._mask_lut[3 + 1]) == 0.0   # ignore masked
    assert float(t._mask_lut[0]) == 0.0       # -1 padding masked
    assert np.isfinite(t.epoch_log.get("train_loss"))


@pytest.mark.slow
def test_regions_regime(tmp_path):
    t = _train({"background": 0, "whole": (1, 2), "core": (2,)},
               regions_class_order=(1, 2), tmp_path=tmp_path)
    assert t._region_lut is not None
    # label 2 belongs to both regions; label 1 only to "whole"
    np.testing.assert_array_equal(np.asarray(t._region_lut[2 + 1]), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(t._region_lut[1 + 1]), [1.0, 0.0])
    assert np.isfinite(t.epoch_log.get("train_loss"))
    assert np.isfinite(t.epoch_log.get("mean_fg_dice"))


@pytest.mark.slow
def test_regions_plus_ignore_regime(tmp_path):
    t = _train({"background": 0, "whole": (1, 2), "core": (2,), "ignore": 3},
               regions_class_order=(1, 2), ignore_label=3, tmp_path=tmp_path)
    assert t._region_lut is not None and t._mask_lut is not None
    assert float(t._mask_lut[3 + 1]) == 0.0
    np.testing.assert_array_equal(np.asarray(t._region_lut[3 + 1]), [0.0, 0.0])
    assert np.isfinite(t.epoch_log.get("train_loss"))
