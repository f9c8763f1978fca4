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
    # -1 padding trains as BACKGROUND (RemoveLabelTransform(-1, 0), reference
    # nnUNetTrainer.py:733) — row 0 is unreachable and unmasked
    assert float(t._mask_lut[0]) == 1.0
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


# ---------------------------------------------------------------------------
# Round 3: the matrix extends THROUGH prediction + summary.json (the
# reference's 996-999 integration tests run through prediction —
# tests/integration_tests/readme.md). A regions/ignore-trained model must
# predict via the inference nonlin + regions_class_order painting, not argmax
# (reference predict_from_raw_data.py:459-494 → label_handling.py:128-176).
# ---------------------------------------------------------------------------

def _validate(t, ignore_label=None):
    rng = np.random.default_rng(1)
    imgs, segs = _dataset(rng, n=2, ignore_label=ignore_label)
    return t.perform_actual_validation(imgs, segs)


@pytest.mark.slow
def test_regions_regime_predicts_painted_labels(tmp_path):
    import json

    t = _train({"background": 0, "whole": (1, 2), "core": (2,)},
               regions_class_order=(1, 2), tmp_path=tmp_path)
    summary = _validate(t)
    # predictions are PAINTED label values, not sigmoid-head indices
    from PIL import Image
    vdir = os.path.join(t.output_dir, "validation")
    pngs = [f for f in os.listdir(vdir) if f.endswith(".png")]
    assert pngs
    vals = set()
    for f in pngs:
        vals |= set(np.unique(np.asarray(Image.open(os.path.join(vdir, f)))))
    assert vals <= {0, 1, 2}
    # summary scores REGION TUPLES, not class indices
    assert set(summary["mean"].keys()) == {"(1, 2)", "(2,)"}
    assert "Dice" in summary["foreground_mean"]
    data = json.load(open(os.path.join(vdir, "summary.json")))
    assert set(data["mean"].keys()) == {"(1, 2)", "(2,)"}


@pytest.mark.slow
def test_ignore_regime_validation_masks_ignore(tmp_path):
    t = _train({"background": 0, "a": 1, "b": 2, "ignore": 3},
               ignore_label=3, tmp_path=tmp_path)
    summary = _validate(t, ignore_label=3)
    # per-label masked metrics: counted pixels exclude the GT ignore strip
    case = summary["metric_per_case"][0]["metrics"]
    assert set(case.keys()) == {"1", "2"}
    m = case["1"]
    total = m["TP"] + m["FP"] + m["FN"] + m["TN"]
    assert total == 32 * 32 - 2 * 32  # whole image minus the ignore strip


def test_sliding_window_regions_painting_unit():
    """Unit: a predictor with sigmoid region heads paints in
    regions_class_order — later regions overwrite earlier ones."""
    from ldiffusion_tpu.segmentor.label_manager import LabelManager

    lm = LabelManager({"background": 0, "whole": (1, 2), "core": (2,)},
                      regions_class_order=(1, 2))
    # head 0 ("whole") hot everywhere, head 1 ("core") hot in a corner
    logits = np.full((8, 8, 2), -10.0, np.float32)
    logits[..., 0] = 10.0
    logits[:2, :2, 1] = 10.0
    seg = lm.convert_logits_to_segmentation(logits)
    assert (seg[:2, :2] == 2).all()     # core painted over whole
    assert (seg[4:, 4:] == 1).all()
    # plain-label managers map argmax through label VALUES
    lm2 = LabelManager({"background": 0, "x": 3, "y": 7})
    lg = np.zeros((4, 4, 3), np.float32)
    lg[..., 2] = 5.0
    assert (lm2.convert_logits_to_segmentation(lg) == 7).all()
