import numpy as np
import pytest
from PIL import Image

from ldiffusion_tpu.evaluate import confusion_matrix, evaluate, metrics_from_cm


def test_confusion_matrix_basics():
    gt = np.array([[0, 1], [1, 2]])
    pred = np.array([[0, 1], [2, 2]])
    cm = confusion_matrix(pred, gt, 3)
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[1, 2] == 1 and cm[2, 2] == 1


def test_metrics_perfect():
    gt = np.zeros((8, 8), np.int64)
    gt[:4] = 1
    cm = confusion_matrix(gt, gt, 3)
    m = metrics_from_cm(cm)
    assert m["pixel_accuracy"] == 1.0
    np.testing.assert_allclose(m["dice_per_class"], [1, 1, 1])  # empty class → 1
    assert m["mean_iou"] == 1.0
    assert m["fwiou"] == pytest.approx(1.0)


def test_metrics_absent_class_excluded_from_iou():
    gt = np.zeros((4, 4), np.int64)
    pred = np.zeros((4, 4), np.int64)
    m = metrics_from_cm(confusion_matrix(pred, gt, 5))
    assert m["mean_iou"] == 1.0  # only class 0 present, IoU 1


def test_evaluate_folder(tmp_path):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    # PUMA tissue pixel convention for GT; class ids for predictions
    gt = np.zeros((16, 16), np.uint8)
    gt[:8] = 100  # tissue pixel 100 → class 1
    pred = np.zeros((16, 16), np.uint8)
    pred[:8] = 1
    pred[0, 0] = 0  # one error
    for i in range(2):
        Image.fromarray(gt).save(gt_dir / f"img_{i}.png")
        Image.fromarray(pred).save(pred_dir / f"img_{i}.png")
    report = evaluate(str(pred_dir), str(gt_dir), num_classes=7, level="tissue",
                      output_dir=str(tmp_path / "report"))
    assert report["num_images"] == 2
    assert report["mean"]["mean_pixel_accuracy"] == pytest.approx(255 / 256)
    assert report["mean"]["mean_dice"] > 0.9
    import os
    assert os.path.exists(report["report_path"])
