"""Instance-level metrics (PQ / AJI) + proposer quality.

The reference has no instance metric (its cellpose path is unscored);
BASELINE.md's "Dice/PQ parity" target makes PQ/AJI first-class here. Values
in the hand cases are computed analytically.
"""
import numpy as np
import pytest

from ldiffusion_tpu.evaluate import (
    aggregated_jaccard_index,
    evaluate_instances,
    panoptic_quality,
)


def test_pq_perfect():
    gt = np.zeros((8, 8), np.int32)
    gt[:, :4] = 1
    gt[:, 4:] = 2
    m = panoptic_quality(gt, gt)
    assert m["pq"] == 1.0 and m["sq"] == 1.0 and m["rq"] == 1.0
    assert m["tp"] == 2 and m["fp"] == 0 and m["fn"] == 0
    assert aggregated_jaccard_index(gt, gt) == 1.0


def test_pq_empty_maps():
    z = np.zeros((4, 4), np.int32)
    assert panoptic_quality(z, z)["pq"] == 1.0
    assert aggregated_jaccard_index(z, z) == 1.0
    one = z.copy()
    one[1:3, 1:3] = 1
    # all-FP and all-FN cases
    assert panoptic_quality(one, z)["pq"] == 0.0
    assert panoptic_quality(z, one)["pq"] == 0.0
    assert aggregated_jaccard_index(one, z) == 0.0
    assert aggregated_jaccard_index(z, one) == 0.0


def test_pq_aji_hand_case():
    # GT: two 8x4 instances. Pred: inst1 covers 3 of 4 cols of GT1
    # (IoU 24/32 = 0.75 -> TP); inst2 covers half of GT2 (IoU 16/32 = 0.5,
    # not > 0.5 -> FP, GT2 -> FN).
    gt = np.zeros((8, 8), np.int32)
    gt[:, :4] = 1
    gt[:, 4:] = 2
    pred = np.zeros((8, 8), np.int32)
    pred[:, :3] = 1
    pred[:, 4:6] = 2
    m = panoptic_quality(pred, gt)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert m["sq"] == pytest.approx(0.75)
    assert m["rq"] == pytest.approx(0.5)
    assert m["pq"] == pytest.approx(0.375)
    # AJI: GT1 claims pred1 (24/32), GT2's best is pred2 (16/32); no
    # unclaimed predictions -> (24+16)/(32+32) = 0.625
    assert aggregated_jaccard_index(pred, gt) == pytest.approx(0.625)


def test_pq_ids_need_not_be_dense():
    gt = np.zeros((8, 8), np.int32)
    gt[:4, :4] = 7
    gt[4:, 4:] = 1000
    pred = np.zeros((8, 8), np.int32)
    pred[:4, :4] = 3
    pred[4:, 4:] = 12
    m = panoptic_quality(pred, gt)
    assert m["pq"] == 1.0 and m["tp"] == 2


def test_evaluate_instances_pools_counts():
    gt = np.zeros((8, 8), np.int32)
    gt[:, :4] = 1
    gt[:, 4:] = 2
    pred = np.zeros((8, 8), np.int32)
    pred[:, :3] = 1
    pred[:, 4:6] = 2
    m = evaluate_instances([pred, gt], [gt, gt])
    # image 1: tp1 fp1 fn1 iou_sum .75; image 2: tp2 iou_sum 2
    assert m["tp"] == 3 and m["fp"] == 1 and m["fn"] == 1
    assert m["pq"] == pytest.approx(2.75 / 4.0)
    assert m["mean_aji"] == pytest.approx((0.625 + 1.0) / 2)
