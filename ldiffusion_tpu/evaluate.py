"""Offline evaluation CLI — Dice / IoU / mPA / FWIoU over predicted vs GT PNGs.

Behavioral contract: reference ``evaluate.py:1-139``: folder-level evaluation
of prediction PNGs against ground-truth PNGs — per-image micro-dice (with the
empty-class=1 convention), per-class IoU (absent classes excluded from the
mean), pixel accuracy, frequency-weighted IoU; means + per-class breakdown
written to ``metrics_<timestamp>.txt``.

Metrics are computed in one pass from a confusion matrix per image
(vectorized; the reference loops per class in torch).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ldiffusion_tpu.data.labels import convert_labels


def confusion_matrix(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    idx = gt.astype(np.int64) * num_classes + pred.astype(np.int64)
    cm = np.bincount(idx.reshape(-1), minlength=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)  # rows: gt, cols: pred


def metrics_from_cm(cm: np.ndarray) -> Dict:
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    support = cm.sum(1)

    # micro dice with empty-class=1 convention (reference utils.py:55-82)
    denom = 2 * tp + fp + fn
    dice = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-8), 1.0)

    union = tp + fp + fn
    iou = np.where(union > 0, tp / np.maximum(union, 1e-8), np.nan)
    present = union > 0
    mean_iou = float(np.nanmean(iou)) if present.any() else 1.0

    pixel_acc = float(tp.sum() / max(cm.sum(), 1))
    freq = support / max(cm.sum(), 1)
    fwiou = float(np.nansum(freq[present] * iou[present]))

    return {
        "dice_per_class": dice,
        "mean_dice": float(dice.mean()),
        "iou_per_class": iou,
        "mean_iou": mean_iou,
        "pixel_accuracy": pixel_acc,
        "fwiou": fwiou,
    }


def _load_mask(path: str, level: Optional[str], convert: bool) -> np.ndarray:
    if path.lower().endswith(".npy"):   # 3D volumes (CLI volumetric configs)
        arr = np.load(path).astype(np.int64)
    else:
        arr = np.asarray(Image.open(path).convert("L"), np.uint8)
    if convert and level:
        return convert_labels(arr, level)
    return arr


def evaluate(pred_dir: str, gt_dir: str, num_classes: int, level: Optional[str] = "tissue",
             convert_gt: bool = True, convert_pred: bool = False,
             output_dir: str = "eval_report") -> Dict:
    """Folder-level evaluation (reference ``evaluate.py:48-126``). Files are
    paired by sorted order. GT PNGs use the PUMA pixel convention and are
    converted via the label map; predictions are class ids by default."""
    preds = sorted(f for f in os.listdir(pred_dir) if f.lower().endswith(".png"))
    gts = sorted(f for f in os.listdir(gt_dir) if f.lower().endswith(".png"))
    assert len(preds) == len(gts), f"{len(preds)} predictions vs {len(gts)} GTs"

    per_image: List[Dict] = []
    total_cm = np.zeros((num_classes, num_classes), np.int64)
    for pf, gf in zip(preds, gts):
        pred = _load_mask(os.path.join(pred_dir, pf), level, convert_pred)
        gt = _load_mask(os.path.join(gt_dir, gf), level, convert_gt)
        if pred.shape != gt.shape:
            pred = np.asarray(
                Image.fromarray(pred).resize((gt.shape[1], gt.shape[0]), Image.NEAREST))
        cm = confusion_matrix(np.clip(pred, 0, num_classes - 1),
                              np.clip(gt, 0, num_classes - 1), num_classes)
        total_cm += cm
        per_image.append({"file": pf, **metrics_from_cm(cm)})

    mean = {
        "mean_dice": float(np.mean([m["mean_dice"] for m in per_image])),
        "mean_iou": float(np.mean([m["mean_iou"] for m in per_image])),
        "mean_pixel_accuracy": float(np.mean([m["pixel_accuracy"] for m in per_image])),
        "mean_fwiou": float(np.mean([m["fwiou"] for m in per_image])),
    }
    pooled = metrics_from_cm(total_cm)
    report = {"per_image": per_image, "mean": mean, "pooled": pooled,
              "num_images": len(per_image)}

    os.makedirs(output_dir, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(output_dir, f"metrics_{ts}.txt")
    with open(path, "w") as f:
        f.write(f"Evaluation report ({len(per_image)} images)\n")
        f.write(f"pred: {pred_dir}\ngt:   {gt_dir}\n\n")
        for k, v in mean.items():
            f.write(f"{k}: {v:.4f}\n")
        f.write("\nPer-class (pooled):\n")
        for c in range(num_classes):
            iou = pooled["iou_per_class"][c]
            f.write(f"  class {c}: dice={pooled['dice_per_class'][c]:.4f} "
                    f"iou={'n/a' if np.isnan(iou) else f'{iou:.4f}'}\n")
        f.write("\nPer-image:\n")
        for m in per_image:
            f.write(f"  {m['file']}: dice={m['mean_dice']:.4f} iou={m['mean_iou']:.4f} "
                    f"pa={m['pixel_accuracy']:.4f} fwiou={m['fwiou']:.4f}\n")
    report["report_path"] = path
    return report


# ---------------------------------------------------------------------------
# Instance-level metrics (PQ / AJI)
# ---------------------------------------------------------------------------

def _pairwise_intersections(pred: np.ndarray, gt: np.ndarray):
    """Dense instance-overlap bookkeeping for two int instance maps (0 = bg).

    Returns (inter, pred_areas, gt_areas, pred_ids, gt_ids) where
    ``inter[i, j]`` is the pixel overlap between ``gt_ids[i]`` and
    ``pred_ids[j]``. One bincount over joint ids — no per-instance loops.
    """
    pred_ids = np.unique(pred)
    pred_ids = pred_ids[pred_ids != 0]
    gt_ids = np.unique(gt)
    gt_ids = gt_ids[gt_ids != 0]
    # densify ids to 0..n (0 stays background)
    pred_map = np.zeros(int(pred.max()) + 1, np.int64)
    pred_map[pred_ids] = np.arange(1, len(pred_ids) + 1)
    gt_map = np.zeros(int(gt.max()) + 1, np.int64)
    gt_map[gt_ids] = np.arange(1, len(gt_ids) + 1)
    p = pred_map[pred.astype(np.int64)]
    g = gt_map[gt.astype(np.int64)]
    np_, ng = len(pred_ids), len(gt_ids)
    joint = g.reshape(-1) * (np_ + 1) + p.reshape(-1)
    counts = np.bincount(joint, minlength=(ng + 1) * (np_ + 1))
    table = counts.reshape(ng + 1, np_ + 1)
    inter = table[1:, 1:]                      # (ng, np) gt x pred overlaps
    gt_areas = table[1:, :].sum(axis=1)
    pred_areas = table[:, 1:].sum(axis=0)
    return inter, pred_areas, gt_areas, pred_ids, gt_ids


def panoptic_quality(pred: np.ndarray, gt: np.ndarray,
                     iou_threshold: float = 0.5) -> Dict:
    """Panoptic Quality for instance maps (Kirillov et al. 2019).

    Matches at IoU > 0.5 are provably unique, so no assignment problem is
    needed. Returns PQ = SQ * RQ plus the parts and raw counts. The reference
    framework has no instance metric at all (its cellpose path is unscored);
    BASELINE.md's Dice/PQ target makes this a first-class metric here.
    """
    assert iou_threshold >= 0.5, (
        "PQ matching is only unique (assignment-free) for IoU > 0.5")
    inter, pred_areas, gt_areas, _, _ = _pairwise_intersections(pred, gt)
    ng, np_ = inter.shape
    if ng == 0 and np_ == 0:
        return {"pq": 1.0, "sq": 1.0, "rq": 1.0, "tp": 0, "fp": 0, "fn": 0,
                "iou_sum": 0.0}
    union = gt_areas[:, None] + pred_areas[None, :] - inter
    iou = inter / np.maximum(union, 1)
    matched = iou > iou_threshold                      # unique by construction
    tp = int(matched.sum())
    fp = int(np_ - matched.any(axis=0).sum())
    fn = int(ng - matched.any(axis=1).sum())
    iou_sum = float(iou[matched].sum())
    denom = tp + 0.5 * fp + 0.5 * fn
    pq = iou_sum / denom if denom > 0 else 0.0
    sq = iou_sum / tp if tp > 0 else 0.0
    rq = tp / denom if denom > 0 else 0.0
    return {"pq": float(pq), "sq": float(sq), "rq": float(rq),
            "tp": tp, "fp": fp, "fn": fn, "iou_sum": iou_sum}


def aggregated_jaccard_index(pred: np.ndarray, gt: np.ndarray) -> float:
    """AJI (Kumar et al. 2017): each GT instance claims its best-IoU
    prediction; aggregate intersection over aggregate union, with never-
    claimed predictions added to the union. As in the standard MoNuSeg /
    hover-net implementation, a prediction CAN be claimed by multiple GT
    instances (the ``used`` set only controls the unmatched-prediction
    penalty) — a known property of AJI, kept for comparability."""
    inter, pred_areas, gt_areas, _, _ = _pairwise_intersections(pred, gt)
    ng, np_ = inter.shape
    if ng == 0:
        return 1.0 if np_ == 0 else 0.0
    union = gt_areas[:, None] + pred_areas[None, :] - inter
    iou = inter / np.maximum(union, 1)
    used = np.zeros(np_, bool)
    c = u = 0.0
    for i in range(ng):
        j = int(np.argmax(iou[i])) if np_ else -1
        if np_ and inter[i, j] > 0:
            c += inter[i, j]
            u += union[i, j]
            used[j] = True
        else:
            u += gt_areas[i]
    u += pred_areas[~used].sum()
    return float(c / u) if u > 0 else 0.0


def evaluate_instances(preds, gts, iou_threshold: float = 0.5) -> Dict:
    """Dataset-level instance evaluation: PQ pooled over images (summing
    TP/FP/FN/IoU like COCO panoptic) + mean AJI."""
    tp = fp = fn = 0
    iou_sum = 0.0
    ajis = []
    for p, g in zip(preds, gts):
        m = panoptic_quality(p, g, iou_threshold)
        tp += m["tp"]; fp += m["fp"]; fn += m["fn"]; iou_sum += m["iou_sum"]
        ajis.append(aggregated_jaccard_index(p, g))
    denom = tp + 0.5 * fp + 0.5 * fn
    return {
        "pq": float(iou_sum / denom) if denom > 0 else 1.0,
        "sq": float(iou_sum / tp) if tp > 0 else 0.0,
        "rq": float(tp / denom) if denom > 0 else 0.0,
        "tp": tp, "fp": fp, "fn": fn,
        "mean_aji": float(np.mean(ajis)) if ajis else 1.0,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="Offline segmentation metrics "
                                            "(Dice/IoU/mPA/FWIoU)")
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--level", default="tissue", choices=["tissue", "cell"])
    p.add_argument("--output-dir", default="eval_report")
    args = p.parse_args(argv)
    report = evaluate(args.pred_dir, args.gt_dir, args.num_classes, args.level,
                      output_dir=args.output_dir)
    print(f"mean dice {report['mean']['mean_dice']:.4f}  "
          f"mean IoU {report['mean']['mean_iou']:.4f}  "
          f"mPA {report['mean']['mean_pixel_accuracy']:.4f}  "
          f"FWIoU {report['mean']['mean_fwiou']:.4f}")
    print(f"report: {report['report_path']}")


if __name__ == "__main__":
    main()


def _region_mask(seg: np.ndarray, region_or_label) -> np.ndarray:
    """reference ``evaluate_predictions.py:region_or_label_to_mask``."""
    if isinstance(region_or_label, (tuple, list)):
        return np.isin(seg, np.asarray(region_or_label))
    return seg == region_or_label


def compute_metrics_on_folder(pred_dir: str, gt_dir: str, num_classes: int,
                              level: Optional[str] = None,
                              output_file: Optional[str] = None,
                              regions_or_labels=None,
                              ignore_label: Optional[int] = None) -> Dict:
    """nnUNet-format validation summary (reference
    ``evaluation/evaluate_predictions.py:77-264``): per-case tp/fp/fn/tn →
    Dice/IoU per label, case means, and ``foreground_mean``; written to
    ``summary.json``.

    ``regions_or_labels``: list of label ints and/or region tuples — when
    given the summary scores each entry by set-membership masks (the regions
    regime on PAINTED predictions) with GT ``ignore_label`` pixels excluded
    (reference ``compute_tp_fp_fn_tn`` ignore_mask, ``:77-120``). When None
    the plain per-class confusion-matrix path is used.
    """
    preds = sorted(f for f in os.listdir(pred_dir)
                   if f.lower().endswith((".png", ".npy")))
    gts = sorted(f for f in os.listdir(gt_dir)
                 if f.lower().endswith((".png", ".npy")))
    assert len(preds) == len(gts)
    if regions_or_labels is not None:
        return _compute_region_metrics(pred_dir, gt_dir, preds, gts, level,
                                       regions_or_labels, ignore_label,
                                       output_file)
    metric_per_case = []
    total_cm = np.zeros((num_classes, num_classes), np.int64)
    for pf, gf in zip(preds, gts):
        pred = _load_mask(os.path.join(pred_dir, pf), level, level is not None)
        gt = _load_mask(os.path.join(gt_dir, gf), level, level is not None)
        cm = confusion_matrix(np.clip(pred, 0, num_classes - 1),
                              np.clip(gt, 0, num_classes - 1), num_classes)
        total_cm += cm
        tp = np.diag(cm).astype(float)
        fp = cm.sum(0) - tp
        fn = cm.sum(1) - tp
        tn = cm.sum() - tp - fp - fn
        metrics = {}
        for c in range(num_classes):
            denom = 2 * tp[c] + fp[c] + fn[c]
            metrics[str(c)] = {
                "Dice": float(2 * tp[c] / denom) if denom > 0 else float("nan"),
                "IoU": float(tp[c] / (tp[c] + fp[c] + fn[c]))
                       if (tp[c] + fp[c] + fn[c]) > 0 else float("nan"),
                "TP": float(tp[c]), "FP": float(fp[c]),
                "FN": float(fn[c]), "TN": float(tn[c]),
                "n_pred": float(tp[c] + fp[c]), "n_ref": float(tp[c] + fn[c]),
            }
        metric_per_case.append({"prediction_file": pf, "reference_file": gf,
                                "metrics": metrics})
    # label means over cases (nan-aware) + foreground mean
    mean: Dict[str, Dict[str, float]] = {}
    for c in range(num_classes):
        mean[str(c)] = {}
        for key in ("Dice", "IoU"):
            vals = [m["metrics"][str(c)][key] for m in metric_per_case]
            vals = [v for v in vals if not np.isnan(v)]
            mean[str(c)][key] = float(np.mean(vals)) if vals else float("nan")
    fg_dice = [mean[str(c)]["Dice"] for c in range(1, num_classes)
               if not np.isnan(mean[str(c)]["Dice"])]
    summary = {
        "metric_per_case": metric_per_case,
        "mean": mean,
        "foreground_mean": {"Dice": float(np.mean(fg_dice)) if fg_dice else float("nan")},
    }
    if output_file:
        os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
        with open(output_file, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def _compute_region_metrics(pred_dir, gt_dir, preds, gts, level,
                            regions_or_labels, ignore_label, output_file):
    """Per-entry (label int or region tuple) mask-based metrics with ignore
    masking (reference ``evaluate_predictions.py:77-176``)."""
    metric_per_case = []
    for pf, gf in zip(preds, gts):
        pred = _load_mask(os.path.join(pred_dir, pf), level, level is not None)
        gt = _load_mask(os.path.join(gt_dir, gf), level, level is not None)
        use = np.ones(gt.shape, bool) if ignore_label is None \
            else gt != ignore_label
        metrics = {}
        for r in regions_or_labels:
            mr = _region_mask(gt, r)
            mp = _region_mask(pred, r)
            tp = float(np.sum(mr & mp & use))
            fp = float(np.sum(~mr & mp & use))
            fn = float(np.sum(mr & ~mp & use))
            tn = float(np.sum(~mr & ~mp & use))
            denom = 2 * tp + fp + fn
            metrics[str(r)] = {
                "Dice": float(2 * tp / denom) if denom > 0 else float("nan"),
                "IoU": float(tp / (tp + fp + fn))
                       if (tp + fp + fn) > 0 else float("nan"),
                "TP": tp, "FP": fp, "FN": fn, "TN": tn,
                "n_pred": tp + fp, "n_ref": tp + fn,
            }
        metric_per_case.append({"prediction_file": pf, "reference_file": gf,
                                "metrics": metrics})
    mean: Dict[str, Dict[str, float]] = {}
    for r in regions_or_labels:
        mean[str(r)] = {}
        for key in ("Dice", "IoU"):
            vals = [m["metrics"][str(r)][key] for m in metric_per_case]
            vals = [v for v in vals if not np.isnan(v)]
            mean[str(r)][key] = float(np.mean(vals)) if vals else float("nan")
    fg = [mean[str(r)]["Dice"] for r in regions_or_labels
          if not np.isnan(mean[str(r)]["Dice"])]
    summary = {
        "metric_per_case": metric_per_case,
        "mean": mean,
        "foreground_mean": {"Dice": float(np.mean(fg)) if fg else float("nan")},
    }
    if output_file:
        os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
        with open(output_file, "w") as f:
            json.dump(summary, f, indent=2)
    return summary
