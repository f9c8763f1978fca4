"""Connected-component postprocessing.

Behavioral contract: nnUNet's ``remove_connected_components`` (reference
``postprocessing/remove_connected_components.py:22-362``): try
"keep-largest-component" first on the merged foreground, then per class; a
candidate postprocessing is kept only when it improves the evaluation metric
on cross-validation predictions; the chosen function list is persisted and
applied at inference (``apply_postprocessing_to_folder``).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np
from scipy import ndimage

from ldiffusion_tpu.evaluate import confusion_matrix, metrics_from_cm


def remove_all_but_largest_component(seg: np.ndarray, labels) -> np.ndarray:
    """Keep only the largest connected component of the given label set
    (merged as one region, nnUNet semantics). Other pixels of those labels
    become background (0)."""
    labels = [labels] if np.isscalar(labels) else list(labels)
    mask = np.isin(seg, labels)
    if not mask.any():
        return seg
    comp, n = ndimage.label(mask)
    if n <= 1:
        return seg
    sizes = ndimage.sum_labels(np.ones_like(comp), comp, index=range(1, n + 1))
    keep = int(np.argmax(sizes)) + 1
    out = seg.copy()
    out[mask & (comp != keep)] = 0
    return out


def _mean_fg_dice(preds: Sequence[np.ndarray], gts: Sequence[np.ndarray],
                  num_classes: int, ignore_label=None) -> float:
    """Mean foreground dice over a confusion matrix; GT pixels carrying the
    ignore label are excluded (predictions never emit the ignore value, so
    counting them would attribute fixed errors to whichever class occupies
    them — the reference determines postprocessing on ignore-masked metrics,
    ``evaluate_predictions.py:87-96``)."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    for p, g in zip(preds, gts):
        if ignore_label is not None:
            keep = np.asarray(g) != ignore_label
            p, g = np.asarray(p)[keep], np.asarray(g)[keep]
        cm += confusion_matrix(p, g, num_classes)
    m = metrics_from_cm(cm)
    return float(np.mean(m["dice_per_class"][1:]))


def determine_postprocessing(preds: Sequence[np.ndarray], gts: Sequence[np.ndarray],
                             num_classes: int, ignore_label=None) -> List[Dict]:
    """Decide which keep-largest-component steps improve mean fg dice
    (reference ``remove_connected_components.py:22-250`` decision procedure).
    ``ignore_label``: GT value masked out of the scoring dice (ignore-label
    regime). Returns a JSON-serializable list of postprocessing steps."""
    steps: List[Dict] = []
    cur = [p.copy() for p in preds]
    base = _mean_fg_dice(cur, gts, num_classes, ignore_label)

    # 1) foreground-as-a-whole
    fg_labels = list(range(1, num_classes))
    cand = [remove_all_but_largest_component(p, fg_labels) for p in cur]
    score = _mean_fg_dice(cand, gts, num_classes, ignore_label)
    if score > base:
        steps.append({"fn": "remove_all_but_largest_component", "labels": fg_labels})
        cur, base = cand, score

    # 2) per class
    for c in range(1, num_classes):
        cand = [remove_all_but_largest_component(p, c) for p in cur]
        score = _mean_fg_dice(cand, gts, num_classes, ignore_label)
        if score > base:
            steps.append({"fn": "remove_all_but_largest_component", "labels": [c]})
            cur, base = cand, score
    return steps


def apply_postprocessing(seg: np.ndarray, steps: Sequence[Dict]) -> np.ndarray:
    for s in steps:
        assert s["fn"] == "remove_all_but_largest_component", s
        seg = remove_all_but_largest_component(seg, s["labels"])
    return seg


def save_postprocessing(steps: Sequence[Dict], path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(list(steps), f, indent=2)


def load_postprocessing(path: str) -> List[Dict]:
    return json.load(open(path))


def apply_postprocessing_to_folder(input_dir: str, output_dir: str, steps_path: str):
    """reference ``remove_connected_components.py:300-345``."""
    from PIL import Image

    steps = load_postprocessing(steps_path)
    os.makedirs(output_dir, exist_ok=True)
    for fn in sorted(os.listdir(input_dir)):
        if not fn.lower().endswith(".png"):
            continue
        seg = np.asarray(Image.open(os.path.join(input_dir, fn)))
        out = apply_postprocessing(seg.copy(), steps)
        Image.fromarray(out.astype(np.uint8)).save(os.path.join(output_dir, fn))
