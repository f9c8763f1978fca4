"""Best-configuration selection + prediction ensembling.

Behavioral contract: nnUNet's ``find_best_configuration`` + ``ensemble``
(reference ``evaluation/find_best_configuration.py:1-333``,
``ensembling/ensemble.py``): score every trained configuration by its
validation foreground-mean dice, also score pairwise ensembles (mean of
softmax probabilities), pick the winner, determine postprocessing on its
predictions, and write ``inference_information.json`` describing exactly how
to run inference.
"""
from __future__ import annotations

import itertools
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ldiffusion_tpu.evaluate import confusion_matrix, metrics_from_cm
from ldiffusion_tpu.segmentor.postprocess import determine_postprocessing


def ensemble_probabilities(prob_list: Sequence[np.ndarray]) -> np.ndarray:
    """Mean of per-model probability maps (reference ``ensemble.py:206``)."""
    return np.mean(np.stack(prob_list), axis=0)


def _fg_dice(preds: Sequence[np.ndarray], gts: Sequence[np.ndarray],
             num_classes: int) -> float:
    cm = np.zeros((num_classes, num_classes), np.int64)
    for p, g in zip(preds, gts):
        cm += confusion_matrix(p, g, num_classes)
    return float(np.mean(metrics_from_cm(cm)["dice_per_class"][1:]))


def find_best_configuration(
    config_probs: Dict[str, List[np.ndarray]],
    gts: Sequence[np.ndarray],
    num_classes: int,
    allow_ensembling: bool = True,
    output_json: Optional[str] = None,
) -> Dict:
    """config_probs: {config_name: [per-case (H, W, C) probability maps]}.

    Returns the inference-information dict (and writes it when
    ``output_json`` is given)."""
    results: Dict[str, float] = {}
    seg_cache: Dict[str, List[np.ndarray]] = {}

    def segs_of(probs: List[np.ndarray]) -> List[np.ndarray]:
        return [np.argmax(p, axis=-1).astype(np.uint8) for p in probs]

    for name, probs in config_probs.items():
        seg_cache[name] = segs_of(probs)
        results[name] = _fg_dice(seg_cache[name], gts, num_classes)

    if allow_ensembling and len(config_probs) > 1:
        for a, b in itertools.combinations(sorted(config_probs), 2):
            name = f"ensemble___{a}___{b}"
            probs = [ensemble_probabilities([pa, pb])
                     for pa, pb in zip(config_probs[a], config_probs[b])]
            seg_cache[name] = segs_of(probs)
            results[name] = _fg_dice(seg_cache[name], gts, num_classes)

    best = max(results, key=results.get)
    pp_steps = determine_postprocessing(seg_cache[best], list(gts), num_classes)

    info = {
        "best_configuration": best,
        "all_results": results,
        "ensembling_used": best.startswith("ensemble___"),
        "members": best.split("___")[1:] if best.startswith("ensemble___") else [best],
        "postprocessing": pp_steps,
        "score": results[best],
    }
    if output_json:
        os.makedirs(os.path.dirname(output_json) or ".", exist_ok=True)
        with open(output_json, "w") as f:
            json.dump(info, f, indent=2)
    return info
