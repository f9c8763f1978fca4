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
             num_classes: int, label_manager=None) -> float:
    """Foreground-mean dice. With a label manager the score is computed per
    label/region via set-membership masks with ignore masking (the regimes'
    scoring rule, reference ``evaluate_predictions.py:77-120``); plain path
    uses a pooled confusion matrix."""
    assert len(preds) == len(gts), (len(preds), len(gts))
    if label_manager is not None:
        from ldiffusion_tpu.evaluate import _region_mask

        ig = label_manager.ignore_label
        dices = []
        for r in label_manager.labels_or_regions_for_eval:
            tp = fp = fn = 0.0
            for p, g in zip(preds, gts):
                use = np.ones(g.shape, bool) if ig is None else g != ig
                mr = _region_mask(g, r)
                mp = _region_mask(p, r)
                tp += float(np.sum(mr & mp & use))
                fp += float(np.sum(~mr & mp & use))
                fn += float(np.sum(mr & ~mp & use))
            denom = 2 * tp + fp + fn
            if denom > 0:
                dices.append(2 * tp / denom)
        return float(np.mean(dices)) if dices else float("nan")
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
    label_manager=None,
) -> Dict:
    """config_probs: {config_name: [per-case (H, W, C) probability maps]}.

    With a ``label_manager`` the probability maps are converted through the
    regime's segmentation rule (regions_class_order painting for regions —
    raw argmax on sigmoid region heads would be wrong) and scored with
    region/ignore-aware dice. Returns the inference-information dict (and
    writes it when ``output_json`` is given)."""
    results: Dict[str, float] = {}
    seg_cache: Dict[str, List[np.ndarray]] = {}

    def segs_of(probs: List[np.ndarray]) -> List[np.ndarray]:
        if label_manager is not None:
            return [label_manager.convert_probabilities_to_segmentation(p)
                    for p in probs]
        return [np.argmax(p, axis=-1).astype(np.uint8) for p in probs]

    n_cases = len(gts)
    for name, probs in config_probs.items():
        assert len(probs) == n_cases, \
            f"config {name}: {len(probs)} cases vs {n_cases} GTs"
        seg_cache[name] = segs_of(probs)
        results[name] = _fg_dice(seg_cache[name], gts, num_classes,
                                 label_manager)

    if allow_ensembling and len(config_probs) > 1:
        for a, b in itertools.combinations(sorted(config_probs), 2):
            name = f"ensemble___{a}___{b}"
            probs = [ensemble_probabilities([pa, pb])
                     for pa, pb in zip(config_probs[a], config_probs[b])]
            seg_cache[name] = segs_of(probs)
            results[name] = _fg_dice(seg_cache[name], gts, num_classes,
                                     label_manager)

    best = max(results, key=results.get)
    # the CM-based pp scorer needs a class count covering every VALUE in the
    # (painted) predictions and GTs
    n_pp = num_classes
    if label_manager is not None:
        vals = list(label_manager.all_labels)
        if label_manager.has_ignore_label:
            vals.append(label_manager.ignore_label)
        n_pp = max(vals) + 1
    pp_steps = determine_postprocessing(seg_cache[best], list(gts), n_pp)

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


def collect_fold_cv_predictions(plan, dataset_dir: str, pp_dataset,
                                use_mirroring: bool = True,
                                mirror_axes=None,
                                label_manager=None):
    """Cross-validation probability maps for one configuration: every
    ``fold_<f>`` checkpoint predicts ITS OWN validation split (the reference
    scores configs on the union of per-fold validation predictions,
    ``find_best_configuration.py`` via each fold's ``validation/`` folder +
    CV ``summary.json``).

    dataset_dir must contain ``splits_final.json`` and ``fold_*`` checkpoint
    dirs (the ``api.train_tissue`` layout); pp_dataset is the preprocessed
    dataset covering all train cases. Returns (case_keys, probs, gts) with
    one entry per case that appears in some fold's validation split.
    """
    import glob as _glob

    import numpy as np

    from ldiffusion_tpu.segmentor.predictor import (
        SlidingWindowPredictor,
        find_fold_checkpoints,
    )
    from ldiffusion_tpu.segmentor.splits import load_or_create_splits

    splits = load_or_create_splits(os.path.join(dataset_dir,
                                                "splits_final.json"),
                                   pp_dataset.keys())
    keys, probs, gts = [], [], []
    for d in sorted(_glob.glob(os.path.join(dataset_dir, "fold_*"))):
        fold = int(os.path.basename(d).split("_")[1])
        if fold >= len(splits):
            continue
        try:
            ckpt = find_fold_checkpoints(dataset_dir, folds=[fold])[0]
        except FileNotFoundError:
            continue
        # the label manager routes regions/ignore regimes through the
        # regime's inference nonlin (sigmoid for regions) so the probability
        # maps feed the painted-segmentation scoring downstream
        predictor = SlidingWindowPredictor.from_checkpoints(
            plan, [ckpt], use_mirroring=use_mirroring,
            mirror_axes=mirror_axes, label_manager=label_manager)
        for k in splits[fold]["val"]:
            case = pp_dataset[k]
            keys.append(k)
            # preprocessed-store data is already normalized — do not
            # re-z-score (would distort non-zscore schemes)
            probs.append(predictor.predict_probabilities(
                np.asarray(case.data, np.float32), normalize=False))
            gts.append(np.maximum(case.seg, 0))
    return keys, probs, gts


def find_best_configuration_from_folds(configs, pp_dataset, num_classes: int,
                                       allow_ensembling: bool = True,
                                       output_json: Optional[str] = None,
                                       use_mirroring: bool = True,
                                       mirror_axes=None,
                                       label_manager=None) -> Dict:
    """The CV-consuming ``find_best_configuration`` (reference
    ``evaluation/find_best_configuration.py:1-333``): score every trained
    configuration by its cross-validation predictions (each fold predicting
    its own validation split), try pairwise prob-mean ensembles, pick the
    winner, determine postprocessing, write inference_information.json.

    configs: {config_name: (plan, dataset_dir with fold_* checkpoints)};
    pass the dataset's ``label_manager`` for regions/ignore regimes (their
    probabilities paint through regions_class_order and score with ignore
    masking).
    """
    config_probs: Dict[str, List] = {}
    gts = None
    for name, (plan, dataset_dir) in configs.items():
        keys, probs, fold_gts = collect_fold_cv_predictions(
            plan, dataset_dir, pp_dataset, use_mirroring=use_mirroring,
            mirror_axes=mirror_axes, label_manager=label_manager)
        order = np.argsort(keys)
        config_probs[name] = [probs[i] for i in order]
        g = [fold_gts[i] for i in order]
        # zip() would silently truncate — equal case counts checked first
        assert gts is None or (len(gts) == len(g) and all(
            np.array_equal(a, b) for a, b in zip(gts, g))), \
            "configurations disagree on CV case coverage"
        gts = g
    return find_best_configuration(config_probs, gts, num_classes,
                                   allow_ensembling=allow_ensembling,
                                   output_json=output_json,
                                   label_manager=label_manager)
