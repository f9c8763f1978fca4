"""k-fold cross-validation splits.

Behavioral contract: ``nnUNetTrainer.do_split`` (reference
``training/nnUNetTrainer/nnUNetTrainer.py:513-579``): the default split is a
seeded, shuffled 5-fold CV over the sorted training case identifiers,
created once and persisted as ``splits_final.json`` in the preprocessed
dataset folder; if the file exists it is used verbatim (user-supplied splits
are honored); ``fold="all"`` trains and validates on everything; a fold
index beyond the file's splits falls back to a seeded random 80:20 split
(seed ``12345 + fold``) with a warning.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

SPLIT_SEED = 12345  # reference KFold(random_state=12345)


def generate_crossval_splits(keys: Sequence[str], n_splits: int = 5,
                             seed: int = SPLIT_SEED) -> List[Dict[str, List[str]]]:
    """Seeded shuffled k-fold over the SORTED keys (reference ``:538-547``:
    ``KFold(n_splits=5, shuffle=True, random_state=12345)`` over
    ``np.sort(keys)``). Each fold's ``val`` chunks are nearly equal sized and
    disjoint; ``train`` is the complement.

    The shuffle uses the legacy ``np.random.RandomState(seed)`` generator,
    which is bit-identical to sklearn's ``KFold(shuffle=True,
    random_state=seed)`` partition (``check_random_state(seed).shuffle`` over
    ``arange(n)`` + contiguous fold chunks) — a ``splits_final.json`` written
    here is interchangeable with one written by the reference
    (``tests`` pin this against sklearn directly)."""
    keys_sorted = np.sort(np.asarray(list(keys)))
    n = len(keys_sorted)
    if n == 1:
        # degenerate single-case dataset: train == val (nothing else to do)
        return [{"train": [str(keys_sorted[0])], "val": [str(keys_sorted[0])]}]
    n_splits = min(n_splits, n)
    perm = np.random.RandomState(seed).permutation(n)
    # sklearn-style fold sizes: the first n % k folds get one extra element
    sizes = np.full(n_splits, n // n_splits, np.int64)
    sizes[: n % n_splits] += 1
    splits: List[Dict[str, List[str]]] = []
    start = 0
    for s in sizes:
        val_idx = perm[start:start + s]
        start += s
        val_mask = np.zeros(n, bool)
        val_mask[val_idx] = True
        splits.append({
            "train": [str(k) for k in keys_sorted[~val_mask]],
            "val": [str(k) for k in keys_sorted[val_mask]],
        })
    return splits


def load_or_create_splits(splits_file: str, keys: Sequence[str],
                          n_splits: int = 5,
                          seed: int = SPLIT_SEED) -> List[Dict[str, List[str]]]:
    """Read ``splits_final.json`` if present (user-supplied splits are
    honored, reference ``:548-552``), else create + persist."""
    if os.path.isfile(splits_file):
        with open(splits_file) as f:
            return json.load(f)
    splits = generate_crossval_splits(keys, n_splits, seed)
    os.makedirs(os.path.dirname(splits_file) or ".", exist_ok=True)
    with open(splits_file, "w") as f:
        json.dump(splits, f, indent=2)
    return splits


def do_split(keys: Sequence[str], fold: Union[int, str],
             splits_file: str, n_splits: int = 5,
             log=print) -> Tuple[List[str], List[str]]:
    """(train_keys, val_keys) for a fold (reference ``do_split``,
    ``:513-579``). ``fold="all"`` → everything for both; a fold index beyond
    the split file → seeded 80:20 fallback (seed 12345 + fold)."""
    keys = [str(k) for k in keys]
    if fold == "all":
        return list(keys), list(keys)
    fold = int(fold)
    splits = load_or_create_splits(splits_file, keys, n_splits)
    if fold < len(splits):
        tr, va = list(splits[fold]["train"]), list(splits[fold]["val"])
    else:
        log(f"INFO: requested fold {fold} but splits contain only "
            f"{len(splits)} folds — creating a random (seeded) 80:20 split")
        rnd = np.random.RandomState(seed=SPLIT_SEED + fold)
        ks = np.sort(np.asarray(keys))
        idx_tr = rnd.choice(len(ks), int(len(ks) * 0.8), replace=False)
        tr = [str(ks[i]) for i in sorted(idx_tr)]
        va = [str(k) for k in ks if str(k) not in set(tr)]
    overlap = set(tr) & set(va)
    if overlap:
        log("WARNING: some validation cases are also in the training set")
    return tr, va
