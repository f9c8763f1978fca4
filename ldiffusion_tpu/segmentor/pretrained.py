"""Shape-matched pretrained-weight transfer between segmentor networks.

Behavioral contract: nnUNet's ``load_pretrained_weights`` (reference
``run/load_pretrained_weights.py``): copy every parameter whose path and
shape match between a source checkpoint and a target param tree (e.g. a
model planned on a different dataset); mismatches are skipped (final seg
heads with different class counts) and reported.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = tree
    return out


def transfer_pretrained_weights(target_params: dict, source_params: dict,
                                verbose: bool = True) -> Tuple[dict, List[str], List[str]]:
    """Returns (new_target, transferred_paths, skipped_paths)."""
    src = _flatten(source_params)
    transferred, skipped = [], []

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in node.items()}
        if prefix in src and tuple(np.shape(src[prefix])) == tuple(np.shape(node)):
            transferred.append(prefix)
            return jax.numpy.asarray(src[prefix])
        skipped.append(prefix)
        return node

    new_target = walk(target_params)
    if verbose:
        print(f"transferred {len(transferred)} tensors, skipped {len(skipped)}")
        for p in skipped[:10]:
            print(f"  skipped: {p}")
    return new_target, transferred, skipped
