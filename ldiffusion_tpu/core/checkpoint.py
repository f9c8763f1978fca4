"""Checkpoint save/load for arbitrary pytrees.

Replaces the reference's two schemes — HF ``save_pretrained`` + ZeRO-3
``GatheredParameters`` (``ldiffusion.py:265-279``) and nnUNet's torch
checkpoint dicts (``nnUNetTrainer.py:1056-1117``) — with a host-gathered
pickle of numpy-leaved pytrees. Sharded arrays are reassembled by
``jax.device_get`` (no gather collective needed); on load, the caller
re-shards with ``device_put``. Rank-0-only writes, like the reference.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    if jax.process_index() != 0:
        return
    host_tree = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)) if hasattr(x, "shape") else x, tree
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_tree, f, protocol=4)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
