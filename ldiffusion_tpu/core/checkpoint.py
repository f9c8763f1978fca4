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


def _to_host(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # Params sharded across hosts (FSDP multi-host): every process must
        # participate in the gather before the rank-0 write.
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    if hasattr(x, "shape"):
        return np.asarray(jax.device_get(x))
    return x


def save_pytree(path: str, tree: Any) -> None:
    host_tree = jax.tree_util.tree_map(_to_host, tree)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_tree, f, protocol=4)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
