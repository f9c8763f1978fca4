"""Mesh / distributed runtime.

Replaces the reference's NCCL stack — ``deepspeed.init_distributed()``
(``ldiffusion.py:37-38``), ``dist.init_process_group("nccl")``
(``model/nnunetv2/run/run_training.py:104``) and DeepSpeed ZeRO-3 gather/
scatter — with a ``jax.sharding.Mesh`` over ICI. Collectives are inserted by
XLA from sharding annotations; there is no NCCL analog to manage.

Axes:
  * ``data`` — batch sharding (DP).
  * ``fsdp`` — parameter/optimizer sharding (replaces ZeRO-3).
  * ``tensor`` — reserved (the reference has no TP; SURVEY §2.3).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldiffusion_tpu.core.config import MeshConfig

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"


def maybe_init_multihost() -> None:
    """Initialize the multi-host runtime when launched under a JAX coordinator.

    Mirrors the rendezvous role of ``deepspeed.init_distributed()``
    (reference ``ldiffusion.py:37-38``) but via ``jax.distributed``.
    No-op for single-process runs.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    # Guard on the client object only: calling jax.process_count() here would
    # initialize the XLA backend, after which distributed.initialize() raises.
    from jax._src import distributed as _dist

    if _dist.global_state.client is None:
        jax.distributed.initialize()


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the canonical shardings used across the framework."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_fsdp(self) -> int:
        return self.mesh.shape[FSDP_AXIS]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def batch_sharding(self) -> NamedSharding:
        """Batch dim sharded over both data and fsdp axes (fully data-parallel
        batch; fsdp only matters for parameter layout)."""
        return NamedSharding(self.mesh, P((DATA_AXIS, FSDP_AXIS)))

    def shard_batch(self, tree):
        """Device_put a host batch with leading dim sharded across the mesh."""
        def put(x):
            return jax.device_put(x, self.sharding((DATA_AXIS, FSDP_AXIS)))
        return jax.tree_util.tree_map(put, tree)

    def param_sharding_fn(self, min_size_to_shard: int = 2 ** 18):
        """Return fn: abstract leaf -> NamedSharding implementing FSDP.

        Shards the largest dimension divisible by the fsdp axis size, for
        leaves of at least ``min_size_to_shard`` elements (analog of ZeRO-3's
        ``stage3_param_persistence_threshold``, reference ``ldiffusion.py:184``
        — tiny params stay replicated).
        """
        n = self.n_fsdp

        def fn(leaf) -> NamedSharding:
            shape = getattr(leaf, "shape", ())
            if n == 1 or not shape or int(np.prod(shape)) < min_size_to_shard:
                return self.replicated
            # largest divisible dim gets the fsdp axis
            cands = [(d, i) for i, d in enumerate(shape) if d % n == 0]
            if not cands:
                return self.replicated
            _, axis = max(cands)
            spec = [None] * len(shape)
            spec[axis] = FSDP_AXIS
            return NamedSharding(self.mesh, P(*spec))

        return fn

    def shard_params(self, params, min_size_to_shard: int = 2 ** 18):
        fn = self.param_sharding_fn(min_size_to_shard)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, fn(x)), params)

    def param_shardings(self, abstract_params, min_size_to_shard: int = 2 ** 18):
        fn = self.param_sharding_fn(min_size_to_shard)
        return jax.tree_util.tree_map(fn, abstract_params)


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> MeshContext:
    """Build the global device mesh.

    Device order follows ``jax.devices()`` which already snakes through the
    physical torus, so adjacent mesh coordinates are ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    config = (config or MeshConfig()).resolved(len(devices))
    arr = np.array(devices).reshape(config.data, config.fsdp, config.tensor)
    return MeshContext(mesh=Mesh(arr, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)))


def local_batch_slice(global_batch: int, n_proc: Optional[int] = None, index: Optional[int] = None):
    """Per-process slice of a global batch (multi-host data loading).

    Analog of DistributedSampler sharding (reference ``ldiffusion.py:100-110``).
    """
    n_proc = jax.process_count() if n_proc is None else n_proc
    index = jax.process_index() if index is None else index
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return slice(index * per, (index + 1) * per)
