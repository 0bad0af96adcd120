"""Device mesh + sharding helpers (TPU-native data parallelism).

Replaces the reference's NCCL/DDP stack (``MLIC++/playground/train.py:96-106``,
``base_trainer.py:38-48``; SURVEY.md §2.10/§5.8) with single-program JAX
SPMD: a 1-D ``data`` mesh, batch sharded over it, parameters replicated.
Gradient averaging is the mean over the sharded batch — XLA inserts the
cross-device ``psum`` during partitioning, riding ICI; no explicit
collectives or gradient hooks.

Multi-host: each process feeds its local shard (``process_index``-sliced
dataset), exactly replacing ``DistributedSampler``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host batch with the leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def process_allgather(local_values: Any) -> Any:
    """Gather per-process results to every host (replaces the reference's
    ``dist.gather_object`` statistics collection,
    ``compression_trainer.py:854-878``).  No-op on a single process."""
    if jax.process_count() == 1:
        return local_values
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(local_values)


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a global batch (multi-host input pipeline)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
