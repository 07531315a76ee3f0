"""Device-mesh construction and sharding helpers.

The reference has no distributed layer at all (single process, serial batch
loop — SURVEY.md §2.7). This module is the framework's scaling surface:

  * `make_mesh` builds a `jax.sharding.Mesh` over the available chips with a
    'data' axis (cohort/batch/chain parallelism — the natural axis for ODE
    workloads, which have no giant matmuls to tensor-parallelise) and an
    optional 'model' axis reserved for parameter-sharded variants.
  * `shard_batch` places a host batch onto the mesh with batch-dim sharding;
    `replicate` broadcasts parameter pytrees.

Collectives are emitted by XLA from sharding constraints (psum for the
gradient reduction in train_parallel) — no hand-written NCCL analogues, per
the scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives over ICI.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a batch pytree with leading-dim sharding over `axis`.

    The batch dimension is INFERRED as the most common leading dimension
    among the array leaves (ties broken toward the larger dim): real
    dataset batches share it on every per-sample leaf, while unbatched
    leaves (`loss_weights` is (6,) per-state — `dataset.py` pad_batch
    keeps it that way) are replicated rather than rejected by a blanket
    P(axis) placement. Previously a (6,) leaf was *sharded* whenever the
    axis size happened to divide 6 (advisor r3 finding) — now only leaves
    carrying the inferred batch dim shard.

    If the batch dim itself is not divisible by the axis size, the whole
    batch is replicated and a warning is logged: GSPMD semantics stay
    correct, but data parallelism is silently lost otherwise."""
    sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    size = mesh.shape[axis]

    leaves = [np.asarray(x) if not hasattr(x, "shape") else x
              for x in jax.tree.leaves(batch)]
    lead_dims = [int(a.shape[0]) for a in leaves if a.ndim >= 1 and a.shape[0] > 0]
    if not lead_dims:
        return jax.tree.map(lambda x: jax.device_put(x, repl), batch)
    counts: dict = {}
    for d in lead_dims:
        counts[d] = counts.get(d, 0) + 1
    batch_dim = max(counts, key=lambda d: (counts[d], d))

    if batch_dim % size != 0:
        logger.warning(
            "shard_batch: batch dim %d is not divisible by mesh axis %r "
            "(size %d) — replicating the whole batch, data parallelism is "
            "LOST for this step. Pad the batch (data.dataset.pad_batch) to "
            "a multiple of the axis size.", batch_dim, axis, size)
        return jax.tree.map(lambda x: jax.device_put(x, repl), batch)

    def place(x):
        arr = np.asarray(x) if not hasattr(x, "shape") else x
        ok = arr.ndim >= 1 and arr.shape[0] == batch_dim
        return jax.device_put(x, sharding if ok else repl)

    return jax.tree.map(place, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
