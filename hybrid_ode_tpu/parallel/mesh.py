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

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

    Leaves whose leading dimension is not divisible by the axis size are
    REPLICATED instead of sharded: real dataset batches carry unbatched
    leaves (`loss_weights` is (6,), `dataset.py` pad_batch keeps it
    per-state, not per-sample) that a blanket P(axis) placement would
    reject with a divisibility error."""
    sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    size = mesh.shape[axis]

    def place(x):
        arr = np.asarray(x) if not hasattr(x, "shape") else x
        ok = arr.ndim >= 1 and arr.shape[0] % size == 0 and arr.shape[0] > 0
        return jax.device_put(x, sharding if ok else repl)

    return jax.tree.map(place, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
