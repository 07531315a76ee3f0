"""Multi-host (multi-process) initialization for DCN-spanning meshes.

Single-host multi-chip needs nothing: `jax.devices()` sees every local chip
and `make_mesh` covers them. Across HOSTS (a v5e pod slice, GKE jobset, or
SLURM allocation), each process must join the global runtime first — this
module wraps `jax.distributed.initialize` with the standard environment
conventions and provides the global/local bookkeeping a training script
needs (SURVEY.md §5; the reference is strictly single-process so there is
no analogue).

Typical use at the top of a launcher:

    from hybrid_ode_tpu.parallel import distributed
    distributed.initialize()               # no-op on single process
    mesh = make_mesh()                     # now spans ALL hosts' devices
    ...                                    # shardings unchanged: the 'data'
                                           # axis simply crosses DCN

Design note: nothing else in the framework changes for multi-host — the
parallel train step and cohort simulator are expressed as shardings over a
Mesh, so XLA partitions per process automatically (each host feeds its
addressable shard of a `jax.make_array_from_process_local_data` batch).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger("hybrid_ode_tpu.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process JAX runtime; returns True if distributed.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > cloud-TPU auto-detection
    (jax.distributed.initialize() with no args works on TPU pods) >
    single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info("joined distributed runtime: process %d/%d via %s",
                    jax.process_index(), jax.process_count(), coordinator_address)
        return True
    # On actual TPU pod slices the coordinator is auto-discovered from the
    # TPU metadata; only attempt when the env says we're one of many workers.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hostnames or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # backends already initialized (too late to join) or no service
            # reachable — fall back to single-process rather than abort
            logger.warning("pod auto-initialize failed (%s); single-process", e)
            return False
        logger.info("joined TPU pod runtime: process %d/%d",
                    jax.process_index(), jax.process_count())
        return True
    logger.debug("single-process run (no coordinator configured)")
    return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_local_batch(global_batch, mesh) -> dict:
    """Place a per-process batch dict onto a (possibly multi-host) mesh.

    Each process passes ITS shard of the global batch (leading-axis slice of
    size global_B / process_count); the returned arrays are globally-sharded
    jax.Arrays usable by the parallel train step on any topology.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(place, global_batch)
