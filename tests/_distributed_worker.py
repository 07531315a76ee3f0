"""Worker for the real 2-process distributed test (run via subprocess).

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id>

Each of the 2 processes contributes 4 virtual CPU devices; the global mesh
spans 8. The worker runs ONE parallel train step on its half of a
deterministic global batch and prints the (replicated) loss and the global
post-update parameter norm so the parent test can compare against the
single-process 8-device run. Closes SURVEY.md §5's multi-host axis with a
real `jax.distributed.initialize` handshake (VERDICT r2 missing #4).
"""

import os
import sys
from pathlib import Path

port, pid = sys.argv[1], int(sys.argv[2])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hybrid_ode_tpu.models.hybrid import HybridConfig, init_hybrid_params  # noqa: E402
from hybrid_ode_tpu.parallel import distributed  # noqa: E402
from hybrid_ode_tpu.parallel.mesh import make_mesh, replicate  # noqa: E402
from hybrid_ode_tpu.parallel.train_parallel import make_parallel_train_step  # noqa: E402
from hybrid_ode_tpu.train.loop import TrainState, make_optimizer  # noqa: E402

ok = distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert ok, "distributed.initialize returned False"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

FAST = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2, mode="scan")

B, T = 16, 6
base = np.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2], np.float32)
rng = np.random.default_rng(0)
global_batch = {
    "initial_state": np.abs(
        base[None, :] * (1 + 0.05 * rng.standard_normal((B, 6)))
    ).astype(np.float32),
    "observations": np.ones((B, T, 6), np.float32),
    "time_points": np.broadcast_to(
        np.linspace(0, 1, T, dtype=np.float32), (B, T)
    ).copy(),
    "external_inputs": {
        "meal": np.zeros((B, T), np.float32),
        "tVNS": np.zeros((B, T), np.float32),
    },
    "mask": np.ones((B, T), np.float32),
}
# this process's half of the global batch (contiguous leading-axis shard)
half = B // 2
local = jax.tree.map(lambda x: x[pid * half : (pid + 1) * half], global_batch)

mesh = make_mesh(8)
opt = make_optimizer(1e-3, 1, 1, 5.0)
params = init_hybrid_params(jax.random.PRNGKey(1), FAST)
pstep = make_parallel_train_step(mesh, opt, FAST, 1.0, 0.01, True)
state = TrainState(
    replicate(mesh, params),
    replicate(mesh, opt.init(params)),
    replicate(mesh, jnp.asarray(0, jnp.int32)),
)
placed = distributed.process_local_batch(local, mesh)
key = jax.device_put(
    jax.random.PRNGKey(0),
    jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
)
new_state, metrics = pstep(state, placed, key)

norm_fn = jax.jit(
    lambda p: jnp.sqrt(
        sum(jnp.sum(x.astype(jnp.float64) ** 2) for x in jax.tree.leaves(p))
    ),
    out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
)
pnorm = norm_fn(new_state.params)
loss = metrics["loss"]
print(
    f"RESULT pid={pid} loss={float(loss.addressable_data(0)):.10e} "
    f"pnorm={float(pnorm.addressable_data(0)):.10e}",
    flush=True,
)
jax.distributed.shutdown()
