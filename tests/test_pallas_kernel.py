"""Pallas fused-RK4 kernel: equivalence with the XLA solver path.

Runs in interpret mode (tests execute on the CPU mesh); the compiled kernel
is exercised on real hardware by bench.py and the verify flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ode_tpu.dynamics.controls import Controls
from hybrid_ode_tpu.models.hybrid import HybridConfig, batched_forward, init_hybrid_params
from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_trajectory


@pytest.mark.parametrize("substeps", [2, 4])
def test_fused_rk4_matches_xla(substeps):
    cfg = HybridConfig(solver="rk4", substeps=substeps, mode="scan")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["nn"]["w4"] = 0.01 * jax.random.normal(jax.random.PRNGKey(2), params["nn"]["w4"].shape)

    B, T = 5, 13
    key = jax.random.PRNGKey(1)
    y0 = jnp.abs(jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])[None, :]
                 * (1 + 0.1 * jax.random.normal(key, (B, 6))))
    # per-sample, non-uniform time grids
    ts = jnp.cumsum(jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, T))) * 0.1 + 0.05, axis=1)
    meal = jnp.zeros((B, T)).at[:, 3].set(2.0).at[:, 9].set(1.0)
    tvns = jnp.zeros((B, T)).at[:, 5:].set(1.0)
    controls = Controls(ts=ts, signals={"meal": meal, "tVNS": tvns})

    ref = batched_forward(params, y0, ts, controls, cfg)
    out = fused_rk4_trajectory(y0, ts, meal, tvns, params["ode"], params["nn"],
                               substeps=substeps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_rk4_nondefault_layers():
    cfg = HybridConfig(solver="rk4", substeps=2, mode="scan", nn_hidden=64, nn_layers=2)
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["nn"]["w2"] = 0.01 * jax.random.normal(jax.random.PRNGKey(2), params["nn"]["w2"].shape)
    B, T = 3, 5
    y0 = jnp.abs(jnp.ones((B, 6)) * jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2]))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T))
    meal = jnp.zeros((B, T))
    tvns = jnp.zeros((B, T))
    ref = batched_forward(params, y0, ts, Controls(ts=ts, signals={"meal": meal, "tVNS": tvns}), cfg)
    out = fused_rk4_trajectory(y0, ts, meal, tvns, params["ode"], params["nn"],
                               substeps=2, n_layers=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
