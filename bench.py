"""Benchmark: hybrid-ODE cohort simulation throughput on TPU.

Prints ONE JSON line:
    {"metric": "fused_rk4_substeps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N, ...secondary fields}

Workloads (8192-subject cohort, 61 output points, full hybrid field =
mechanistic 6-state drift + 4x64 MLP residual — the reference's core forward
workload `models/hybrid_ode_nn.py:136-261` at production scale):

  1. PRIMARY: Pallas fused full-trajectory RK4 kernel (ops/pallas_rk4.py) —
     states + weights resident in VMEM for the whole integration.
  2. SECONDARY: adaptive dopri5 (while mode) through the generic solver
     stack, reported as `adaptive_steps_per_sec`.

Baseline: the authentic reference implementation measured on this machine:
HybridODENN.forward (torch + scipy DOP853, serial per-subject callback
bridging) = 19.2 subjects/sec on CPU (batch=8, 61 points; measured
2026-08-16). vs_baseline = fused-path subjects/sec / 19.2.
"""

import json
import time

REFERENCE_SUBJECTS_PER_SEC = 19.2  # measured: /root/reference HybridODENN.forward, CPU


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import hybrid_ode_tpu as ht
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_trajectory
    from hybrid_ode_tpu.solvers.api import odeint

    N, T, SUB = 8192, 61, 4
    config = ht.HybridConfig(solver="dopri5", rtol=1e-5, atol=1e-7)
    params = ht.init_hybrid_params(jax.random.PRNGKey(0), config)
    params["nn"]["w4"] = 0.01 * jax.random.normal(jax.random.PRNGKey(2), params["nn"]["w4"].shape)

    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    y0s = jnp.abs(base[None, :] * (1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N, 6))))
    ts1 = jnp.linspace(0.0, 5.0, T)
    meal1 = jnp.zeros((T,)).at[12].set(2.0).at[36].set(1.5)
    tsB = jnp.broadcast_to(ts1, (N, T))
    mealB = jnp.broadcast_to(meal1, (N, T))
    tvnsB = jnp.zeros((N, T))

    # ---- primary: fused Pallas RK4 ----------------------------------------
    # Timing discipline for the axon remote-execution platform: distinct
    # inputs per rep (identical dispatches are deduped) AND a scalar
    # materialisation per rep (block_until_ready alone returns early for
    # queued remote work — measured 70us for a 30ms kernel).
    reps = 10
    y0_reps = [y0s * (1.0 + 1e-6 * i) for i in range(reps)]
    reducer = jax.jit(lambda x: x.sum())
    sync = lambda x: float(reducer(x))
    fused = lambda y: fused_rk4_trajectory(y, tsB, mealB, tvnsB, params["ode"], params["nn"], substeps=SUB)
    sync(fused(y0_reps[0]))  # compile both programs
    t0 = time.time()
    for y in y0_reps:
        sync(fused(y))
    dt_fused = (time.time() - t0) / reps
    fused_substeps = N * (T - 1) * SUB
    fused_sps = fused_substeps / dt_fused
    fused_subjects = N / dt_fused

    # ---- secondary: adaptive dopri5 through the generic stack -------------
    controls = Controls(ts=ts1, signals={"meal": meal1, "tVNS": jnp.zeros(T)})

    def one(y0):
        return odeint(
            lambda t, y, a: ht.hybrid_field(t, y, a, controls, config),
            y0, ts1, params,
            solver="dopri5", rtol=config.rtol, atol=config.atol,
            mode="while", max_steps_per_interval=32, return_stats=True,
        )

    sim = jax.jit(jax.vmap(one))
    outa, stats = sim(y0_reps[0]); sync(outa)
    t0 = time.time()
    for y in y0_reps[:5]:
        outa, stats = sim(y)
        sync(outa)
    dt_adapt = (time.time() - t0) / 5
    adapt_steps = int(jnp.sum(stats.n_accepted) + jnp.sum(stats.n_rejected))

    print(
        json.dumps(
            {
                "metric": "fused_rk4_substeps_per_sec",
                "value": round(fused_sps),
                "unit": "steps/s",
                "vs_baseline": round(fused_subjects / REFERENCE_SUBJECTS_PER_SEC, 1),
                "fused_subjects_per_sec": round(fused_subjects),
                "fused_rhs_evals_per_sec": round(fused_sps * 4),
                "adaptive_steps_per_sec": round(adapt_steps / dt_adapt),
                "adaptive_subjects_per_sec": round(N / dt_adapt),
                "cohort_size": N,
                "fused_wall_s": round(dt_fused, 5),
                "adaptive_wall_s": round(dt_adapt, 5),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
