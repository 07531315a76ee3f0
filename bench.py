"""Benchmark: batched hybrid-ODE cohort simulation throughput on TPU.

Prints ONE JSON line:
    {"metric": "ode_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N, ...secondary fields}

Workload: an 8192-subject cohort, each integrated with adaptive dopri5
(while mode) over 61 output points of the full hybrid (mechanistic + MLP
residual) vector field — the reference's core forward workload
(`models/hybrid_ode_nn.py:136-261`) at production scale.

Baseline: the authentic reference implementation measured on this machine:
HybridODENN.forward (torch + scipy DOP853, serial per-subject callback
bridging) achieves 19.2 subjects/sec on CPU (batch=8, 61 points; measured
2026-08-16). vs_baseline compares subjects/sec against that number.
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
    from hybrid_ode_tpu.solvers.api import odeint

    N_SUBJECTS = 8192
    T = 61
    config = ht.HybridConfig(solver="dopri5", rtol=1e-5, atol=1e-7)

    params = ht.init_hybrid_params(jax.random.PRNGKey(0), config)
    # small nonzero residual so the NN path does real work
    params["nn"]["w4"] = 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), params["nn"]["w4"].shape
    )

    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    y0s = jnp.abs(
        base[None, :] * (1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N_SUBJECTS, 6)))
    )
    ts = jnp.linspace(0.0, 5.0, T)
    meal = jnp.zeros((T,)).at[12].set(2.0).at[36].set(1.5)  # two meals
    controls = Controls(ts=ts, signals={"meal": meal, "tVNS": jnp.zeros(T)})

    def one(y0):
        return odeint(
            lambda t, y, a: ht.hybrid_field(t, y, a, controls, config),
            y0, ts, params,
            solver="dopri5", rtol=config.rtol, atol=config.atol,
            mode="while", max_steps_per_interval=32, return_stats=True,
        )

    sim = jax.jit(jax.vmap(one))

    # compile + warmup
    out, stats = sim(y0s)
    out.block_until_ready()

    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out, stats = sim(y0s)
    out.block_until_ready()
    dt = (time.time() - t0) / reps

    total_steps = int(jnp.sum(stats.n_accepted) + jnp.sum(stats.n_rejected))
    steps_per_sec = total_steps / dt
    subjects_per_sec = N_SUBJECTS / dt
    rhs_evals_per_sec = steps_per_sec * 7  # dopri5: 7 stages (6 new w/ FSAL) + err

    print(
        json.dumps(
            {
                "metric": "ode_steps_per_sec",
                "value": round(steps_per_sec),
                "unit": "steps/s",
                "vs_baseline": round(subjects_per_sec / REFERENCE_SUBJECTS_PER_SEC, 1),
                "subjects_per_sec": round(subjects_per_sec),
                "rhs_evals_per_sec": round(rhs_evals_per_sec),
                "cohort_size": N_SUBJECTS,
                "wall_s": round(dt, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
