"""Benchmark: hybrid-ODE cohort simulation throughput on TPU.

Prints ONE JSON line:
    {"metric": "fused_rk4_substeps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N, ...secondary fields}

Workloads (8192-subject cohort, 61 output points, full hybrid field =
mechanistic 6-state drift + 4x64 MLP residual — the reference's core forward
workload `models/hybrid_ode_nn.py:136-261` at production scale):

  1. PRIMARY: Pallas fused full-trajectory RK4 kernel (ops/pallas_rk4.py) —
     states + weights resident in VMEM for the whole integration.
  2. train_step_ms: full fwd+bwd through the custom-VJP adjoint kernel.
  3. SECONDARY: adaptive dopri5 with the batch-SYNCHRONIZED shared step
     controller (solvers/sync.py, round 5) as `adaptive_steps_per_sec` —
     this is the framework's production adaptive path for cohort batches;
     the per-sample while-mode number rides along as
     `adaptive_async_steps_per_sec` for comparison.

Timing discipline (round 3): kernel calls are AMORTIZED — N_INNER calls with
per-iteration input variation run inside ONE dispatched `lax.scan` program,
and the wall is divided by N_INNER. The axon remote-execution tunnel costs
~29 ms per dispatch round-trip (measured; `dispatch_overhead_ms` below),
which swamped the 4.8 ms kernel when timed one-call-per-dispatch — rounds
1-2 reported 62M substeps/s for a kernel actually running at ~400M. Inputs
still vary per iteration (axon dedupes identical program+input pairs) and a
scalar materialisation forces completion.

Baseline: the authentic reference implementation measured on this machine:
HybridODENN.forward (torch + scipy DOP853, serial per-subject callback
bridging) = 19.2 subjects/sec on CPU (batch=8, 61 points; measured
2026-08-16). vs_baseline = fused-path subjects/sec / 19.2.
"""

import json
import time

REFERENCE_SUBJECTS_PER_SEC = 19.2  # measured: /root/reference HybridODENN.forward, CPU


def _tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the axon TPU tunnel in a SUBPROCESS with a hard timeout.

    The tunnel occasionally wedges (jax.devices() blocks forever in-process,
    observed 2026-08-18); a probe child can be killed, the parent cannot."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); import sys; "
             "sys.exit(0 if d and d[0].platform != 'cpu' else 1)"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    tpu_ok = _tpu_reachable()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    if not tpu_ok:
        # fallback: produce an honest (flagged) CPU measurement instead of
        # hanging the driver; XLA:CPU rk4 scan replaces the Pallas kernels
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import hybrid_ode_tpu as ht
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.solvers.api import odeint

    if tpu_ok:
        from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_hybrid, fused_rk4_trajectory

        N, T, SUB = 8192, 61, 4
        N_INNER, N_GRAD, N_ADAPT = 20, 8, 5
    else:
        N, T, SUB = 256, 61, 4
        N_INNER, N_GRAD, N_ADAPT = 2, 1, 1
        _cfg_rk4 = ht.HybridConfig(solver="rk4", substeps=SUB, mode="scan")

        def fused_rk4_trajectory(y, ts, meal, tvns, ode, nn, substeps=SUB):
            ctrl = Controls(ts=ts, signals={"meal": meal, "tVNS": tvns})
            return ht.batched_forward({"ode": ode, "nn": nn}, y, ts, ctrl,
                                      _cfg_rk4)

        fused_rk4_hybrid = fused_rk4_trajectory
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

    # ---- dispatch overhead (reported for transparency) --------------------
    # This is the axon tunnel's per-call round-trip on a trivial jitted
    # scalar program (x+1): pure transport, zero compute. It bounds every
    # UN-chunked interactive call from below and is outside the framework
    # (a collocated host pays ~0). The r3->r4 "regression" (25.9 -> 35.2 ms)
    # was sample noise in a 10-call MEAN over a jittery WAN path; report the
    # MIN (the latency floor, stable across sessions) and keep the mean for
    # jitter visibility.
    bump = jax.jit(lambda x: x + 1.0)
    float(bump(jnp.float32(0)))
    rtts = []
    for i in range(30):
        t0 = time.time()
        float(bump(jnp.float32(i)))
        rtts.append(time.time() - t0)
    dispatch_ms = min(rtts) * 1e3
    dispatch_mean_ms = sum(rtts) / len(rtts) * 1e3

    # ---- primary: fused Pallas RK4, amortized -----------------------------
    @jax.jit
    def many_fwd(seed):
        def body(c, i):
            y = y0s * (1.0 + 1e-6 * (seed + i))
            tr = fused_rk4_trajectory(y, tsB, mealB, tvnsB,
                                      params["ode"], params["nn"], substeps=SUB)
            return c + tr[:, -1, 0].sum(), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(N_INNER, dtype=jnp.float32))
        return out

    float(many_fwd(jnp.float32(0)))  # compile
    t0 = time.time()
    float(many_fwd(jnp.float32(1)))
    dt_fused = (time.time() - t0) / N_INNER
    fused_substeps = N * (T - 1) * SUB
    fused_sps = fused_substeps / dt_fused
    fused_subjects = N / dt_fused

    # ---- secondary: H=128 (the tuned/ICU flagship width) ------------------
    # H=64 fills only 64/128 of the MXU tile in M and K (25% array ceiling);
    # H=128 confirms the roofline analysis: sustained FLOP/s ~2.3x higher
    cfg128 = ht.HybridConfig(solver="rk4", nn_hidden=128)
    p128 = ht.init_hybrid_params(jax.random.PRNGKey(0), cfg128)
    p128["nn"]["w4"] = 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), p128["nn"]["w4"].shape)

    @jax.jit
    def many_fwd128(seed):
        def body(c, i):
            y = y0s * (1.0 + 1e-6 * (seed + i))
            tr = fused_rk4_trajectory(y, tsB, mealB, tvnsB,
                                      p128["ode"], p128["nn"], substeps=SUB)
            return c + tr[:, -1, 0].sum(), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(N_INNER, dtype=jnp.float32))
        return out

    float(many_fwd128(jnp.float32(0)))
    t0 = time.time()
    float(many_fwd128(jnp.float32(1)))
    dt_128 = (time.time() - t0) / N_INNER
    h128_sps = fused_substeps / dt_128
    # per-sample-substep MLP FLOPs at H: 4 RK stages x 2x(9H + 2H^2 + 6H) MACs
    h128_tflops = h128_sps * 4 * 2 * (9 * 128 + 2 * 128 * 128 + 6 * 128) / 1e12

    # ---- train step: fwd + custom-VJP backward kernel, amortized ----------
    tgt = y0s[:, None, :] * jnp.ones((1, T, 1))

    def loss(p, y):
        pred = fused_rk4_hybrid(y, tsB, mealB, tvnsB, p["ode"], p["nn"], substeps=SUB)
        return jnp.sum((pred - tgt) ** 2)

    @jax.jit
    def many_grad(seed):
        def body(c, i):
            y = y0s * (1.0 + 1e-6 * (seed + i))
            g = jax.grad(loss)(params, y)
            return c + g["nn"]["w2"].sum(), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(N_GRAD, dtype=jnp.float32))
        return out

    float(many_grad(jnp.float32(0)))
    t0 = time.time()
    float(many_grad(jnp.float32(1)))
    dt_grad = (time.time() - t0) / N_GRAD

    # ---- secondary: adaptive dopri5 through the generic stack -------------
    controls = Controls(ts=ts1, signals={"meal": meal1, "tVNS": jnp.zeros(T)})

    def one(y0):
        return odeint(
            lambda t, y, a: ht.hybrid_field(t, y, a, controls, config),
            y0, ts1, params,
            solver="dopri5", rtol=config.rtol, atol=config.atol,
            mode="while", max_steps_per_interval=32, return_stats=True,
        )

    sim = jax.vmap(one)

    @jax.jit
    def many_adapt(seed):
        def body(c, i):
            y = y0s * (1.0 + 1e-6 * (seed + i))
            out, stats = sim(y)
            return c + out[:, -1, 0].sum(), jnp.sum(stats.n_accepted + stats.n_rejected)
        out, steps = jax.lax.scan(body, 0.0, jnp.arange(N_ADAPT, dtype=jnp.float32))
        return out, steps[0]

    _, adapt_steps = many_adapt(jnp.float32(0))
    float(adapt_steps)
    t0 = time.time()
    out, adapt_steps = many_adapt(jnp.float32(1))
    float(out)
    dt_adapt = (time.time() - t0) / N_ADAPT
    adapt_steps = int(adapt_steps)

    # ---- adaptive dopri5, batch-SYNCHRONIZED controller (round 5) ---------
    # One shared step controller for the whole cohort (accept on the
    # batch-max error norm, solvers/sync.py): removes the per-sample
    # lockstep waste of vmapped while-mode stepping. Work accounting: each
    # shared accepted step advances ALL N samples, so sample-steps =
    # N x shared accepted (sync does not log rejects — the count is
    # slightly CONSERVATIVE vs the while-mode accepted+rejected sum).
    controlsB = Controls(ts=tsB, signals={"meal": mealB, "tVNS": tvnsB})

    @jax.jit
    def many_sync(seed):
        def body(c, i):
            y = y0s * (1.0 + 1e-6 * (seed + i))
            out, stats = ht.batched_forward(
                params, y, tsB, controlsB, config,
                mode="sync", return_stats=True)
            return c + out[:, -1, 0].sum(), (stats.n_accepted
                                             + stats.n_rejected)
        out, steps = jax.lax.scan(body, 0.0, jnp.arange(N_ADAPT, dtype=jnp.float32))
        return out, steps[0]

    _, sync_shared = many_sync(jnp.float32(0))
    float(sync_shared)
    t0 = time.time()
    out, sync_shared = many_sync(jnp.float32(1))
    float(out)
    dt_sync = (time.time() - t0) / N_ADAPT
    sync_steps = int(sync_shared) * N

    print(
        json.dumps(
            {
                "metric": "fused_rk4_substeps_per_sec",
                "value": round(fused_sps),
                "unit": "steps/s",
                "vs_baseline": round(fused_subjects / REFERENCE_SUBJECTS_PER_SEC, 1),
                "fused_subjects_per_sec": round(fused_subjects),
                "fused_rhs_evals_per_sec": round(fused_sps * 4),
                "train_step_ms": round(dt_grad * 1e3, 2),
                "fused_h128_substeps_per_sec": round(h128_sps),
                "fused_h128_tflops": round(h128_tflops, 1),
                "adaptive_steps_per_sec": round(sync_steps / dt_sync),
                "adaptive_subjects_per_sec": round(N / dt_sync),
                "adaptive_sync_wall_s": round(dt_sync, 5),
                "adaptive_async_steps_per_sec": round(adapt_steps / dt_adapt),
                "adaptive_async_subjects_per_sec": round(N / dt_adapt),
                "cohort_size": N,
                "fused_wall_s": round(dt_fused, 5),
                "adaptive_wall_s": round(dt_adapt, 5),
                "dispatch_overhead_ms": round(dispatch_ms, 1),
                "dispatch_overhead_mean_ms": round(dispatch_mean_ms, 1),
                "n_inner_amortized": N_INNER,
                "device": str(jax.devices()[0]),
                "platform": "tpu" if tpu_ok else "cpu_fallback_tunnel_down",
            }
        )
    )


if __name__ == "__main__":
    main()
