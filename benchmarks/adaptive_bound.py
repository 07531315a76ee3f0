"""Is any headline workload adaptive-solver-bound? (round-3 perf question)

NOTES_NEXT_ROUND #1 asks whether a Pallas adaptive (dopri5) kernel is
warranted. This measures the decision input: steady-state train-step wall
for the SAME model/batch under (a) adaptive dopri5 through the generic
solver stack, (b) fixed-grid RK4 through the same stack, (c) the fused
Pallas RK4 kernel — plus each headline benchmark's solver choice.

If every throughput-critical benchmark already runs (c) and the adaptive
path appears only in protocol-parity/accuracy recipes (where wall is
dominated by 300-epoch convergence, minutes either way), an adaptive
Pallas kernel buys nothing headline-visible; the measured ratio here is
the evidence either way.

Writes results/adaptive_bound.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _time_steps(step, params, opt_state, batch, n=10):
    """Median steady-state step wall; varies inputs per rep (axon dedupes
    identical program+input dispatches) and materialises a scalar."""
    import jax.numpy as jnp

    walls = []
    for i in range(n + 2):  # 2 warmup reps (compile + cache fill)
        b = dict(batch)
        b["observations"] = batch["observations"] * (1.0 + 1e-6 * i)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, b)
        float(jnp.asarray(loss))  # force completion through the tunnel
        if i >= 2:
            walls.append(time.time() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=None,
                    help="comma-separated subset of variants to re-measure "
                         "(e.g. 'adaptive_dopri5_sync,fused_rk4_pallas'); "
                         "unmeasured arms are carried from the existing "
                         "artifact and annotated with the host they were "
                         "measured on (the per-sample lockstep arm costs a "
                         "~25 min cold compile)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import optax

    import hybrid_ode_tpu as ht
    from hybrid_ode_tpu.models.hybrid import hybrid_loss

    B, T = 256, 61
    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    key = jax.random.PRNGKey(0)
    y0 = jnp.abs(base[None, :] * (1 + 0.1 * jax.random.normal(key, (B, 6))))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 5.0, T), (B, T))
    obs = jnp.abs(base[None, None, :] * (1 + 0.08 * jax.random.normal(key, (B, T, 6))))
    batch = {
        "initial_state": y0, "observations": obs, "time_points": ts,
        "external_inputs": {
            "meal": jnp.zeros((B, T)).at[:, 12].set(2.0),
            "tVNS": jnp.zeros((B, T)),
        },
        "mask": jnp.ones((B, T)),
    }

    variants = {
        "adaptive_dopri5": ht.HybridConfig(solver="dopri5", rtol=1e-5, atol=1e-7,
                                           mode="scan"),
        # round 5: batch-SYNCHRONIZED adaptive stepping (solvers/sync.py) —
        # shared controller, two-pass gradients on the accepted mesh
        "adaptive_dopri5_sync": ht.HybridConfig(solver="dopri5", rtol=1e-5,
                                                atol=1e-7, mode="sync"),
        "fixed_rk4_xla": ht.HybridConfig(solver="rk4", substeps=4, mode="scan"),
        "fused_rk4_pallas": ht.HybridConfig(solver="rk4", substeps=4, mode="scan",
                                            use_pallas=True),
    }

    path = REPO / "results" / "adaptive_bound.json"
    prev = json.loads(path.read_text()) if path.exists() else {}
    subset = set(args.arms.split(",")) if args.arms else None
    out = {"batch": B, "points": T, "device": str(jax.devices()[0].device_kind)}
    if subset:
        for k, v in prev.items():
            if k.endswith("_step_ms") or k.endswith("_compile_plus_bench_s"):
                out[k] = v
        out["_carried_arms"] = sorted(
            v for v in variants if v not in subset)
        out["_carried_note"] = ("carried arms were measured earlier the same "
                                "round on a previous host (same chip kind); "
                                "re-measured arms: " + ",".join(sorted(subset)))
        variants = {k: v for k, v in variants.items() if k in subset}
    for name, cfg in variants.items():
        params = ht.init_hybrid_params(jax.random.PRNGKey(1), cfg)
        opt = optax.adam(1e-3)

        lkey = jax.random.PRNGKey(7)

        @jax.jit
        def step(p, s, b, cfg=cfg, opt=opt):
            loss, g = jax.value_and_grad(
                lambda pp: hybrid_loss(pp, b, lkey, cfg)[0])(p)
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s, loss

        t0 = time.time()
        wall = _time_steps(step, params, opt.init(params), batch)
        out[f"{name}_step_ms"] = round(1e3 * wall, 2)
        out[f"{name}_compile_plus_bench_s"] = round(time.time() - t0, 1)
        print(f"{name}: {out[f'{name}_step_ms']} ms/step")

    out["adaptive_vs_fused_ratio"] = round(
        out["adaptive_dopri5_step_ms"] / out["fused_rk4_pallas_step_ms"], 1)
    out["adaptive_sync_vs_fused_ratio"] = round(
        out["adaptive_dopri5_sync_step_ms"] / out["fused_rk4_pallas_step_ms"], 1)
    out["sync_speedup_vs_per_sample"] = round(
        out["adaptive_dopri5_step_ms"] / out["adaptive_dopri5_sync_step_ms"], 1)
    # where each headline benchmark actually spends its solver time
    out["headline_solver_usage"] = {
        "bench.py (throughput)": "fused rk4 (primary), dopri5 secondary metric only",
        "benchmarks/accuracy.py (4GI parity)": "rk4 substeps=4 (tuned recipe); dopri5 only in the 300-epoch protocol-parity arm",
        "benchmarks/mcmc_scale.py": "rk4 (both engines)",
        "benchmarks/subject_id.py": "rk4 substeps=4",
        "benchmarks/mimic_bench.py (ICU)": "dopri5 dense-output (training wall dominated by convergence, not solve)",
    }
    path = REPO / "results" / "adaptive_bound.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
