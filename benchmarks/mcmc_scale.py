"""NUTS scaling benchmark: parallel chains on the hybrid-model posterior.

BASELINE.json target: "NUTS MCMC posterior over ODE params, 1k+ parallel
chains". The reference's sampler is a serial random-walk Metropolis costing
one full ODE solve per proposal (~3000 serial solves per run,
`inference/mcmc.py:125-164`). Here every NUTS transition advances ALL chains
in lockstep, gradients flowing through the solve.

Usage: python benchmarks/mcmc_scale.py [--chains 1024] [--samples 100]
Prints one JSON line with chains, draws/sec, leapfrogs/sec, R-hat.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=13)
    ap.add_argument("--engine", choices=["xla", "fused"], default="xla",
                    help="'fused' maps chains x subjects onto the Pallas "
                         "kernel's batch lanes (one fused fwd+adjoint per "
                         "leapfrog across ALL chains)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from hybrid_ode_tpu.inference.mcmc import ess_bulk, ess_tail, rhat, run_nuts
    from hybrid_ode_tpu.models.hybrid import HybridConfig, init_hybrid_params

    config = HybridConfig(solver="rk4", substeps=2, mode="scan",
                          nn_hidden=32, nn_layers=2)
    params = init_hybrid_params(jax.random.PRNGKey(0), config)

    B, T = args.batch, args.points
    key = jax.random.PRNGKey(1)
    base = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    batch = {
        "initial_state": jnp.abs(base[None, :] * (1 + 0.05 * jax.random.normal(key, (B, 6)))),
        "observations": jnp.broadcast_to(base, (B, T, 6)) * 1.02,
        "time_points": jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T)),
        "external_inputs": {"meal": jnp.zeros((B, T)), "tVNS": jnp.zeros((B, T))},
        "mask": jnp.ones((B, T)),
    }

    t0 = time.time()
    samples = run_nuts(
        params, batch, config, key=jax.random.PRNGKey(2),
        num_samples=args.samples, num_warmup=args.warmup,
        n_chains=args.chains, max_depth=args.max_depth,
        engine=args.engine,
    )
    wall = time.time() - t0

    total_draws = args.chains * args.samples
    # worst-case leapfrogs per transition = 2^max_depth - 1 per doubling sum
    lf_per_transition = 2**args.max_depth - 1
    total_transitions = args.chains * (args.samples + args.warmup)
    a = samples["ode_a_GI"].reshape(args.chains, args.samples)
    result = {
        "chains": args.chains,
        "samples_per_chain": args.samples,
        "warmup": args.warmup,
        "max_depth": args.max_depth,
        "draws_per_sec": round(total_draws / wall),
        "transitions_per_sec": round(total_transitions / wall),
        "max_leapfrogs_per_sec": round(total_transitions * lf_per_transition / wall),
        "wall_s": round(wall, 2),
        # Vehtari et al. (2021) rank-normalized diagnostics (round 3)
        "rhat_a_GI": round(rhat(a), 4),
        "ess_bulk_a_GI": round(ess_bulk(a)),
        "ess_tail_a_GI": round(ess_tail(a)),
        "posterior_mean_a_GI": round(float(a.mean()), 6),
        "accept_stat": round(float(samples["_accept_stat"].mean()), 3),
        "divergence_rate": round(float(samples["_diverging"].mean()), 4),
        "device": str(jax.devices()[0].device_kind),
        "engine": args.engine,
    }
    print(json.dumps(result))
    name = "mcmc_scale.json" if args.engine == "xla" else f"mcmc_scale_{args.engine}.json"
    out = Path(__file__).resolve().parents[1] / "results" / name
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
