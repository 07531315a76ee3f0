"""NUTS posterior arm for the UQ/calibration table (VERDICT r3 #3).

The NUTS sampler is the statistically strongest posterior the framework
owns (multinomial NUTS, R-hat <= 1.014 at scale — results/mcmc_scale.json)
but had never been scored for calibration. This benchmark:

  1. runs `run_nuts(include_nn='last')` — 7 ODE parameters with the
     reference's informative priors + the MLP's zero-init OUTPUT layer
     (graded functional uncertainty, mirroring what made the VI arm's UQ
     tractable; VERDICT r3 missing #4) — conditioned on the TRAIN split
     with per-state moment-matched observation noise;
  2. draws the posterior predictive from thinned NUTS samples on the same
     val/test splits as the VI and deep-ensemble arms (seed-42 split of
     data/4gi_dataset.csv);
  3. scores ECE / coverage@80/90/95 / NLL / CRPS raw and per-state
     recalibrated (val floor 0.96 — the same convention as the VI arms in
     benchmarks/uq_calibration.py, so rows stay comparable);
  4. appends the arm to results/uq_calibration.json.

Reference parity: the reference merely plumbs its placeholder sampler's
output to .npz (`/root/reference/inference/mcmc.py:252-318`,
`train_hybrid.py:496-516`) — its posterior never reaches any calibration
metric. The manuscript's UQ table (manuscript.tex:707-720) is the target.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.uq_calibration import metrics_at  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints" / "accuracy_benchmark_r2" / "best_model"))
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--predictive-samples", type=int, default=100)
    ap.add_argument("--include-nn", choices=["last", "full"], default="last",
                    help="'last' = zero-init output layer only (~1k dims); "
                         "'full' = ALL NN weights jointly with the 7 ODE "
                         "params (~13k dims, VERDICT r4 #7; reference "
                         "priors at /root/reference/inference/mcmc.py:60-81)")
    ap.add_argument("--dense-mass", action="store_true",
                    help="Laplace-whiten the 7-dim ODE block (run_nuts "
                         "dense_mass=True) — fixes the round-4 ridge "
                         "stranding (split-R-hat 7-85 at diagonal mass)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from hybrid_ode_tpu.data.dataset import (
        batch_iterator, create_data_arrays, pad_batch, split_dataset)
    from hybrid_ode_tpu.evals.evaluate import fit_observation_noise
    from hybrid_ode_tpu.evals.metrics import fit_per_state_recalibration
    from hybrid_ode_tpu.inference.mcmc import compute_ess, rhat, run_nuts
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward, config_from_dict, controls_from_batch,
        flat_to_params, with_context)
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    state, meta = load_checkpoint(args.checkpoint)
    cfg_dict = meta["config"]
    config = config_from_dict(cfg_dict)
    params = state["params"]

    ds = create_data_arrays(str(REPO / "data" / "4gi_dataset.csv"),
                            sequence_length=61,
                            stride=cfg_dict["data"].get("stride", 30))
    tr, va, te = split_dataset(ds, seed=42)
    print(f"windows: train {len(tr)} / val {len(va)} / test {len(te)}",
          flush=True)

    # per-state moment-matched observation noise from the MAP point
    # estimate on val — the likelihood temperature AND the predictive floor.
    # FLOORED at 0.1 z-units: the placeholder-ish GE/FFA channels fit to
    # ~0.004-0.008 RMS, which would weight them 60,000:1 in the likelihood
    # and freeze the chains on razor ridges (measured: R-hat up to 1e16 at
    # the raw sigmas; accept 0.85 but ESS == n_chains). 0.1 = 1/10 of the
    # z-scored state scale, the minimum credible measurement noise.
    sigma = fit_observation_noise(params, va, config, batch_size=8)
    sigma = np.maximum(sigma, 0.1)
    print("noise sigma per state (floored):", np.round(sigma, 4), flush=True)

    # ---- sample: condition on the full train split ----
    include_nn = True if args.include_nn == "full" else "last"
    arm_key = ("nuts_full_joint" if args.include_nn == "full"
               else "nuts_last_layer")
    train_batch = tr.batch(np.arange(len(tr)))
    t0 = time.time()
    out = run_nuts(params, train_batch, config,
                   key=jax.random.PRNGKey(0),
                   num_samples=args.samples, num_warmup=args.warmup,
                   n_chains=args.chains, max_depth=args.max_depth,
                   noise_sigma=jnp.asarray(sigma, jnp.float32),
                   include_nn=include_nn, dense_mass=args.dense_mass)
    wall_sample = time.time() - t0

    # diagnostics on the 7 ODE marginals
    diag = {}
    for name in list(out):
        if not name.startswith("ode_"):
            continue
        chains = np.asarray(out[name]).reshape(args.chains, args.samples)
        diag[name] = {"rhat": round(float(rhat(chains)), 4),
                      "ess_bulk": round(float(compute_ess(chains)), 1)}
    accept = float(np.mean(out["_accept_stat"]))
    div_rate = float(np.mean(out["_diverging"]))
    print(f"sampled in {wall_sample:.0f}s, accept {accept:.3f}, "
          f"divergence rate {div_rate:.4f}", flush=True)
    print(json.dumps(diag, indent=1), flush=True)

    # ---- posterior predictive on val/test ----
    total = args.chains * args.samples
    thin_idx = np.linspace(0, total - 1, args.predictive_samples).astype(int)
    sample_keys = [k for k in out if not k.startswith("_")]
    stacked = {k: jnp.asarray(np.asarray(out[k])[thin_idx]) for k in sample_keys}

    def one_sample_forward(flat_sample, b, controls):
        merged = flat_to_params(flat_sample, params)
        return batched_forward(merged, b["initial_state"], b["time_points"],
                               controls, config)

    def collect(split, batch_size=8):
        preds, uncs, targs, masks = [], [], [], []
        for batch in batch_iterator(split, batch_size, shuffle=False):
            b, valid = pad_batch(batch, batch_size)
            b = {k: (jnp.asarray(v) if not isinstance(v, dict) else
                     {kk: jnp.asarray(vv) for kk, vv in v.items()})
                 for k, v in b.items()}
            controls = with_context(params, b, controls_from_batch(b), config)
            nb = int(valid.sum())
            trajs = jax.jit(jax.vmap(one_sample_forward,
                                     in_axes=(0, None, None)))(
                stacked, b, controls)  # (M, B, T, 6)
            mean = np.asarray(jnp.mean(trajs, axis=0))[:nb]
            std = np.asarray(jnp.std(trajs, axis=0))[:nb]
            preds.append(mean)
            uncs.append(np.sqrt(std**2 + np.asarray(sigma)[None, None, :]**2))
            targs.append(np.asarray(b["observations"])[:nb])
            masks.append(np.asarray(b["mask"])[:nb])
        return (np.concatenate(preds), np.concatenate(uncs),
                np.concatenate(targs), np.concatenate(masks))

    pv, uv, tv, mv = collect(va)
    pt, ut, tt, mt = collect(te)
    np.savez(REPO / "results" / f"uq_arrays_{arm_key}.npz",
             pv=pv, uv=uv, tv=tv, mv=mv, pt=pt, ut=ut, tt=tt, mt=mt)

    # same recalibration convention as the VI arms (floor 0.96 on val)
    s_vec = fit_per_state_recalibration(pv, uv, tv, mask=mv,
                                        min_coverage_95=0.96)

    n_dim = 7 + sum(int(np.prod(np.shape(v))) for k, v in params["nn"].items()
                    ) if args.include_nn == "full" else None
    arm = {
        "sampler": f"NUTS include_nn={args.include_nn!r}, {args.chains} "
                   f"chains x ({args.warmup}+{args.samples}), "
                   f"max_depth {args.max_depth}"
                   + (", dense-mass (Laplace-whitened ODE block)"
                      if args.dense_mass else "")
                   + (f", dim {n_dim}" if n_dim else ""),
        "conditioned_on": f"train split ({len(tr)} windows)",
        "noise_sigma_per_state": [round(float(x), 4) for x in sigma],
        "accept_stat": round(accept, 4),
        "divergence_rate": round(div_rate, 5),
        "diagnostics": diag,
        "sample_wall_s": round(wall_sample, 1),
        "recalibration_per_state_val": [round(float(x), 4) for x in s_vec],
        "test_raw": metrics_at(pt, ut, tt, mt, 1.0),
        "test_recalibrated_per_state": metrics_at(pt, ut * s_vec, tt, mt, 1.0),
    }
    print(json.dumps(arm, indent=1), flush=True)

    path = REPO / "results" / "uq_calibration.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    results[arm_key] = arm
    path.write_text(json.dumps(results, indent=2))
    print(f"wrote {path} [{arm_key}]")


if __name__ == "__main__":
    main()
