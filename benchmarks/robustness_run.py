"""Robustness benchmark: corrupted-conditioning sweeps on TRAINED checkpoints.

Runs evals/robustness.py's missingness + noise protocol (corruption hits the
data the model conditions on; scoring is vs clean observations) with the
tuned hybrid checkpoint and a mechanistic-only baseline, producing the
measured counterpart of manuscript.tex:396-410 (mech 2.260 flat / hybrid
1.238-1.902 under missingness, hybrid 8.292 at 2sigma noise).

Usage: python benchmarks/robustness_run.py
Writes results/robustness.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(args):
    import dataclasses

    import pandas as pd

    from hybrid_ode_tpu.data.dataset import create_data_arrays
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.evals.robustness import estimate_obs_sigma_z, robustness_report
    from hybrid_ode_tpu.models.hybrid import (
        HybridConfig, config_from_dict, init_hybrid_params,
    )
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    # fresh simulated cohort (unseen subjects, decent statistics — the
    # shipped test split is only 2 windows) evaluated in the POPULATION
    # model's normalisation frame
    state, meta = load_checkpoint(args.checkpoint)
    config = config_from_dict(meta.get("config", {}))
    cohort_csv = REPO / "results" / "robustness_cohort.csv"
    generate_4gi_dataset(path=str(cohort_csv), seed=args.seed,
                         n_subjects=args.subjects)
    test_ds = create_data_arrays(str(cohort_csv))
    pop_mean = np.asarray(meta["state_mean"], np.float32)
    pop_std = np.asarray(meta["state_std"], np.float32)
    obs_phys = test_ds.observations * test_ds.state_std + test_ds.state_mean
    init_phys = test_ds.initial_state * test_ds.state_std + test_ds.state_mean
    test_ds = dataclasses.replace(
        test_ds,
        observations=((obs_phys - pop_mean) / pop_std).astype(np.float32),
        initial_state=((init_phys - pop_mean) / pop_std).astype(np.float32),
        state_mean=pop_mean, state_std=pop_std,
    )
    sigma_z = estimate_obs_sigma_z(test_ds, pd.read_csv(cohort_csv))
    print("per-state obs sigma (z):", np.round(sigma_z, 3))

    out = {"_obs_sigma_z": [round(float(s), 4) for s in sigma_z]}

    out["hybrid_tuned"] = robustness_report(
        state["params"], test_ds, config, obs_sigma_z=sigma_z, n_seeds=args.n_seeds,
    )
    print("hybrid:", out["hybrid_tuned"])

    if args.ensemble > 1:
        # K-member ensemble of the SAME recipe, trained on the same shipped
        # cohort; the deployed estimator is the ensemble-mean rollout
        import dataclasses as _dc
        import time

        import jax

        from hybrid_ode_tpu.data.dataset import (
            batch_iterator, pad_batch, split_dataset,
        )
        from hybrid_ode_tpu.parallel.ensemble import init_ensemble, train_ensemble
        from hybrid_ode_tpu.train.loop import make_optimizer

        ens_cfg = _dc.replace(config, use_pallas=False)  # vmaps member weights
        train_all = create_data_arrays(args.data)
        tr, va, _ = split_dataset(train_all, seed=42)
        tcfg = meta.get("config", {}).get("training", {})
        bs = 8
        batches = [pad_batch(b, bs)[0] for b in batch_iterator(tr, bs, shuffle=False)]
        val_b = [pad_batch(b, bs)[0] for b in batch_iterator(va, bs, shuffle=False)]
        epochs = tcfg.get("epochs", 3000)
        opt = make_optimizer(tcfg.get("learning_rate", 3e-3), epochs, len(batches),
                             tcfg.get("gradient_clip", 5.0),
                             train_ode_params=tcfg.get("train_ode_params", True))
        t0 = time.time()
        stacked, best_val, _ = train_ensemble(
            init_ensemble(jax.random.PRNGKey(0), ens_cfg, args.ensemble),
            opt, ens_cfg, batches, val_b, jax.random.PRNGKey(1), epochs,
            lambda1=tcfg.get("lambda1", 0.0), lambda2=tcfg.get("lambda2", 0.01),
            use_physics=False)
        print(f"ensemble trained ({time.time()-t0:.0f}s), best val {best_val}")
        out["hybrid_ensemble"] = robustness_report(
            stacked, test_ds, ens_cfg, obs_sigma_z=sigma_z,
            n_seeds=args.n_seeds, ensemble=True,
        )
        out["hybrid_ensemble"]["n_members"] = args.ensemble
        print("ensemble:", out["hybrid_ensemble"])

    # mechanistic-only baseline (default Table-I parameters, no training —
    # matching the manuscript's flat "Mech." column)
    import jax

    mech_cfg = HybridConfig(solver="dopri5", use_nn=False, mode="while")
    mech_params = init_hybrid_params(jax.random.PRNGKey(0), mech_cfg)
    out["mech_only"] = robustness_report(
        mech_params, test_ds, mech_cfg, obs_sigma_z=sigma_z, n_seeds=args.n_seeds,
    )
    print("mech:", out["mech_only"])

    out["_manuscript_targets_mmol"] = {
        "missing": {"0.1": {"mech": 2.260, "hybrid": 1.238},
                    "0.3": {"mech": 2.260, "hybrid": 1.593},
                    "0.5": {"mech": 2.260, "hybrid": 1.902}},
        "noise_2sigma": {"mech": 2.260, "hybrid": 8.292},
    }
    out["_protocol"] = (
        f"corruption applied to the conditioning data (initial state + "
        f"context-encoder observations); glucose RMSE in mmol/L vs CLEAN "
        f"observations over the full horizon; fresh {args.subjects}-subject "
        f"simulated cohort, {args.n_seeds} corruption seeds averaged"
    )
    path = REPO / "results" / "robustness.json"
    path.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/4gi_dataset.csv")
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints" / "accuracy_benchmark" / "best_model"))
    ap.add_argument("--subjects", type=int, default=50)
    ap.add_argument("--n-seeds", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--ensemble", type=int, default=8,
                    help="add a K-member ensemble-mean row (0/1 disables)")
    args = ap.parse_args()
    run(args)
