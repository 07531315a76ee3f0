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
    args = ap.parse_args()
    run(args)
