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
    import pandas as pd

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.evals.robustness import estimate_obs_sigma_z, robustness_report
    from hybrid_ode_tpu.models.hybrid import (
        HybridConfig, config_from_dict, init_hybrid_params,
    )
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    ds = create_data_arrays(str(REPO / args.data))
    _, _, test_ds = split_dataset(ds, seed=42)
    sigma_z = estimate_obs_sigma_z(ds, pd.read_csv(REPO / args.data))
    print("per-state obs sigma (z):", np.round(sigma_z, 3))

    out = {"_obs_sigma_z": [round(float(s), 4) for s in sigma_z]}

    # tuned hybrid checkpoint
    state, meta = load_checkpoint(args.checkpoint)
    config = config_from_dict(meta.get("config", {}))
    out["hybrid_tuned"] = robustness_report(
        state["params"], test_ds, config, obs_sigma_z=sigma_z,
    )
    print("hybrid:", out["hybrid_tuned"])

    # mechanistic-only baseline (default Table-I parameters, no training —
    # matching the manuscript's flat "Mech." column)
    import jax

    mech_cfg = HybridConfig(solver="dopri5", use_nn=False, mode="while")
    mech_params = init_hybrid_params(jax.random.PRNGKey(0), mech_cfg)
    out["mech_only"] = robustness_report(
        mech_params, test_ds, mech_cfg, obs_sigma_z=sigma_z,
    )
    print("mech:", out["mech_only"])

    out["_manuscript_targets_mmol"] = {
        "missing": {"0.1": {"mech": 2.260, "hybrid": 1.238},
                    "0.3": {"mech": 2.260, "hybrid": 1.593},
                    "0.5": {"mech": 2.260, "hybrid": 1.902}},
        "noise_2sigma": {"mech": 2.260, "hybrid": 8.292},
    }
    out["_protocol"] = (
        "corruption applied to the conditioning data (initial state + "
        "context-encoder observations); glucose RMSE in mmol/L vs CLEAN "
        "observations over the full horizon, seed-42 test windows"
    )
    path = REPO / "results" / "robustness.json"
    path.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/4gi_dataset.csv")
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints" / "accuracy_benchmark" / "best_model"))
    args = ap.parse_args()
    run(args)
