"""Online per-subject adaptation benchmark (manuscript.tex:642-654 protocol).

The manuscript reports per-subject RMSE after adapting on 6/12/24 h of a
subject's stream (batch re-train 0.86/0.78/0.70, online 0.82/0.72/0.65
mmol/L) — with NO code shipped and no stream that long in its dataset (the
4GI windows are 5 h). Here the experiment is actually runnable: simulate a
fresh long-duration cohort with the 4GI generator (truth known), take a
population model trained on the shipped 5 h cohort, adapt per subject on the
first 6/12/24 h, and score glucose RMSE on the remaining stream — vs noisy
observations and vs simulator truth.

Rows: no adaptation / batch re-train (anchor 0) / anchored online (ours).

Usage: python benchmarks/online_adapt.py [--checkpoint checkpoints/accuracy_benchmark/best_model]
Writes results/online_adaptation.json.
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

HORIZONS = (6.0, 12.0, 24.0)
STREAM_HOURS = 30.0
MEALS = ((1.0, 75.0), (5.0, 50.0), (9.5, 60.0), (25.0, 75.0), (28.5, 50.0))


def run(args):
    import pandas as pd

    from hybrid_ode_tpu.data.dataset import create_data_arrays
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.train.online import online_adaptation_eval
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    state, meta = load_checkpoint(args.checkpoint)
    params = state["params"]
    config = config_from_dict(meta.get("config", {}))

    stream_csv = REPO / "results" / "online_stream_cohort.csv"
    generate_4gi_dataset(
        path=str(stream_csv), seed=args.seed, n_subjects=args.subjects,
        duration_hours=STREAM_HOURS,
        meal_times=[m for m, _ in MEALS], meal_sizes=[s for _, s in MEALS],
    )
    T = int(STREAM_HOURS * 12) + 1  # 5-min grid
    ds = create_data_arrays(str(stream_csv), sequence_length=T, stride=T)
    # score in the population model's normalisation frame
    pop_mean = np.asarray(meta["state_mean"], np.float32)
    pop_std = np.asarray(meta["state_std"], np.float32)
    import dataclasses

    obs_phys = ds.observations * ds.state_std + ds.state_mean
    init_phys = ds.initial_state * ds.state_std + ds.state_mean
    ds = dataclasses.replace(
        ds,
        observations=((obs_phys - pop_mean) / pop_std).astype(np.float32),
        initial_state=((init_phys - pop_mean) / pop_std).astype(np.float32),
        state_mean=pop_mean, state_std=pop_std,
    )

    rows = {}
    for name, steps, anchor in [
        ("no_adaptation", 0, 0.0),
        ("batch_retrain_anchor0", args.steps, 0.0),
        ("online_anchored", args.steps, args.anchor),
    ]:
        t0 = time.time()
        res = online_adaptation_eval(
            params, ds, config, horizons_hours=HORIZONS,
            adapt_steps=steps, learning_rate=args.lr, anchor_weight=anchor,
        )
        rows[name] = {str(h): round(v, 4) for h, v in res.items()}
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, rows[name])

    rows["_manuscript_targets_mmol"] = {
        "batch_retrain": {"6.0": 0.86, "12.0": 0.78, "24.0": 0.70},
        "online": {"6.0": 0.82, "12.0": 0.72, "24.0": 0.65},
    }
    rows["_protocol"] = (
        f"fresh {args.subjects}-subject {STREAM_HOURS}h simulated streams "
        f"(meals at {[m for m, _ in MEALS]}h); population checkpoint "
        f"{args.checkpoint}; adapt NN on first h hours ({args.steps} steps, "
        f"lr {args.lr}), glucose RMSE on the remainder vs noisy obs (mmol/L)"
    )
    out = REPO / "results" / "online_adaptation.json"
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints" / "accuracy_benchmark" / "best_model"))
    ap.add_argument("--subjects", type=int, default=20)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--anchor", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()
    run(args)
