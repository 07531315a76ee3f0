"""Latent GLP-1 recovery benchmark (manuscript.tex:76-95 protocol).

Hide the GLP-1 channel from the model at fit time (zeroed in the
observations / initial state / context input, weight 0 in the loss), train
mech-only / NN-only / hybrid variants on the remaining observed states
(glucose, insulin, glucagon), roll out the test windows, and score the
model's internal GLP-1 state against the simulator's noiseless truth
(`glp1_true_pmol_L`) with R^2 / Pearson rho / DTW (`evals/latent.py`).

Manuscript targets (Table latent_glp1): mechanistic 0.034/0.323/10463,
NN-only 0.038/0.486/7717, hybrid R^2 0.509 / rho 0.742 / DTW 6470. The
reference ships NO code for this experiment.

Usage: python benchmarks/latent.py [--epochs 2000]
Writes results/latent_recovery.json.
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_CFG = {
    "data": {"path": "data/4gi_dataset.csv", "sequence_length": 61,
             "stride": 30, "normalize": True},
    # PHYSICAL-core recipe with FIXED Table-I mechanistic parameters: with
    # GLP-1 unobserved, the mechanistic structure is the only thing anchoring
    # the latent — and it only anchors if (a) it acts in physical units (a
    # z-scored mechanistic field is dimensionally arbitrary: measured hybrid
    # R² -3.6) and (b) its parameters cannot drift (free 17-param training
    # finds sign-flipped ρ/E_max solutions where an INVERTED GLP-1 explains
    # the observations equally well: measured ρ = -0.86). The manuscript's
    # Bayesian priors play the same role for its hybrid (manuscript.tex:76-95).
    "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
              "substeps": 4, "mode": "scan", "physical_core": True},
    "training": {"epochs": 2000, "batch_size": 32, "learning_rate": 3.0e-3,
                 "lambda1": 0.0, "lambda2": 0.01, "gradient_clip": 5.0,
                 "early_stopping_patience": 100000,
                 "train_ode_params": False},
    "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
    "logging": {"tensorboard": False, "save_interval": 200},
    "seed": 0,
}

VARIANTS = [
    # mech-only with fixed params trains nothing: 1 epoch, pure simulation
    ("mech_only", {"no_nn": True}, {}, {"epochs": 1}),
    # NN-only has no physical anchor by construction (that is the point of
    # the ablation): its latent GLP-1 is expected to drift off-scale
    ("nn_only", {"no_mech": True}, {"physical_core": False}, {}),
    ("hybrid", {}, {}, {}),
    # z-space hybrid (reference-parity frame), fixed mechanistic params
    ("hybrid_z", {}, {"physical_core": False}, {}),
    # amplitude recovery: free ONLY the GLP-1 pathway scale (V_max, k_L) —
    # selective freedom lets the latent's amplitude be identified through
    # the insulin coupling without the sign-flip degeneracy of the full
    # 17-parameter space
    # (couplings rho/E_max stay at Table-I: freeing them reintroduces the
    # sign-flip degeneracy)
    ("hybrid_scale", {}, {}, {"train_ode_params": ["V_max", "k_L"]}),
]

GLP1 = 3  # state index


def hide_glp1(ds):
    """Hide the GLP-1 channel everywhere the model could see it.

    Observations/context are zeroed (z-space neutral); the INITIAL latent is
    set to the model's own basal (physical 0 pmol/L — `steady_state()`'s
    GLP-1), not the cohort mean: with no information about the subject the
    physiological prior is 'basal', and a cohort-mean start (≈1772 pmol/L,
    dominated by post-meal excursions) forces the mechanistic latent into
    pure decay while the truth rises from ≈10 (measured ρ = -0.86)."""
    obs = np.array(ds.observations)
    obs[..., GLP1] = 0.0
    init = np.array(ds.initial_state)
    z_basal = (0.0 - float(ds.state_mean[GLP1])) / float(ds.state_std[GLP1])
    init[..., GLP1] = z_basal
    lw = np.array(ds.loss_weights)
    lw[GLP1] = 0.0
    return dataclasses.replace(
        ds, observations=obs, initial_state=init, loss_weights=lw
    )


def run(args):
    import jax
    import pandas as pd

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.evals.latent import latent_recovery_metrics
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward, config_from_dict, with_context,
    )
    from hybrid_ode_tpu.train.loop import train_model

    ds = create_data_arrays(str(REPO / args.data))
    tr, va, te = split_dataset(ds, seed=42)
    tr_h, va_h, te_h = hide_glp1(tr), hide_glp1(va), hide_glp1(te)

    df = pd.read_csv(REPO / args.data)
    truth = {sid: sub["glp1_true_pmol_L"].to_numpy()
             for sid, sub in df.groupby("subject_id")}
    mean_g, std_g = float(ds.state_mean[GLP1]), float(ds.state_std[GLP1])

    results = {}
    for name, abl_over, model_over, train_over in VARIANTS:
        cfg = copy.deepcopy(BASE_CFG)
        cfg["data"]["path"] = str(REPO / args.data)
        cfg["training"]["epochs"] = args.epochs
        cfg["model"].update(model_over)
        cfg["ablation"].update(abl_over)
        cfg["training"].update(train_over)
        t0 = time.time()
        res = train_model(cfg, tr_h, va_h,
                          checkpoint_dir=str(REPO / "checkpoints" / f"latent_{name}"))
        wall = time.time() - t0
        config = config_from_dict(cfg)

        batch = te_h.batch(np.arange(len(te_h)))
        controls = Controls(ts=batch["time_points"],
                            signals=dict(batch["external_inputs"]))
        controls = with_context(res.params, batch, controls, config)
        preds = np.asarray(batched_forward(
            res.params, batch["initial_state"], batch["time_points"],
            controls, config,
        ))  # (Nt, T, 6) z-scored
        pred_glp1 = preds[..., GLP1] * std_g + mean_g          # pmol/L
        true_glp1 = np.stack([truth[s] for s in te_h.subject_ids])

        m = latent_recovery_metrics(pred_glp1, true_glp1)
        m["train_wall_s"] = wall
        m["epochs_run"] = res.epochs_run
        results[name] = m
        print(f"{name}: R2={m['r2']:.3f} rho={m['pearson']:.3f} "
              f"DTW={m['dtw']:.1f} R2std={m['r2_standardized']:.3f} ({wall:.0f}s)")
        jax.clear_caches()

    results["_manuscript_targets"] = {
        "mech_only": {"r2": 0.034, "pearson": 0.323, "dtw": 10463.081},
        "nn_only": {"r2": 0.038, "pearson": 0.486, "dtw": 7716.751},
        "hybrid": {"r2": 0.509, "pearson": 0.742, "dtw": 6470.481},
    }
    results["_protocol"] = (
        "GLP-1 zeroed in observations/initial state/context; loss weight 0; "
        "fit on glucose+insulin+glucagon; rolled-out GLP-1 state scored vs "
        "glp1_true_pmol_L on the seed-42 test windows"
    )
    out = REPO / "results" / "latent_recovery.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/4gi_dataset.csv")
    ap.add_argument("--epochs", type=int, default=2000)
    args = ap.parse_args()
    run(args)
