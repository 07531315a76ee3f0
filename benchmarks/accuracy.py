"""Accuracy benchmark: 4GI parity gate (SURVEY.md §7.8, BASELINE.md).

Protocol:
  1. train the hybrid model on the shipped 10-subject 4GI cohort
     (reference protocol: configs/4gi_baseline.yaml splits);
  2. evaluate glucose RMSE on (a) the held-out test windows vs noisy
     observations and vs the noiseless simulator truth, and (b) a FRESH
     simulated cohort of unseen subjects (truth known exactly) — the most
     stable generalisation measure, impossible for the reference (its
     generator and model are not linked).

Reference numbers (manuscript.tex:681-692): hybrid glucose RMSE
0.45 ± 0.03 mmol/L, R^2 0.94 — against an unspecified target; the shipped
data's 10% measurement noise alone is ~0.65 mmol/L RMSE, so sub-noise values
are only meaningful vs simulator truth.

Writes results JSON and prints a summary. Usage:
    python benchmarks/accuracy.py [--epochs 3000] [--fresh-subjects 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/4gi_dataset.csv")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--lambda1", type=float, default=0.0)
    ap.add_argument("--fresh-subjects", type=int, default=50)
    ap.add_argument("--physical-core", action="store_true", default=False)
    ap.add_argument("--context-points", type=int, default=12)
    ap.add_argument("--context-dim", type=int, default=16)
    ap.add_argument("--checkpoint-dir", default="checkpoints/accuracy_benchmark")
    ap.add_argument("--out", default="results/accuracy_benchmark.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.evals.evaluate import evaluate_model
    from hybrid_ode_tpu.models.hybrid import HybridConfig, batched_forward
    from hybrid_ode_tpu.train.loop import train_model
    from hybrid_ode_tpu.utils.config import default_config

    t_start = time.time()
    ds = create_data_arrays(args.data)
    tr, va, te = split_dataset(ds, seed=42)

    cfg = default_config()
    cfg["data"]["path"] = args.data
    cfg["model"].update(
        solver="rk4", substeps=4, mode="scan", nn_hidden=args.hidden, nn_layers=4,
        physical_core=args.physical_core,
        context_points=args.context_points, context_dim=args.context_dim,
    )
    cfg["training"].update(
        epochs=args.epochs, batch_size=32, learning_rate=args.lr,
        lambda1=args.lambda1, lambda2=0.01,
        early_stopping_patience=args.epochs, train_ode_params=True,
    )
    res = train_model(cfg, tr, va, args.checkpoint_dir, None)
    train_wall = time.time() - t_start
    mcfg = HybridConfig(solver="rk4", substeps=4, mode="scan",
                        nn_hidden=args.hidden, nn_layers=4,
                        context_points=args.context_points,
                        context_dim=args.context_dim)

    from hybrid_ode_tpu.models.hybrid import with_context

    def glucose_truth_rmse(dataset, truth_df):
        batch = dataset.batch(np.arange(len(dataset)))
        controls = Controls(
            ts=jnp.asarray(dataset.time_points),
            signals={"meal": jnp.asarray(dataset.meal), "tVNS": jnp.asarray(dataset.tvns)},
        )
        controls = with_context(res.params, batch, controls, mcfg)
        preds = np.asarray(batched_forward(
            res.params, jnp.asarray(dataset.initial_state),
            jnp.asarray(dataset.time_points), controls, mcfg,
        ))
        preds_phys = preds * dataset.state_std + dataset.state_mean
        truth = {sid: sub["glucose_true_mmol_L"].to_numpy()
                 for sid, sub in truth_df.groupby("subject_id")}
        errs = [preds_phys[w, :, 0] - truth[dataset.subject_ids[w]]
                for w in range(len(dataset))]
        return float(np.sqrt(np.mean(np.square(errs))))

    results = {"train_wall_s": round(train_wall, 1),
               "epochs_run": res.epochs_run,
               "best_val_loss": round(res.best_val_loss, 4)}

    m_noisy = evaluate_model(res.params, te, mcfg, denormalize=True)
    results["test_glucose_rmse_vs_noisy"] = round(m_noisy["rmse_glucose"], 4)
    m_norm = evaluate_model(res.params, te, mcfg)
    results["test_r2"] = round(m_norm["r2"], 4)

    df = pd.read_csv(args.data)
    if "glucose_true_mmol_L" in df.columns:
        results["test_glucose_rmse_vs_truth"] = round(glucose_truth_rmse(te, df), 4)

    # fresh-cohort generalisation (unseen subjects, exact truth)
    fresh_path = "/tmp/4gi_fresh_cohort.csv"
    fresh_df = generate_4gi_dataset(fresh_path, seed=123,
                                    n_subjects=args.fresh_subjects)
    fresh_raw = create_data_arrays(fresh_path)
    # score in the TRAINING normalisation (the model's frame)
    from hybrid_ode_tpu.data.dataset import GlucoseDataset

    phys = fresh_raw.observations * fresh_raw.state_std + fresh_raw.state_mean
    renorm = (phys - ds.state_mean) / ds.state_std
    fresh = GlucoseDataset(
        initial_state=renorm[:, 0].astype(np.float32),
        observations=renorm.astype(np.float32),
        time_points=fresh_raw.time_points, meal=fresh_raw.meal,
        tvns=fresh_raw.tvns, mask=fresh_raw.mask,
        state_mean=ds.state_mean, state_std=ds.state_std,
        subject_ids=fresh_raw.subject_ids, loss_weights=ds.loss_weights,
    )
    m_fresh = evaluate_model(res.params, fresh, mcfg, denormalize=True)
    results["fresh_glucose_rmse_vs_noisy"] = round(m_fresh["rmse_glucose"], 4)
    results["fresh_glucose_rmse_vs_truth"] = round(glucose_truth_rmse(fresh, fresh_df), 4)
    results["reference_claim_rmse"] = 0.45
    results["noise_floor_rmse"] = 0.65

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
