"""Ensemble arm for the ICU clinical benchmark.

The round-3 ICU cohort benchmark (benchmarks/mimic_bench.py) measured the
single-model manuscript ordering: mech 1.165 / NN-only 0.833 / hybrid
**0.561** mmol/L glucose RMSE (results/mimic_benchmark.json; manuscript
claim 1.10/0.85/0.72, manuscript.tex:753-768). This benchmark trains a
K-member deep ensemble of the SAME hybrid recipe (identical splits,
epochs, optimizer, per-member best-val selection matching train_model)
and scores the ensemble-mean prediction — the estimator the ensemble
layer makes ~free (see results/ensemble_uq.json scaling).

Writes results/icu_ensemble.json.

Usage: python benchmarks/icu_ensemble.py [--members 8] [--epochs 400]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import (
        batch_iterator,
        create_data_arrays,
        pad_batch,
        split_dataset,
    )
    from hybrid_ode_tpu.evals.evaluate import evaluate_model
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.parallel.ensemble import init_ensemble, train_ensemble
    from hybrid_ode_tpu.train.loop import make_optimizer

    # identical recipe to mimic_bench.py's 'hybrid' variant (ICU cohort)
    cfg = {
        "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
                  "substeps": 4, "mode": "scan", "context_points": 12,
                  "context_dim": 16, "use_pallas": False},  # ensemble vmaps weights
        "training": {"epochs": args.epochs, "batch_size": args.batch_size,
                     "learning_rate": 3.0e-3, "lambda1": 0.0, "lambda2": 0.01,
                     "gradient_clip": 5.0, "train_ode_params": True},
        "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
    }
    config = config_from_dict(cfg)

    data_path = REPO / "data" / "icu_cohort.parquet"
    if not data_path.exists():
        from hybrid_ode_tpu.data.mimic import generate_icu_cohort

        print("generating ICU cohort (80 patients x 72 h)...")
        generate_icu_cohort(path=str(data_path), n_patients=80, hours=72.0, seed=0)
    ds = create_data_arrays(str(data_path), sequence_length=61, stride=24)
    tr, va, te = split_dataset(ds, seed=42, level="subject")
    print(f"windows: train {len(tr)} / val {len(va)} / test {len(te)}")
    g_std = float(ds.state_std[0])

    K = args.members
    batches = [pad_batch(b, args.batch_size)[0]
               for b in batch_iterator(tr, args.batch_size, shuffle=False)]
    val_batches = [pad_batch(b, args.batch_size)[0]
                   for b in batch_iterator(va, args.batch_size, shuffle=False)]
    opt = make_optimizer(cfg["training"]["learning_rate"], args.epochs,
                         len(batches), cfg["training"]["gradient_clip"],
                         train_ode_params=True)

    t0 = time.time()
    best_params, best_val, _ = train_ensemble(
        init_ensemble(jax.random.PRNGKey(0), config, K),
        opt, config, batches, val_batches, jax.random.PRNGKey(1),
        args.epochs, lambda1=0.0, lambda2=0.01, use_physics=False,
    )
    wall = time.time() - t0
    print(f"trained {K} members x {args.epochs} epochs in {wall:.1f}s; "
          f"best val losses {np.round(best_val, 4)}")

    m_ens = evaluate_model(best_params, te, config, batch_size=args.batch_size,
                           ensemble=True)
    per_member = []
    from hybrid_ode_tpu.parallel.ensemble import member_params

    for i in range(K):
        mi = evaluate_model(member_params(best_params, i), te, config,
                            batch_size=args.batch_size)
        per_member.append(round(mi["rmse_glucose"] * g_std, 4))

    results = {
        "n_members": K,
        "epochs": args.epochs,
        "train_wall_s": round(wall, 1),
        "best_val_losses": [round(float(x), 4) for x in best_val],
        "glucose_rmse_mmol_per_member": per_member,
        "glucose_rmse_mmol_ensemble_mean": round(m_ens["rmse_glucose"] * g_std, 4),
        "rmse_z_ensemble": round(m_ens["rmse"], 4),
        "r2_ensemble": round(m_ens["r2"], 4),
        "ece_ensemble_raw": round(m_ens["ece"], 4),
        "_single_model_baselines": {
            "hybrid": 0.561, "nn_only": 0.833, "mech_only": 1.165,
            "source": "results/mimic_benchmark.json",
        },
        "_manuscript_claim_hybrid": 0.72,
    }
    out = REPO / "results" / "icu_ensemble.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
