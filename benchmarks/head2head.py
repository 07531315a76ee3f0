"""Measured head-to-head vs the reference, under the REFERENCE's protocol.

Trains this framework's ablation grid on the exact windows the reference's
`torch.utils.data.random_split(..., generator=manual_seed(42))` puts in
train/val/test (train_hybrid.py:184-193), evaluates with the reference's
metric definition (z-scored per-state RMSE over whole trajectories,
eval/evaluate.py:25-52), and merges with the measured reference results
produced by benchmarks/ref_head2head.sh — giving the apples-to-apples table
the manuscript's claims (manuscript.tex:779-798: mech-only 0.75 / no-Bayes
0.55 / hybrid 0.45 mmol/L) never had.

Usage:
    python benchmarks/head2head.py [--data data/4gi_dataset.csv]
Writes results/head2head.json, results/tables/table5_ablation.csv(/tex).
"""

from __future__ import annotations

import argparse
import copy
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
    "model": {"nn_hidden": 64, "nn_layers": 4, "solver": "dopri5",
              "mode": "scan", "max_steps_per_interval": 8},
    "training": {"epochs": 300, "batch_size": 32, "learning_rate": 1.0e-3,
                 "lambda1": 1.0, "lambda2": 0.01, "gradient_clip": 5.0,
                 "early_stopping_patience": 20},
    "ablation": {"no_nn": False, "no_bayes": True, "no_physics": False},
    "logging": {"tensorboard": False, "save_interval": 50},
    "seed": 0,
}

TUNED_MODEL = {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
               "substeps": 4, "mode": "scan", "context_points": 12,
               "context_dim": 16, "use_pallas": True}
TUNED_TRAIN = {"epochs": 3000, "learning_rate": 3.0e-3, "lambda1": 0.0,
               "lambda2": 0.01, "early_stopping_patience": 3000,
               "train_ode_params": True}

#: (name, model overrides, training overrides, ablation overrides)
VARIANTS = [
    ("hybrid", {}, {}, {}),
    ("mech_only", {}, {}, {"no_nn": True}),
    ("no_physics", {}, {"lambda1": 0.0}, {"no_physics": True}),
    ("nn_only", {}, {}, {"no_mech": True}),
    ("hybrid_tuned", TUNED_MODEL, TUNED_TRAIN, {"no_physics": True}),
]


def reference_split_indices(n: int, seed: int = 42):
    """Replicate torch random_split([0.7n, 0.15n, rest], manual_seed(seed))."""
    import torch

    lengths = [int(0.7 * n), int(0.15 * n)]
    lengths.append(n - sum(lengths))
    parts = torch.utils.data.random_split(
        range(n), lengths, generator=torch.Generator().manual_seed(seed)
    )
    return [np.array(list(p)) for p in parts]


def run(data_path: str, out_dir: Path):
    import jax
    from hybrid_ode_tpu.data.dataset import create_data_arrays
    from hybrid_ode_tpu.evals.evaluate import evaluate_model
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.train.loop import train_model

    ds = create_data_arrays(data_path, 61, 30, normalize=True)
    tr_idx, va_idx, te_idx = reference_split_indices(len(ds))
    print(f"reference split: train={tr_idx} val={va_idx} test={te_idx}")
    train_ds, val_ds, test_ds = ds.select(tr_idx), ds.select(va_idx), ds.select(te_idx)
    g_std = float(ds.state_std[0])

    results = {}
    for name, m_over, t_over, a_over in VARIANTS:
        cfg = copy.deepcopy(BASE_CFG)
        cfg["data"]["path"] = data_path
        cfg["model"].update(m_over)
        cfg["training"].update(t_over)
        cfg["ablation"].update(a_over)
        t0 = time.time()
        res = train_model(cfg, train_ds, val_ds,
                          checkpoint_dir=str(out_dir / f"h2h_{name}"))
        wall = time.time() - t0
        config = config_from_dict(cfg)
        metrics = evaluate_model(res.params, test_ds, config)
        row = {
            "rmse": metrics["rmse"],
            "rmse_glucose_z": metrics["rmse_glucose"],
            "rmse_glucose_mmol": metrics["rmse_glucose"] * g_std,
            "nrmse": metrics["nrmse"],
            "train_wall_s": wall,
            "epochs_run": res.epochs_run,
            "best_val_loss": res.best_val_loss,
        }
        results[name] = row
        print(f"{name}: glucose RMSE {row['rmse_glucose_mmol']:.3f} mmol/L "
              f"({row['rmse_glucose_z']:.3f} z), {wall:.0f}s")
        jax.clear_caches()

    # merge the measured reference rows (benchmarks/ref_head2head.sh outputs)
    ref_dir = REPO / "results" / "ref_head2head"
    timing = json.loads((ref_dir / "timing.json").read_text()) \
        if (ref_dir / "timing.json").exists() else {}
    for ref_name in ["ref_hybrid", "ref_mech_only", "ref_no_physics"]:
        csv = ref_dir / f"eval_{ref_name}.csv"
        if csv.exists():
            import pandas as pd

            r = pd.read_csv(csv).iloc[0].to_dict()
            results[ref_name] = {
                "rmse": r["rmse"],
                "rmse_glucose_z": r["rmse_glucose"],
                "rmse_glucose_mmol": r["rmse_glucose"] * g_std,
                "nrmse": r["nrmse"],
                "train_wall_s": timing.get(ref_name, {}).get("train_s"),
            }
        elif ref_name in timing and timing[ref_name].get("train_rc", 0) != 0:
            results[ref_name] = {"error": "training crashed (see train log): "
                                 "the reference integrator runs under no_grad "
                                 "(hybrid_ode_nn.py:234), so without the "
                                 "physics loss there is no gradient path"}

    (REPO / "results" / "head2head.json").write_text(json.dumps(results, indent=2))
    emit_table5(results)


def emit_table5(results: dict) -> None:
    """Write the measured ablation table (manuscript.tex:779-798 counterpart).

    This function OWNS results/tables/table5_ablation.csv — no other writer
    may target that path (the figures CLI clobbered it in round 2; it now
    writes table5_models.csv). Re-emit any time with `--table-only`.
    """
    rows = []
    label = {"hybrid": "Hybrid (ours, reference protocol)",
             "mech_only": "Mechanistic only (ours)",
             "no_physics": "No physics loss (ours)",
             "nn_only": "NN only (ours)",
             "hybrid_tuned": "Hybrid tuned (ours, configs/4gi_tuned.yaml)",
             "ref_hybrid": "Reference hybrid (measured)",
             "ref_mech_only": "Reference mechanistic only (measured)",
             "ref_no_physics": "Reference no-physics (measured)"}
    for name, row in results.items():
        if "error" in row:
            rows.append({"variant": label.get(name, name),
                         "glucose_rmse_mmol": "crash",
                         "rmse_z": "", "nrmse": "", "train_wall_s": ""})
        else:
            rows.append({"variant": label.get(name, name),
                         "glucose_rmse_mmol": f"{row['rmse_glucose_mmol']:.3f}",
                         "rmse_z": f"{row['rmse']:.3f}",
                         "nrmse": f"{row['nrmse']:.3f}",
                         "train_wall_s": f"{row['train_wall_s']:.0f}"
                         if row.get("train_wall_s") else ""})
    import pandas as pd

    tab = pd.DataFrame(rows)
    tdir = REPO / "results" / "tables"
    tdir.mkdir(parents=True, exist_ok=True)
    tab.to_csv(tdir / "table5_ablation.csv", index=False)
    (tdir / "table5_ablation.tex").write_text(tab.to_latex(index=False))
    print(tab.to_string(index=False))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=str(REPO / "data" / "4gi_dataset.csv"))
    ap.add_argument("--out", default=str(REPO / "checkpoints"))
    ap.add_argument("--table-only", action="store_true",
                    help="re-emit table5 from the existing results/head2head.json")
    args = ap.parse_args()
    if args.table_only:
        emit_table5(json.loads((REPO / "results" / "head2head.json").read_text()))
    else:
        run(args.data, Path(args.out))
