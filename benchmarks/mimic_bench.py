"""MIMIC clinical-cohort benchmark: mech / NN-only / hybrid ablation.

Parity target: the manuscript's MIMIC-III table (manuscript.tex:753-768 —
mech 1.10 / NN-only 0.85 / hybrid 0.72 mmol/L). The reference cannot
actually produce those numbers from its shipped code: its "downloader"
GENERATES synthetic MIMIC-like data (download_mimic.py:86-137) and its
training path cannot backpropagate through the solve. This benchmark runs
the same experiment end-to-end on the synthetic cohort this framework's
pipeline generates (data/mimic.py — same generator design), with honest
SUBJECT-level splits (no window leakage across train/test).

Also smoke-checks the full clinical recipe (configs/mimic_clinical.yaml:
radau stiff solver + VI with KL annealing) for a few epochs.

Usage: python benchmarks/mimic_bench.py [--epochs 600]
Writes results/mimic_benchmark.json.
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
    "data": {"path": "data/mimic_glucose_insulin.parquet",
             "sequence_length": 61, "stride": 12, "normalize": True},
    "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
              "substeps": 4, "mode": "scan", "context_points": 12,
              "context_dim": 16, "use_pallas": True},
    "training": {"epochs": 600, "batch_size": 32, "learning_rate": 3.0e-3,
                 "lambda1": 0.0, "lambda2": 0.01, "gradient_clip": 5.0,
                 "early_stopping_patience": 100000,
                 "train_ode_params": True},
    "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
    "logging": {"tensorboard": False, "save_interval": 100},
    "seed": 0,
}

VARIANTS = [
    ("mech_only", {"no_nn": True}, {"use_pallas": False, "context_points": 0}),
    ("nn_only", {"no_mech": True}, {"use_pallas": False}),
    ("hybrid", {}, {}),
]


def run(args):
    import jax

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.evals.evaluate import evaluate_model
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.train.loop import train_model

    if args.cohort == "icu":
        # round 3: physiologically-grounded ICU cohort (4GI dynamics +
        # exogenous insulin/dextrose + unmodeled circadian/stress) — the
        # clinical setting where a mechanistic prior is actually
        # informative; see data/mimic.py generate_icu_cohort docstring
        data_path = REPO / "data" / "icu_cohort.parquet"
        if not data_path.exists():
            from hybrid_ode_tpu.data.mimic import generate_icu_cohort

            print("generating ICU cohort (80 patients x 72 h)...")
            generate_icu_cohort(path=str(data_path), n_patients=80,
                                hours=72.0, seed=0)
        stride = 24
    else:
        data_path = REPO / BASE_CFG["data"]["path"]
        stride = 12

    ds = create_data_arrays(str(data_path), sequence_length=61, stride=stride)
    tr, va, te = split_dataset(ds, seed=42, level="subject")
    if args.cohort == "icu":
        # ~2.7k windows (vs the 4GI cohort's dozens): larger batches keep
        # the per-dispatch overhead amortized; epochs scale down to match
        BASE_CFG["training"]["batch_size"] = 128
        if args.epochs == 600:
            args.epochs = 400
    print(f"windows: train {len(tr)} / val {len(va)} / test {len(te)} "
          f"(subject-level split)")
    g_std = float(ds.state_std[0])

    results = {}
    for name, abl_over, model_over in VARIANTS:
        cfg = copy.deepcopy(BASE_CFG)
        cfg["training"]["epochs"] = args.epochs
        cfg["model"].update(model_over)
        cfg["ablation"].update(abl_over)
        if abl_over.get("no_nn"):
            cfg["training"]["epochs"] = min(args.epochs, 200)  # only 17 ODE scalars train
        t0 = time.time()
        res = train_model(cfg, tr, va,
                          checkpoint_dir=str(REPO / "checkpoints" / f"mimic_{name}"))
        wall = time.time() - t0
        m = evaluate_model(res.params, te, config_from_dict(cfg))
        results[name] = {
            "glucose_rmse_mmol": m["rmse_glucose"] * g_std,
            "rmse_z": m["rmse"],
            "r2": m["r2"],
            "train_wall_s": wall,
            "epochs_run": res.epochs_run,
        }
        print(f"{name}: glucose RMSE {results[name]['glucose_rmse_mmol']:.3f} "
              f"mmol/L, R2 {m['r2']:.3f} ({wall:.0f}s)")
        jax.clear_caches()

    # clinical-recipe capability smoke: radau + VI + KL annealing, few epochs
    from hybrid_ode_tpu.utils.config import load_config

    clin = load_config(str(REPO / "configs" / "mimic_clinical.yaml"))
    clin["training"]["epochs"] = 3
    t0 = time.time()
    try:
        from hybrid_ode_tpu.inference.vi import VariationalInference
        from hybrid_ode_tpu.models.hybrid import init_hybrid_params

        config = config_from_dict(clin)
        vi_set = clin.get("vi_settings", {})
        params = init_hybrid_params(jax.random.PRNGKey(0), config)
        vi = VariationalInference(
            params, config,
            prior_params=clin.get("ode_param_priors"),
            n_samples=vi_set.get("n_samples", 5),
            noise_sigma=vi_set.get("noise_sigma", 0.35),
            include_nn=vi_set.get("include_nn", False),
            kl_annealing=vi_set.get("kl_annealing", False),
            annealing_epochs=vi_set.get("annealing_epochs", 50),
        )
        # capability smoke, not a fit: a handful of windows suffices (the
        # ICU cohort has 1.9k train windows; 3 epochs over all of them with
        # the radau solver is an hour of wall for no added signal)
        tr_s = tr.select(np.arange(min(len(tr), 32)))
        va_s = va.select(np.arange(min(len(va), 8)))
        vi.train(tr_s, va_s, epochs=3, batch_size=8)
        results["_clinical_recipe_smoke"] = {
            "status": "ok (radau + VI + KL annealing, 3 epochs)",
            "wall_s": round(time.time() - t0, 1),
        }
    except Exception as e:  # pragma: no cover - diagnostic surface
        results["_clinical_recipe_smoke"] = {"status": f"FAILED: {e!r}"}
    print(results["_clinical_recipe_smoke"])

    results["_manuscript_targets_mmol"] = {
        "mech_only": 1.10, "nn_only": 0.85, "hybrid": 0.72, "note":
        "manuscript.tex:753-768 claims REAL MIMIC-III; the reference's "
        "shipped pipeline only generates synthetic data, so these rows are "
        "measured on the synthetic clinical cohort with subject-level splits"
    }
    results["_cohort"] = args.cohort
    out = REPO / "results" / ("mimic_benchmark.json" if args.cohort == "icu"
                              else "mimic_benchmark_heuristic.json")
    out.write_text(json.dumps(results, indent=2, default=float))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--cohort", choices=["icu", "heuristic"], default="icu",
                    help="'icu': round-3 dynamics-grounded cohort; "
                         "'heuristic': the reference-parity meal-hour "
                         "generator (no dynamics, round-2 result)")
    args = ap.parse_args()
    run(args)
