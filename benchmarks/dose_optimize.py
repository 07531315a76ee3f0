"""Model-based insulin-protocol evaluation and optimization, ground-truth
validated (MPC-style receding horizon).

The reference promises "prospective prototyping for future downstream
tasks like clinical dosing or therapeutic guidance"
(/root/reference/manuscript.tex:52) with nothing runnable behind it. This
benchmark runs the loop the promise implies:

  1. RANKING: across a 12-arm sliding-scale protocol grid (including
     aggressive low-target arms that genuinely cause hypoglycemia and
     withhold arms that let hyperglycemia ride), roll the trained ICU
     ensemble forward in closed loop over 6-hour horizons — the model's
     VALIDATED regime; its training windows are 5 h, and a first-cut 24 h
     design measurably diverged (see RESULTS.md) — and compare the model's
     predicted glycemic risk ranking to the TRUE ranking from re-simulating
     the same patients under each protocol (paired counterfactual cohorts).
     Both insulin routings are scored: causal 'mech' vs the confounded
     reference-parity 'nn' (RESULTS.md intervention study).

     Risk is scored ROBUSTLY on delta-corrected trajectories
     (`robust_delta_risk`: worst case over de-attenuation factors
     lambda in {1,2,4} applied to the model's counterfactual delta on the
     observed factual glucose). Measured motivations, kept on the record
     in the artifact: the RAW model risk is flat across the grid
     (0.261-0.262 while true risk spans 0.031-0.080, `model_risk_raw`) —
     absolute risk is dominated by the model's own prediction error; and
     PLAIN delta correction (`model_risk_corrected`) cancels that error
     but still understates aggressive arms' hypoglycemia tail through the
     ~2.2x identified-dose-response attenuation (spearman 0.27, picked a
     truly-harmful optimum).
  2. OPTIMIZATION: gradient-optimize (gain, target) THROUGH the rollout
     under the same robust objective (population, risk-averse CVaR, and
     per-patient personalized arms), with the gain boxed to the
     clinically admissible [0, 3600] (unbounded log-gain measurably runs
     away to 35k and deploys at 5.6x the default protocol's true risk),
     then validate each optimized protocol on the fresh validation
     patients' simulator truth.

Writes results/dose_optimization.json.

Usage: python benchmarks/dose_optimize.py [--patients 16] [--steps 100]
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

DESIGN_SEED = 1313
VAL_SEED = 2024
DEFAULT_GAIN, DEFAULT_TARGET = 900.0, 7.0
HORIZON_H = 6.0          # rollout/scoring horizon (within the trained regime)
COHORT_H = 30.0          # simulated cohort length (several windows each)

# protocol grid with REAL outcome spread: the deployed scale's neighbors
# plus hypo-aggressive (low target x high gain) and withhold arms
GRID = [(0.0, 7.0), (225.0, 7.0), (450.0, 9.0),
        (900.0, 4.5), (900.0, 5.5), (900.0, 7.0), (900.0, 9.0), (900.0, 11.0),
        (1800.0, 5.5), (3600.0, 4.5), (3600.0, 7.0), (3600.0, 11.0)]


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    return float(np.corrcoef(ra, rb)[0, 1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--skip-nn-arm", action="store_true",
                    help="skip the confounded-routing comparison grid")
    ap.add_argument("--train-cohort", default="varied",
                    choices=["factual", "varied"],
                    help="which training cohort the checkpoints used. "
                    "Default 'varied': the factual single-protocol cohort "
                    "leaves the dose response under-identified (measured — "
                    "RESULTS.md causal-routing study), so protocol "
                    "optimization should use dose-identified models")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import create_data_arrays
    from hybrid_ode_tpu.data.mimic import generate_icu_cohort
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.models.protocol import (
        counterfactual_delta_correction,
        cvar_glycemic_risk,
        robust_delta_risk,
        ensemble_closed_loop,
        glycemic_risk,
        optimize_protocol,
        time_in_range,
    )
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    T = int(HORIZON_H * 12) + 1       # 73 grid points per rollout window
    STRIDE = T - 1                    # non-overlapping receding horizons

    # training-cohort stats (deployment convention, as in intervention.py)
    varied = args.train_cohort == "varied"
    train_path = REPO / "data" / ("icu_cohort_varied.parquet" if varied
                                  else "icu_cohort.parquet")
    if not train_path.exists():
        if varied:
            from hybrid_ode_tpu.data.mimic import generate_icu_cohort_varied
            generate_icu_cohort_varied(path=str(train_path), n_patients=80,
                                       hours=72.0, seed=0)
        else:
            generate_icu_cohort(path=str(train_path), n_patients=80,
                                hours=72.0, seed=0)
    ds_tr = create_data_arrays(str(train_path), sequence_length=61, stride=24)
    norm = (ds_tr.state_mean.astype(np.float64),
            ds_tr.state_std.astype(np.float64))

    def cohort_batch(seed, gain=DEFAULT_GAIN, target=DEFAULT_TARGET,
                     tag="design", fname=None):
        """6-h receding-horizon windows + per-window noiseless truth."""
        if fname is None:
            fname = f"icu_dose_{tag}_{seed}_{gain:g}_{target:g}"
        path = f"/tmp/{fname}.parquet"
        if not Path(path).exists():
            generate_icu_cohort(path=path, n_patients=args.patients,
                                hours=COHORT_H, seed=seed,
                                protocol_gain=gain, protocol_target=target)
        ds = create_data_arrays(path, sequence_length=T, stride=STRIDE,
                                norm_stats=norm)
        batch = ds.batch(np.arange(len(ds)))
        df = pd.read_parquet(path)
        grid_true = {sid: sub["glucose_true_mmol_L"].to_numpy()
                     for sid, sub in df.groupby("subject_id")}
        idx = np.round(ds.time_points * 12).astype(int)       # (N, T)
        truth = np.stack([grid_true[ds.subject_ids[w]][idx[w]]
                          for w in range(len(ds))])
        return batch, truth, np.asarray(ds.subject_ids)

    def true_risk(truth):
        g = np.asarray(truth)
        return {"risk": float(glycemic_risk(g)),
                "tir": float(time_in_range(g)),
                "hypo_frac": float((g < 3.9).mean()),
                "mean_glucose": round(float(g.mean()), 3)}

    def load_arm(routing):
        tag = ("" if routing == "nn" else f"_{routing}") \
            + ("_varied" if varied else "")
        ckpt = REPO / "checkpoints" / f"icu_ensemble{tag}" / "ensemble_model"
        if not ckpt.exists():
            sys.exit(f"checkpoint missing - run `python benchmarks/"
                     f"icu_ensemble.py --exog-insulin {routing} "
                     f"--train-cohort {args.train_cohort}` first")
        stacked, meta = load_checkpoint(str(ckpt))
        cfg = {
            "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
                      "substeps": 4, "mode": "scan", "context_points": 12,
                      "context_dim": 16, "use_pallas": False,
                      "exog_insulin": routing},
            "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
        }
        return stacked, config_from_dict(cfg), int(meta["n_members"])

    # ---- 1. protocol grid: model-predicted vs true risk ranking -----------
    val_truths = {}
    for g, t in GRID:
        _, truth, _ = cohort_batch(VAL_SEED, g, t, tag="val")
        val_truths[(g, t)] = true_risk(truth)
    print(f"simulated {len(GRID)} ground-truth protocol arms "
          f"(true risk spread {min(v['risk'] for v in val_truths.values()):.4f}"
          f" .. {max(v['risk'] for v in val_truths.values()):.4f})")

    val_batch, val_fact_truth, val_sid = cohort_batch(VAL_SEED, tag="val")

    arms = {}
    routings = ["mech"] + ([] if args.skip_nn_arm else ["nn"])
    for routing in routings:
        stacked, config, K = load_arm(routing)
        print(f"[{routing}] loaded K={K} ensemble")

        @jax.jit
        def model_glucose(gain, target, s=stacked, c=config):
            return ensemble_closed_loop(s, val_batch, c, gain, target,
                                        norm)["glucose"]  # (K, N, T)

        t0 = time.time()
        # factual-protocol rollout anchors the delta correction: each arm's
        # predicted counterfactual delta rides on the OBSERVED factual
        # trajectory (model prediction error cancels pairwise)
        g_fact = np.asarray(model_glucose(jnp.asarray(DEFAULT_GAIN),
                                          jnp.asarray(DEFAULT_TARGET)))
        pred = {}
        for g, t in GRID:
            gl = np.asarray(model_glucose(jnp.asarray(g), jnp.asarray(t)))
            corr = counterfactual_delta_correction(gl, g_fact,
                                                   val_fact_truth[None])
            pred[(g, t)] = {
                "risk": float(robust_delta_risk(gl, g_fact,
                                                val_fact_truth[None])),
                "risk_corrected": float(glycemic_risk(corr)),
                "risk_raw": float(glycemic_risk(gl)),
                "tir": float(time_in_range(corr)),
                "finite": bool(np.isfinite(gl).all())}
        wall = time.time() - t0
        tr = np.array([val_truths[k]["risk"] for k in GRID])
        pr = np.array([pred[k]["risk"] for k in GRID])
        pr_corr = np.array([pred[k]["risk_corrected"] for k in GRID])
        pr_raw = np.array([pred[k]["risk_raw"] for k in GRID])
        arms[routing] = {
            "spearman_risk": spearman(tr, pr),
            "spearman_risk_corrected": spearman(tr, pr_corr),
            "spearman_risk_raw": spearman(tr, pr_raw),
            "pearson_log_risk": float(np.corrcoef(
                np.log10(tr + 1e-6), np.log10(pr + 1e-6))[0, 1]),
            "all_rollouts_finite": all(p["finite"] for p in pred.values()),
            "true_best_protocol": list(GRID[int(np.argmin(tr))]),
            "model_best_protocol": list(GRID[int(np.argmin(pr))]),
            "grid_wall_s": round(wall, 1),
            "grid": [{"gain": g, "target": t,
                      "true_risk": round(val_truths[(g, t)]["risk"], 5),
                      "model_risk_robust": round(pred[(g, t)]["risk"], 5),
                      "model_risk_corrected":
                          round(pred[(g, t)]["risk_corrected"], 5),
                      "model_risk_raw": round(pred[(g, t)]["risk_raw"], 5),
                      "true_hypo_frac": val_truths[(g, t)]["hypo_frac"],
                      "true_tir": round(val_truths[(g, t)]["tir"], 4)}
                     for g, t in GRID],
        }
        print(f"[{routing}] spearman robust "
              f"{arms[routing]['spearman_risk']:.3f} (corrected "
              f"{arms[routing]['spearman_risk_corrected']:.3f}, raw "
              f"{arms[routing]['spearman_risk_raw']:.3f}) | "
              f"model best {arms[routing]['model_best_protocol']} "
              f"true best {arms[routing]['true_best_protocol']}")

    # ---- 2. gradient optimization through the causal ensemble -------------
    stacked, config, K = load_arm("mech")
    design_batch, design_truth, design_sid = cohort_batch(DESIGN_SEED)
    print("design cohort factual:", true_risk(design_truth))

    def rollout(gain, target):
        return ensemble_closed_loop(stacked, design_batch, config,
                                    gain, target, norm)["glucose"]

    # delta-corrected objective: the factual rollout is a constant anchor
    # (gradient flows only through the candidate protocol's delta), so the
    # optimizer starts at EXACTLY the design cohort's true factual risk
    fact_design = jax.lax.stop_gradient(
        jax.jit(rollout)(jnp.asarray(DEFAULT_GAIN),
                         jnp.asarray(DEFAULT_TARGET)))
    truth_design = jnp.asarray(design_truth)[None]

    def robust_obj(g):
        return robust_delta_risk(g, fact_design, truth_design)

    GAIN_BOUNDS = (0.0, 3600.0)   # clinically admissible sliding scales
    t0 = time.time()
    opt = optimize_protocol(rollout, init_gain=DEFAULT_GAIN,
                            init_target=DEFAULT_TARGET, steps=args.steps,
                            lr=args.lr, gain_bounds=GAIN_BOUNDS,
                            objective=robust_obj)
    opt_wall = time.time() - t0
    print(f"optimized protocol: gain {opt['gain']:.0f} target "
          f"{opt['target']:.2f} (risk {opt['init_risk']:.5f} -> "
          f"{opt['final_risk']:.5f}, {opt_wall:.0f}s)")

    opt_cvar = optimize_protocol(
        rollout, init_gain=DEFAULT_GAIN, init_target=DEFAULT_TARGET,
        steps=args.steps, lr=args.lr, gain_bounds=GAIN_BOUNDS,
        objective=lambda g: robust_delta_risk(
            g, fact_design, truth_design,
            objective=lambda gc: cvar_glycemic_risk(gc, alpha=0.25)))
    print(f"CVaR-optimized protocol: gain {opt_cvar['gain']:.0f} target "
          f"{opt_cvar['target']:.2f}")

    # personalized arm: per-PATIENT (gain_i, target_i). Each design window
    # belongs to a patient; optimize patient vectors gathered per window.
    uniq = np.unique(design_sid)
    w2p = np.searchsorted(uniq, design_sid)          # window -> patient index
    P = len(uniq)

    def pp_rollout(gain_p, target_p):
        return ensemble_closed_loop(stacked, design_batch, config,
                                    gain_p[w2p], target_p[w2p],
                                    norm)["glucose"]

    opt_pp = optimize_protocol(
        pp_rollout,
        init_gain=np.full(P, DEFAULT_GAIN, np.float32),
        init_target=np.full(P, DEFAULT_TARGET, np.float32),
        steps=args.steps, lr=args.lr, gain_bounds=GAIN_BOUNDS,
        objective=robust_obj)
    print(f"personalized protocols (P={P}): gain [{opt_pp['gain'].min():.0f},"
          f" {opt_pp['gain'].max():.0f}] target [{opt_pp['target'].min():.2f}"
          f", {opt_pp['target'].max():.2f}]")

    # ---- deployment validation on the FRESH validation patients -----------
    _, val_default, _ = cohort_batch(VAL_SEED, tag="val")
    _, val_opt, _ = cohort_batch(VAL_SEED, opt["gain"], opt["target"],
                                 tag="val")
    _, val_cvar, _ = cohort_batch(VAL_SEED, opt_cvar["gain"],
                                  opt_cvar["target"], tag="val")
    # personalized protocols were fit on DESIGN patients; deploying them on
    # new patients is undefined — validate on the design cohort's own
    # simulator truth instead (the personalization use case: the patient
    # being treated IS the one the protocol was tuned for)
    Path("/tmp/icu_dose_design_personalized.parquet").unlink(missing_ok=True)
    _, des_pp, _ = cohort_batch(DESIGN_SEED, opt_pp["gain"], opt_pp["target"],
                                fname="icu_dose_design_personalized")
    _, des_opt, _ = cohort_batch(DESIGN_SEED, opt["gain"], opt["target"])
    deploy = {
        "default_protocol": true_risk(val_default),
        "optimized_protocol": true_risk(val_opt),
        "cvar_optimized_protocol": true_risk(val_cvar),
        "design_default": true_risk(design_truth),
        "design_optimized_population": true_risk(des_opt),
        "design_personalized": true_risk(des_pp),
    }
    print("deployment validation:", json.dumps(deploy, indent=1))

    out = {
        "protocol": {
            "design_seed": DESIGN_SEED, "val_seed": VAL_SEED,
            "train_cohort": args.train_cohort,
            "n_patients": args.patients, "horizon_h": HORIZON_H,
            "cohort_h": COHORT_H, "default": [DEFAULT_GAIN, DEFAULT_TARGET],
            "grid": [list(k) for k in GRID],
            "objective": "glycemic_risk (hypo 3.9 x25, hyper 10.0)",
            "delta_corrected": True,
            "robust_lambdas": [1.0, 2.0, 4.0],
            "gain_bounds": list(GAIN_BOUNDS),
        },
        "ranking_validation": arms,
        "optimized": {**{k: v for k, v in opt.items() if k != "risk"},
                      "risk_trace_head": [round(x, 6) for x in opt["risk"][:5]],
                      "wall_s": round(opt_wall, 1), "adam_steps": args.steps},
        "cvar_optimized": {k: v for k, v in opt_cvar.items() if k != "risk"},
        "personalized": {
            "n_patients": int(P),
            "gain": [round(float(x), 1) for x in opt_pp["gain"]],
            "target": [round(float(x), 3) for x in opt_pp["target"]],
            "init_risk": opt_pp["init_risk"],
            "final_risk": opt_pp["final_risk"],
        },
        "deployment_validation": deploy,
    }
    path = REPO / "results" / "dose_optimization.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
