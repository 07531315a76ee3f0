"""Model-based insulin-protocol evaluation and optimization, ground-truth
validated (MPC-style receding horizon) on the DYSGLYCEMIC ICU subpopulation.

The reference promises "prospective prototyping for future downstream
tasks like clinical dosing or therapeutic guidance"
(/root/reference/manuscript.tex:52) with nothing runnable behind it. This
benchmark runs the loop the promise implies:

  1. RANKING: across a 15-arm protocol grid over (gain, target, basal) —
     withhold arms that let hyperglycemia ride, proportional sliding
     scales, and basal-heavy arms that genuinely cause hypoglycemia
     (basal insulin continues below target: the classic ICU
     over-insulinization mechanism) — roll the trained ensemble forward
     in closed loop over 6-hour horizons and compare the model's
     predicted glycemic-risk ranking to the TRUE ranking from
     re-simulating the same patients under each protocol (paired
     counterfactual cohorts). Both insulin routings are scored: causal
     'mech' vs the confounded reference-parity 'nn'.

     WHY the dysglycemic subpopulation: on the standard ICU cohort the
     patients' intact endogenous secretion closed-loop compensates every
     protocol — true risk across the round-4 12-arm grid was flat to ~4
     significant figures (0.0314 +- 0.00002, results/dose_optimization.json
     r4), so protocol ranking was statistically meaningless. The
     dysglycemic cohort (beta-cell failure, wide insulin-sensitivity
     spread, heavy feeding — `generate_icu_cohort_dysglycemic`) has true
     risks spanning ~an order of magnitude with a real interior optimum.

     Metric hygiene (advisor r4): the factual arm's delta-corrected risk
     equals simulator truth by construction, so ranking metrics are
     reported both with and without it; the GATE metric excludes it.
     Spearman comes with a patient-resampling bootstrap CI.
  2. OPTIMIZATION: gradient-optimize (gain, target, basal) THROUGH the
     rollout (population, risk-averse CVaR, and per-patient personalized
     arms), boxed to the clinically admissible ranges, then validate each
     optimized protocol on the simulator truth of the same patients.

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
DEFAULT = (900.0, 7.0, 0.0)       # deployed factual protocol (gain, target, basal)
MAX_RATE = 20000.0                # infusion cap, pmol/h (dysglycemic regime)
HORIZON_H = 6.0          # rollout/scoring horizon (within the trained regime)
COHORT_H = 30.0          # simulated cohort length (several windows each)

# (gain, target, basal) grid with REAL outcome spread on the dysglycemic
# cohort: withhold/weak arms ride hyperglycemic, proportional scales are
# safe-but-incomplete, basal-heavy arms overshoot into hypoglycemia
GRID = [
    (0.0, 7.0, 0.0), (225.0, 7.0, 0.0), (900.0, 9.0, 0.0),
    (900.0, 7.0, 0.0), (900.0, 5.5, 0.0), (1800.0, 5.5, 0.0),
    (3600.0, 7.0, 0.0), (3600.0, 4.5, 0.0),
    (900.0, 7.0, 3000.0), (900.0, 5.5, 6000.0), (1800.0, 7.0, 6000.0),
    (900.0, 4.5, 10000.0), (0.0, 7.0, 12000.0), (900.0, 4.5, 15000.0),
    (3600.0, 4.5, 15000.0),
]


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    return float(np.corrcoef(ra, rb)[0, 1])


def bootstrap_spearman(true_pp, model_pp, n_boot=2000, seed=0):
    """Patient-resampling bootstrap CI for the arm-ranking Spearman.

    true_pp/model_pp: (A, P) per-arm, per-patient risks. Each draw
    resamples patients with replacement (the same resample on both sides —
    paired counterfactual cohorts share patients), averages over patients,
    and ranks the A arms."""
    rng = np.random.default_rng(seed)
    A, P = true_pp.shape
    vals = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.integers(0, P, P)
        vals[i] = spearman(true_pp[:, idx].mean(1), model_pp[:, idx].mean(1))
    return {"point": spearman(true_pp.mean(1), model_pp.mean(1)),
            "ci95": [round(float(np.percentile(vals, 2.5)), 4),
                     round(float(np.percentile(vals, 97.5)), 4)],
            "n_boot": n_boot}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--skip-nn-arm", action="store_true",
                    help="skip the confounded-routing comparison grid")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import create_data_arrays
    from hybrid_ode_tpu.data.mimic import generate_icu_cohort_dysglycemic
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.models.protocol import (
        calibrate_dose_response,
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
    train_path = REPO / "data" / "icu_cohort_dysglycemic.parquet"
    if not train_path.exists():
        generate_icu_cohort_dysglycemic(path=str(train_path), n_patients=80,
                                        hours=72.0, seed=0,
                                        varied_protocol=True)
    ds_tr = create_data_arrays(str(train_path), sequence_length=61, stride=24)
    norm = (ds_tr.state_mean.astype(np.float64),
            ds_tr.state_std.astype(np.float64))

    def cohort_batch(seed, protocol=DEFAULT, tag="design", fname=None):
        """6-h receding-horizon windows + per-window noiseless truth."""
        g, t, b = protocol
        if fname is None:
            fname = f"icu_dysg_{tag}_{seed}_{g:g}_{t:g}_{b:g}"
        path = f"/tmp/{fname}.parquet"
        if not Path(path).exists():
            generate_icu_cohort_dysglycemic(
                path=path, n_patients=args.patients, hours=COHORT_H,
                seed=seed, protocol_gain=g, protocol_target=t,
                protocol_basal=b, protocol_max_rate=MAX_RATE)
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
        return {"risk": round(float(glycemic_risk(g)), 5),
                "tir": round(float(time_in_range(g)), 4),
                "hypo_frac": round(float((g < 3.9).mean()), 5),
                "mean_glucose": round(float(g.mean()), 3)}

    def per_patient_risk(glucose, sid, uniq):
        """(..., N, T) glucose -> (P,) risk averaged over each patient's
        windows (and any leading ensemble axis)."""
        g = np.asarray(glucose)
        flat = g.reshape(-1, g.shape[-2], g.shape[-1])      # (K*, N, T)
        out = np.empty(len(uniq))
        for j, u in enumerate(uniq):
            out[j] = float(glycemic_risk(jnp.asarray(flat[:, sid == u])))
        return out

    def load_arm(routing):
        tag = ("" if routing == "nn" else f"_{routing}") + "_dysglycemic"
        ckpt = REPO / "checkpoints" / f"icu_ensemble{tag}" / "ensemble_model"
        if not ckpt.exists():
            sys.exit(f"checkpoint missing - run `python benchmarks/"
                     f"icu_ensemble.py --exog-insulin {routing} "
                     f"--train-cohort dysglycemic` first")
        stacked, meta = load_checkpoint(str(ckpt))
        # drop diverged members (measured: 1/8 mech_blind members at 4x
        # cohort RMSE would pollute CVaR and the closed-loop ensemble mean)
        from hybrid_ode_tpu.parallel.ensemble import prune_members
        stacked = prune_members(stacked, meta["best_val"])
        cfg = {
            "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
                      "substeps": 4, "mode": "scan", "context_points": 12,
                      "context_dim": 16, "use_pallas": False,
                      "exog_insulin": routing},
            "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
        }
        import jax.tree_util as jtu
        K = jtu.tree_leaves(stacked)[0].shape[0]
        return stacked, config_from_dict(cfg), int(K)

    # ---- 0. causal dose-response calibration (training data ONLY) --------
    # Joint training under-identifies k_ex even with full causal masking
    # (collapsed to ~0.08 here); the varied training cohort's randomized
    # per-patient protocols are the identifying lever. See
    # calibrate_dose_response — regression of observed glucose on model-
    # predicted protocol effects across the 80 training patients.
    calib_info = {}

    def calibrate(routing, stacked, config):
        tr_batch = ds_tr.batch(np.arange(len(ds_tr)))
        uniq_tr = np.unique(np.asarray(ds_tr.subject_ids))
        w2p_tr = np.searchsorted(uniq_tr, np.asarray(ds_tr.subject_ids))
        # per-patient protocols: regenerate the generator's seed rule
        # (generate_icu_cohort_dysglycemic varied_protocol, seed 0)
        prng = np.random.default_rng(0 + 10_000)
        gains_p = 900.0 * prng.uniform(0.25, 3.0, 80)
        targets_p = prng.uniform(5.0, 9.0, 80)
        basals_p = prng.uniform(0.0, 12000.0, 80)
        obs_mmol = (np.asarray(tr_batch["observations"][..., 0])
                    * norm[1][0] + norm[0][0])
        t0 = time.time()
        res = calibrate_dose_response(
            stacked, tr_batch, config, norm,
            gain_w=jnp.asarray(gains_p[w2p_tr], jnp.float32),
            target_w=jnp.asarray(targets_p[w2p_tr], jnp.float32),
            basal_w=jnp.asarray(basals_p[w2p_tr], jnp.float32),
            observed_glucose=jnp.asarray(obs_mmol, jnp.float32),
            observed_mask=jnp.asarray(tr_batch["mask"], jnp.float32),
            subject_idx=w2p_tr, reference_protocol=DEFAULT,
            rate_cap=MAX_RATE,
            # 2SLS: protocol assignment is randomized per patient, so the
            # (gain, target, basal) matrix is a valid instrument set; plain
            # OLS is severity-confounded (sicker patients have both larger
            # predicted protocol effects and higher observed glucose)
            instruments=np.stack([gains_p, targets_p, basals_p], axis=1))
        calib_info[routing] = {
            "scale": round(res["scale"], 3),
            "slopes": {str(k): v for k, v in res["slopes"].items()},
            "n_patients": res["n_patients"],
            "wall_s": round(time.time() - t0, 1),
            "data": "training cohort only (seed 0), observed charting "
                    "times; protocol assignment randomized per patient",
        }
        print(f"[{routing}] dose-response calibration: scale "
              f"{res['scale']:.2f} | slopes "
              f"{ {k: v['slope'] for k, v in res['slopes'].items()} }",
              flush=True)
        return res["stacked_calibrated"]

    # ---- 1. protocol grid: model-predicted vs true risk ranking -----------
    val_truths, val_truth_traj = {}, {}
    for arm in GRID:
        _, truth, _ = cohort_batch(VAL_SEED, arm, tag="val")
        val_truths[arm] = true_risk(truth)
        val_truth_traj[arm] = truth
    tr_all = np.array([val_truths[k]["risk"] for k in GRID])
    spread = {"min": float(tr_all.min()), "max": float(tr_all.max()),
              "ratio": round(float(tr_all.max() / max(tr_all.min(), 1e-9)), 2)}
    print(f"simulated {len(GRID)} ground-truth protocol arms "
          f"(true risk spread {spread['min']:.4f}..{spread['max']:.4f}, "
          f"ratio {spread['ratio']}x)")

    val_batch, val_fact_truth, val_sid = cohort_batch(VAL_SEED, tag="val")
    uniq_val = np.unique(val_sid)
    nonfactual = [i for i, k in enumerate(GRID) if k != DEFAULT]

    arms = {}
    # mech_blind is the causal arm (round 5): plain 'mech' routing still
    # lets the NN read the insulin STATE — a confounder proxy under the
    # closed loop — and its identified dose response came out INVERTED on
    # this cohort (spearman -0.23, kept on the record below); 'mech_blind'
    # masks the state and carries the response through the sign-definite
    # mechanistic S_I (models/hybrid.py HybridConfig docs)
    routings = ["mech_blind", "mech"] + ([] if args.skip_nn_arm else ["nn"])
    for routing in routings:
        stacked, config, K = load_arm(routing)
        print(f"[{routing}] loaded K={K} ensemble")
        if routing == "mech_blind":
            stacked = calibrate(routing, stacked, config)
        si = np.asarray(stacked["ode"].get("S_I", np.zeros(1)))
        print(f"[{routing}] S_I {np.round(si, 4)} k_ex "
              f"{np.round(np.asarray(stacked['ode'].get('k_ex', np.zeros(1))), 2)}",
              flush=True)

        @jax.jit
        def model_glucose(gain, target, basal, off, s=stacked, c=config):
            return ensemble_closed_loop(s, val_batch, c, gain, target, norm,
                                        basal=basal, glucose_offset=off,
                                        rate_cap=MAX_RATE)["glucose"]

        t0 = time.time()
        # In-loop bias anchoring (round-5 fix): a real sliding scale reacts
        # to MEASURED glucose, so the simulated protocol law must read
        # bias-corrected predictions. Without this, the model's level bias
        # is AMPLIFIED by the loop (predicts low -> law doses more ->
        # predicts lower), which inverted the ranking to Spearman -0.18 on
        # this cohort. The offset is fit on factual observations ONLY
        # (truth under the deployed protocol - ensemble-mean factual
        # prediction), then held fixed across every counterfactual arm.
        zero_off = jnp.zeros_like(jnp.asarray(val_fact_truth))
        g_fact0 = np.asarray(model_glucose(
            *map(jnp.asarray, DEFAULT), zero_off))
        anchor = jnp.asarray(val_fact_truth - g_fact0.mean(axis=0))
        # factual-protocol rollout anchors the delta correction: each arm's
        # predicted counterfactual delta rides on the OBSERVED factual
        # trajectory (model prediction error cancels pairwise)
        g_fact = np.asarray(model_glucose(*map(jnp.asarray, DEFAULT), anchor))
        pred, model_pp = {}, {}
        for arm in GRID:
            gl = np.asarray(model_glucose(*map(jnp.asarray, arm), anchor))
            corr = counterfactual_delta_correction(gl, g_fact,
                                                   val_fact_truth[None])
            pred[arm] = {
                "risk_robust": float(robust_delta_risk(gl, g_fact,
                                                       val_fact_truth[None])),
                "risk_corrected": float(glycemic_risk(corr)),
                "risk_raw": float(glycemic_risk(gl)),
                "tir": float(time_in_range(corr)),
                "finite": bool(np.isfinite(gl).all())}
            model_pp[arm] = per_patient_risk(np.asarray(corr), val_sid,
                                             uniq_val)
        wall = time.time() - t0
        true_pp = np.stack([per_patient_risk(val_truth_traj[k], val_sid,
                                             uniq_val) for k in GRID])
        mod_pp = np.stack([model_pp[k] for k in GRID])
        pr_rob = np.array([pred[k]["risk_robust"] for k in GRID])
        pr_corr = np.array([pred[k]["risk_corrected"] for k in GRID])
        pr_raw = np.array([pred[k]["risk_raw"] for k in GRID])
        nf = nonfactual
        boot = bootstrap_spearman(true_pp[nf], mod_pp[nf])
        arms[routing] = {
            # GATE metric: plain (lambda=1) delta-corrected risk, factual
            # arm EXCLUDED (its corrected risk equals truth by construction
            # — advisor r4 circularity finding). The robust lambda-max risk
            # is an OPTIMIZER objective, not a ranking metric: worst-case
            # inflation inverts even a perfect model's ranking on a cohort
            # whose true optimum is aggressive (robust_delta_risk docs).
            "spearman_risk": spearman(tr_all[nf], pr_corr[nf]),
            "spearman_risk_corrected": spearman(tr_all[nf], pr_corr[nf]),
            "spearman_risk_robust": spearman(tr_all[nf], pr_rob[nf]),
            "spearman_risk_raw": spearman(tr_all[nf], pr_raw[nf]),
            "spearman_corrected_bootstrap": boot,
            # full-grid variants kept on the record
            "spearman_risk_incl_factual": spearman(tr_all, pr_corr),
            "pearson_log_risk": float(np.corrcoef(
                np.log10(tr_all[nf] + 1e-6),
                np.log10(pr_corr[nf] + 1e-6))[0, 1]),
            "all_rollouts_finite": all(p["finite"] for p in pred.values()),
            "true_best_protocol": list(GRID[int(np.argmin(tr_all))]),
            "model_best_protocol":
                list(GRID[nf[int(np.argmin(pr_corr[nf]))]]),
            "grid_wall_s": round(wall, 1),
            "grid": [{"gain": g, "target": t, "basal": b,
                      "factual": (g, t, b) == DEFAULT,
                      "true_risk": val_truths[(g, t, b)]["risk"],
                      "model_risk_robust":
                          round(pred[(g, t, b)]["risk_robust"], 5),
                      "model_risk_corrected":
                          round(pred[(g, t, b)]["risk_corrected"], 5),
                      "model_risk_raw": round(pred[(g, t, b)]["risk_raw"], 5),
                      "true_hypo_frac": val_truths[(g, t, b)]["hypo_frac"],
                      "true_tir": val_truths[(g, t, b)]["tir"]}
                     for g, t, b in GRID],
        }
        print(f"[{routing}] spearman corrected "
              f"{arms[routing]['spearman_risk']:.3f} "
              f"(CI {boot['ci95']}) robust "
              f"{arms[routing]['spearman_risk_robust']:.3f} raw "
              f"{arms[routing]['spearman_risk_raw']:.3f} | "
              f"model best {arms[routing]['model_best_protocol']} "
              f"true best {arms[routing]['true_best_protocol']}")

    # ---- 2. gradient optimization through the causal ensemble -------------
    stacked, config, K = load_arm("mech_blind")
    if "mech_blind" in calib_info:  # reuse the measured scale
        stacked = dict(stacked)
        stacked["ode"] = dict(stacked["ode"])
        stacked["ode"]["k_ex"] = (stacked["ode"]["k_ex"]
                                  * calib_info["mech_blind"]["scale"])
    else:
        stacked = calibrate("mech_blind", stacked, config)
    design_batch, design_truth, design_sid = cohort_batch(DESIGN_SEED)
    print("design cohort factual:", true_risk(design_truth))

    # same in-loop bias anchoring as the grid, fit on the design cohort's
    # factual observations (see the ranking section)
    des_fact0 = ensemble_closed_loop(
        stacked, design_batch, config, *map(jnp.asarray, DEFAULT[:2]), norm,
        basal=jnp.asarray(DEFAULT[2]), rate_cap=MAX_RATE)["glucose"]
    des_anchor = jnp.asarray(design_truth) - jnp.mean(des_fact0, axis=0)

    def rollout(gain, target, basal):
        return ensemble_closed_loop(stacked, design_batch, config,
                                    gain, target, norm, basal=basal,
                                    glucose_offset=des_anchor,
                                    rate_cap=MAX_RATE)["glucose"]

    # delta-corrected objective: the factual rollout is a constant anchor
    # (gradient flows only through the candidate protocol's delta), so the
    # optimizer starts at EXACTLY the design cohort's true factual risk
    fact_design = jax.lax.stop_gradient(
        jax.jit(rollout)(*map(jnp.asarray, DEFAULT)))
    truth_design = jnp.asarray(design_truth)[None]

    def robust_obj(g):
        return robust_delta_risk(g, fact_design, truth_design)

    GAIN_BOUNDS = (0.0, 3600.0)   # clinically admissible sliding scales
    BASAL_BOUNDS = (0.0, 15000.0)
    t0 = time.time()
    opt = optimize_protocol(rollout, init_gain=DEFAULT[0],
                            init_target=DEFAULT[1], init_basal=DEFAULT[2],
                            steps=args.steps,
                            lr=args.lr, gain_bounds=GAIN_BOUNDS,
                            basal_bounds=BASAL_BOUNDS,
                            objective=robust_obj)
    opt_wall = time.time() - t0
    print(f"optimized protocol: gain {opt['gain']:.0f} target "
          f"{opt['target']:.2f} basal {opt['basal']:.0f} "
          f"(risk {opt['init_risk']:.5f} -> {opt['final_risk']:.5f}, "
          f"{opt_wall:.0f}s)")

    opt_cvar = optimize_protocol(
        rollout, init_gain=DEFAULT[0], init_target=DEFAULT[1],
        init_basal=DEFAULT[2], steps=args.steps, lr=args.lr,
        gain_bounds=GAIN_BOUNDS, basal_bounds=BASAL_BOUNDS,
        objective=lambda g: robust_delta_risk(
            g, fact_design, truth_design,
            objective=lambda gc: cvar_glycemic_risk(gc, alpha=0.25)))
    print(f"CVaR-optimized protocol: gain {opt_cvar['gain']:.0f} target "
          f"{opt_cvar['target']:.2f} basal {opt_cvar['basal']:.0f}")

    # personalized arm: per-PATIENT (gain_i, target_i, basal_i). Each design
    # window belongs to a patient; optimize patient vectors gathered per window.
    uniq = np.unique(design_sid)
    w2p = np.searchsorted(uniq, design_sid)          # window -> patient index
    P = len(uniq)

    def pp_rollout(gain_p, target_p, basal_p):
        return ensemble_closed_loop(stacked, design_batch, config,
                                    gain_p[w2p], target_p[w2p],
                                    norm, basal=basal_p[w2p],
                                    glucose_offset=des_anchor,
                                    rate_cap=MAX_RATE)["glucose"]

    opt_pp = optimize_protocol(
        pp_rollout,
        init_gain=np.full(P, DEFAULT[0], np.float32),
        init_target=np.full(P, DEFAULT[1], np.float32),
        init_basal=np.full(P, DEFAULT[2] + 1.0, np.float32),
        steps=args.steps, lr=args.lr, gain_bounds=GAIN_BOUNDS,
        basal_bounds=BASAL_BOUNDS, objective=robust_obj)
    print(f"personalized protocols (P={P}): gain [{opt_pp['gain'].min():.0f},"
          f" {opt_pp['gain'].max():.0f}] target [{opt_pp['target'].min():.2f}"
          f", {opt_pp['target'].max():.2f}] basal "
          f"[{opt_pp['basal'].min():.0f}, {opt_pp['basal'].max():.0f}]")

    # ---- deployment validation on the FRESH validation patients -----------
    def deploy_truth(seed, res, tag, fname=None):
        _, t, _ = cohort_batch(seed, (res["gain"], res["target"],
                                      res["basal"]), tag=tag, fname=fname)
        return true_risk(t)

    deploy = {
        "default_protocol": true_risk(val_fact_truth),
        "optimized_protocol": deploy_truth(VAL_SEED, opt, "val"),
        "cvar_optimized_protocol": deploy_truth(VAL_SEED, opt_cvar, "val"),
        "design_default": true_risk(design_truth),
        "design_optimized_population": deploy_truth(DESIGN_SEED, opt,
                                                    "design"),
    }
    # personalized protocols were fit on DESIGN patients; deploying them on
    # new patients is undefined — validate on the design cohort's own
    # simulator truth instead (the personalization use case: the patient
    # being treated IS the one the protocol was tuned for)
    Path("/tmp/icu_dysg_design_personalized.parquet").unlink(missing_ok=True)
    _, des_pp, _ = cohort_batch(
        DESIGN_SEED, (opt_pp["gain"], opt_pp["target"], opt_pp["basal"]),
        fname="icu_dysg_design_personalized")
    deploy["design_personalized"] = true_risk(des_pp)
    print("deployment validation:", json.dumps(deploy, indent=1))

    out = {
        "protocol": {
            "design_seed": DESIGN_SEED, "val_seed": VAL_SEED,
            "cohort": "dysglycemic", "train_cohort": "dysglycemic",
            "n_patients": args.patients, "horizon_h": HORIZON_H,
            "cohort_h": COHORT_H, "default": list(DEFAULT),
            "max_rate": MAX_RATE,
            "grid": [list(k) for k in GRID],
            "objective": "glycemic_risk (hypo 3.9 x25, hyper 10.0)",
            "delta_corrected": True,
            "in_loop_bias_anchoring": True,
            "causal_calibration": calib_info,
            "robust_lambdas": [0.5, 1.0, 2.0],
            "gain_bounds": list(GAIN_BOUNDS),
            "basal_bounds": list(BASAL_BOUNDS),
            "true_risk_spread": spread,
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
            "basal": [round(float(x), 1) for x in opt_pp["basal"]],
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
