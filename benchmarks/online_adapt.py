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
The population model is pretrained here on its own long-stream cohort
(subject-level split) — a 5 h-window model's raw-time NN feature
extrapolates at t > 5 h and diverges.

Usage: python benchmarks/online_adapt.py [--pretrain-epochs 1500]
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


POP_CFG = {
    "data": {"path": "", "sequence_length": 361, "stride": 361,
             "normalize": True},
    "model": {"nn_hidden": 128, "nn_layers": 4, "solver": "rk4",
              "substeps": 4, "mode": "scan", "context_points": 12,
              "context_dim": 16, "use_pallas": True},
    "training": {"epochs": 1500, "batch_size": 16, "learning_rate": 3.0e-3,
                 "lambda1": 0.0, "lambda2": 0.01, "gradient_clip": 5.0,
                 "early_stopping_patience": 100000,
                 "train_ode_params": True},
    "ablation": {"no_nn": False, "no_bayes": True, "no_physics": True},
    "logging": {"tensorboard": False, "save_interval": 200},
    "seed": 0,
}


def run(args):
    import copy
    import dataclasses

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.train.loop import train_model
    from hybrid_ode_tpu.train.online import online_adaptation_eval

    # ---- population model trained on long streams (a model trained on the
    # shipped 5 h windows extrapolates its raw-time NN feature far outside
    # the training range at t=6..30 h and diverges — measured 7.6-12.4
    # mmol/L no-adaptation RMSE; the honest protocol pretrains at the
    # stream duration the manuscript's 6/12/24 h horizons imply) ----------
    T = int(STREAM_HOURS * 12) + 1  # 5-min grid
    train_csv = REPO / "results" / "online_train_cohort.csv"
    generate_4gi_dataset(
        path=str(train_csv), seed=args.seed + 1, n_subjects=args.subjects,
        duration_hours=STREAM_HOURS,
        meal_times=[m for m, _ in MEALS], meal_sizes=[s for _, s in MEALS],
    )
    train_all = create_data_arrays(str(train_csv), sequence_length=T, stride=T)
    tr, va, _ = split_dataset(train_all, 0.85, 0.15, seed=1, level="subject")
    cfg = copy.deepcopy(POP_CFG)
    cfg["data"]["path"] = str(train_csv)
    cfg["training"]["epochs"] = args.pretrain_epochs
    ckpt_dir = REPO / "checkpoints" / "online_population"
    t0 = time.time()
    if args.reuse and (ckpt_dir / "best_model").exists():
        import types

        from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

        state, _ = load_checkpoint(str(ckpt_dir / "best_model"))
        res = types.SimpleNamespace(params=state["params"],
                                    best_val_loss=float("nan"))
        print("population model: reusing checkpoint")
    else:
        res = train_model(cfg, tr, va, checkpoint_dir=str(ckpt_dir))
        print(f"population pretrain: {time.time()-t0:.0f}s, "
              f"best val {res.best_val_loss:.4f}")
    params = res.params
    config = config_from_dict(cfg)
    pop_mean, pop_std = train_all.state_mean, train_all.state_std

    # ---- fresh evaluation streams, rebased to the population frame -------
    # round 3 (confirmatory cohort): 20 eval subjects (10 val / 10 test)
    # could not resolve the 6 h adaptation question — the val half measured
    # paired t = +1.69 for adaptation, the test half t = -0.99; the policy
    # question is answered at args.eval_subjects=80 (40 selection / 40
    # report), where subject-sampling noise no longer dominates
    stream_csv = REPO / "results" / "online_stream_cohort.csv"
    generate_4gi_dataset(
        path=str(stream_csv), seed=args.eval_seed, n_subjects=args.eval_subjects,
        duration_hours=STREAM_HOURS,
        meal_times=[m for m, _ in MEALS], meal_sizes=[s for _, s in MEALS],
    )
    ds = create_data_arrays(str(stream_csv), sequence_length=T, stride=T)
    obs_phys = ds.observations * ds.state_std + ds.state_mean
    init_phys = ds.initial_state * ds.state_std + ds.state_mean
    ds = dataclasses.replace(
        ds,
        observations=((obs_phys - pop_mean) / pop_std).astype(np.float32),
        initial_state=((init_phys - pop_mean) / pop_std).astype(np.float32),
        state_mean=pop_mean, state_std=pop_std,
    )

    # round 3: split the fresh streams into policy-selection (val) and
    # report (test) halves — the per-horizon guard policy is selected on
    # val subjects (incl. the no-adaptation arm), then frozen and measured
    # on test
    n = len(ds)
    val_idx = list(range(0, n // 2))
    test_idx = list(range(n // 2, n))

    out = REPO / "results" / "online_adaptation.json"
    rows = {}
    if args.guard_only and out.exists():
        # iterate on the guard mechanism without re-measuring the unchanged
        # baseline/tuned rows (they are deterministic given the checkpoint)
        rows = json.loads(out.read_text())
    arms = [] if args.guard_only and rows else [
        ("no_adaptation", 0, 0.0),
        ("batch_retrain_anchor0", args.steps, 0.0),
        ("online_anchored", args.steps, args.anchor),
    ]
    for name, steps, anchor in arms:
        t0 = time.time()
        res = online_adaptation_eval(
            params, ds, config, horizons_hours=HORIZONS,
            adapt_steps=steps, learning_rate=args.lr, anchor_weight=anchor,
            window_indices=test_idx,
        )
        rows[name] = {str(h): round(v, 4) for h, v in res.items()}
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, rows[name], flush=True)

    # GUARDED adaptation (round 3, v3): two-level mechanism. Per subject,
    # a UCB shrinkage guard picks the deployed arm from revealed data
    # only; per horizon, `select_guard_policy` enables the guard on the
    # val half only where its paired improvement is statistically solid
    # (t >= 2, pre-registered) — the 6 h reveal-tail holdout is measurably
    # anti-predictive of the day-ahead forecast, a horizon property no
    # per-subject statistic can repair. Policy frozen, measured on test.
    if not (args.guard_only and "_guard_policy" in rows):
        from hybrid_ode_tpu.train.online import select_guard_policy

        t0 = time.time()
        policy, table = select_guard_policy(
            params, ds, config, horizons_hours=HORIZONS,
            window_indices=val_idx, adapt_steps=args.steps,
            learning_rate=args.lr, anchor_weight=args.anchor, verbose=True)
        rows["_guard_policy"] = {str(h): p for h, p in policy.items()}
        rows["_guard_selection_val"] = table
        rows["_guard_selection_val"]["wall_s"] = round(time.time() - t0, 1)
    else:
        policy = {float(h): p for h, p in rows["_guard_policy"].items()}

    t0 = time.time()
    res = online_adaptation_eval(
        params, ds, config, horizons_hours=HORIZONS,
        policy=policy, window_indices=test_idx)
    rows["online_guarded"] = {str(h): round(v, 4) for h, v in res.items()}
    rows["online_guarded"]["wall_s"] = round(time.time() - t0, 1)
    print("online_guarded", rows["online_guarded"], flush=True)

    rows["_manuscript_targets_mmol"] = {
        "batch_retrain": {"6.0": 0.86, "12.0": 0.78, "24.0": 0.70},
        "online": {"6.0": 0.82, "12.0": 0.72, "24.0": 0.65},
    }
    rows["_protocol"] = (
        f"population model trained on {args.subjects} fresh {STREAM_HOURS}h "
        f"streams (subject-level split); evaluated on {args.eval_subjects} "
        f"UNSEEN {STREAM_HOURS}h streams (meals at {[m for m, _ in MEALS]}h; "
        f"{len(val_idx)} policy-selection / {len(test_idx)} report); adapt "
        f"NN on first h hours ({args.steps} steps, lr {args.lr}), glucose "
        f"RMSE on the remainder vs noisy obs (mmol/L)"
    )
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=20)
    ap.add_argument("--pretrain-epochs", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--anchor", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--eval-subjects", type=int, default=80,
                    help="confirmatory eval cohort size (half selection, "
                         "half report)")
    ap.add_argument("--eval-seed", type=int, default=300)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse checkpoints/online_population instead of "
                         "pretraining")
    ap.add_argument("--guard-only", action="store_true",
                    help="re-measure only the guarded row, merging into the "
                         "existing results JSON")
    args = ap.parse_args()
    run(args)
