"""Ensemble online adaptation: prediction averaging vs the guard.

The single-model benchmark (benchmarks/online_adapt.py,
results/online_adaptation.json) measured that always-on per-subject
adaptation OVERFITS short reveals — it loses at 6 h (1.401 vs 1.247) and
needs a val-selected guard to never lose (guard v3: ties at 6/12 h,
−11.5% at 24 h). Deep ensembles attack the same failure mode without a
decision rule: every member adapts independently on the revealed window
(one vmapped program, ~single-model cost) and the deployed forecast is
the ensemble MEAN — idiosyncratic per-member overfit averages out.

Protocol identical to online_adapt.py: population ensemble pretrained on
20 fresh 30 h streams (subject split), evaluated on the SAME 80 unseen
streams (seed 300), REPORT half only (the ensemble arms are
decision-free: no policy is selected, so no selection split is consumed).
Writes results/online_adaptation_ensemble.json.

Usage: python benchmarks/online_ensemble.py [--members 8] [--reuse]
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

from online_adapt import HORIZONS, MEALS, POP_CFG, STREAM_HOURS  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--subjects", type=int, default=20)
    ap.add_argument("--pretrain-epochs", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pretrain-lr", type=float, default=1e-3,
                    help="gentler than the single-model 3e-3: 30 h rk4 "
                         "rollouts with trainable ODE params NaN most "
                         "members at 3e-3 (measured; see ensemble.py guard)")
    ap.add_argument("--pretrain-clip", type=float, default=1.0)
    ap.add_argument("--anchor", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--eval-subjects", type=int, default=80)
    ap.add_argument("--eval-seed", type=int, default=300)
    ap.add_argument("--reuse", action="store_true")
    ap.add_argument("--per-member-guard-24h", action="store_true",
                    help="v2 policy at 24 h only: per-member UCB blending "
                         "(blend_mode='per_member') selected on the "
                         "selection half against the frozen v1 choice, "
                         "composed row reported on the report half")
    ap.add_argument("--steps-sweep-24h", action="store_true",
                    help="v3 policy at 24 h only: sweep adapt_steps "
                         "{100, 150} for the per-member guard on the "
                         "selection half (a 24 h reveal supports deeper "
                         "fitting; every candidate stays fit-adapted "
                         "through the holdout UCB) — pre-registered rule: "
                         "candidate replaces the 50-step incumbent iff "
                         "paired t >= 2 against it AND lower val mean; "
                         "frozen report-half row goes to "
                         "ens_policy_composed_v3")
    ap.add_argument("--policy-select", action="store_true",
                    help="select a per-horizon policy among "
                         "{no-adapt, always-on, UCB guard} on the selection "
                         "half (paired t >= 2 vs no-adapt, the single-model "
                         "benchmark's pre-registered rule), then report the "
                         "frozen composed row on the report half")
    args = ap.parse_args(argv)

    import copy
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import (
        batch_iterator,
        create_data_arrays,
        pad_batch,
        split_dataset,
    )
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.parallel.ensemble import init_ensemble, train_ensemble
    from hybrid_ode_tpu.train.loop import make_optimizer
    from hybrid_ode_tpu.train.online import ensemble_online_adaptation_eval
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    # ---- population ensemble on the SAME pretrain cohort -------------------
    T = int(STREAM_HOURS * 12) + 1
    train_csv = REPO / "results" / "online_train_cohort.csv"
    generate_4gi_dataset(
        path=str(train_csv), seed=args.seed + 1, n_subjects=args.subjects,
        duration_hours=STREAM_HOURS,
        meal_times=[m for m, _ in MEALS], meal_sizes=[s for _, s in MEALS],
    )
    train_all = create_data_arrays(str(train_csv), sequence_length=T, stride=T)
    tr, va, _ = split_dataset(train_all, 0.85, 0.15, seed=1, level="subject")

    cfg = copy.deepcopy(POP_CFG)
    cfg["model"]["use_pallas"] = False  # ensemble vmaps member weights
    config = config_from_dict(cfg)
    K = args.members
    ckpt = REPO / "checkpoints" / "online_population_ens" / "ensemble_model"

    t0 = time.time()
    if args.reuse and ckpt.exists():
        stacked, meta = load_checkpoint(str(ckpt))
        print(f"population ensemble: reusing checkpoint (K={meta['n_members']})")
    else:
        bs = cfg["training"]["batch_size"]
        batches = [pad_batch(b, bs)[0]
                   for b in batch_iterator(tr, bs, shuffle=False)]
        val_batches = [pad_batch(b, bs)[0]
                       for b in batch_iterator(va, bs, shuffle=False)]
        opt = make_optimizer(args.pretrain_lr,
                             args.pretrain_epochs, len(batches),
                             args.pretrain_clip,
                             train_ode_params=True)
        stacked, best_val, _ = train_ensemble(
            init_ensemble(jax.random.PRNGKey(0), config, K),
            opt, config, batches, val_batches, jax.random.PRNGKey(1),
            args.pretrain_epochs, lambda1=0.0, lambda2=0.01, use_physics=False)
        save_checkpoint(str(ckpt), stacked,
                        {"config": cfg, "n_members": K,
                         "best_val": [float(x) for x in best_val]})
        print(f"population ensemble pretrain: {time.time()-t0:.0f}s, "
              f"best val {np.round(best_val, 4)}")
        meta = {"best_val": [float(x) for x in best_val], "n_members": K}

    # deploy only members that converged: best-val selection already snapshots
    # each member's best epoch, but a member that NEVER trained (non-finite
    # or init-level val loss) would poison the ensemble MEAN forecast
    bv = np.asarray(meta.get("best_val", [np.nan] * K), float)
    finite = bv[np.isfinite(bv)]
    if finite.size == 0:
        raise RuntimeError(
            f"no ensemble member converged (best val {bv}) — nothing to "
            f"deploy; lower --pretrain-lr / raise --pretrain-clip")
    med = float(np.median(finite))
    keep = np.where(np.isfinite(bv) & (bv <= 3.0 * med))[0]
    if len(keep) < K:
        print(f"pruning {K - len(keep)} unconverged members "
              f"(best val {np.round(bv, 3)}); deploying {len(keep)}")
        stacked = jax.tree.map(lambda x: x[keep], stacked)
    pruned_info = {"best_val": [round(float(x), 4) for x in bv],
                   "deployed_members": int(len(keep))}
    pop_mean, pop_std = train_all.state_mean, train_all.state_std

    # ---- same eval streams, rebased to the population frame ----------------
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
    n = len(ds)
    test_idx = list(range(n // 2, n))  # the report half of online_adapt.py

    out = REPO / "results" / "online_adaptation_ensemble.json"
    rows = {}
    if args.reuse and out.exists():
        # iterate on the policy phase without re-measuring the unchanged
        # decision-free arms (deterministic given the checkpoint)
        rows = json.loads(out.read_text())
    rows["_pretrain"] = pruned_info
    for name, steps in (("ens_no_adaptation", 0),
                        ("ens_online_anchored", args.steps)):
        if name in rows:
            print(f"{name}: reusing artifact row {rows[name]}", flush=True)
            continue
        t0 = time.time()
        res = ensemble_online_adaptation_eval(
            stacked, ds, config, horizons_hours=HORIZONS,
            adapt_steps=steps, learning_rate=args.lr,
            anchor_weight=args.anchor, window_indices=test_idx)
        rows[name] = {str(h): round(v, 4) for h, v in res.items()}
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, rows[name], flush=True)

    if args.policy_select:
        from hybrid_ode_tpu.train.online import (
            adapt_subject_ensemble,
            adapt_subject_guarded_ensemble,
            ensemble_forecast_remainder_rmse,
        )

        val_idx = list(range(0, n // 2))
        g_std = float(ds.state_std[0])
        per = {h: {"none": [], "always": [], "guard": []} for h in HORIZONS}
        t0 = time.time()
        for w in val_idx:
            window = {
                "observations": ds.observations[w],
                "time_points": ds.time_points[w],
                "external_inputs": {"meal": ds.meal[w], "tVNS": ds.tvns[w]},
                "mask": ds.mask[w],
            }
            tw0 = float(ds.time_points[w, 0])
            for h in HORIZONS:
                reveal = int(np.searchsorted(ds.time_points[w], tw0 + h))
                reveal = int(np.clip(reveal, 4, len(ds.time_points[w]) - 4))
                per[h]["none"].append(g_std * ensemble_forecast_remainder_rmse(
                    stacked, ds, w, reveal, config))
                a = adapt_subject_ensemble(
                    stacked, window, config, reveal, args.steps, args.lr,
                    anchor_weight=args.anchor)
                per[h]["always"].append(g_std * ensemble_forecast_remainder_rmse(
                    a, ds, w, reveal, config))
                g = adapt_subject_guarded_ensemble(
                    stacked, window, config, reveal, args.steps, args.lr,
                    anchor_weight=args.anchor, ucb_k=0.5)
                per[h]["guard"].append(g_std * ensemble_forecast_remainder_rmse(
                    g, ds, w, reveal, config))
        sel_table, policy = {}, {}
        for h in HORIZONS:
            base = np.asarray(per[h]["none"])
            sel_table[str(h)] = {"none_val_rmse": round(float(base.mean()), 4),
                                 "n": len(val_idx), "candidates": {}}
            best_name, best_mean = "none", float(base.mean())
            for cand in ("always", "guard"):
                arr = np.asarray(per[h][cand])
                d = base - arr
                t_stat = float(d.mean() / (d.std(ddof=1) / np.sqrt(len(d)) + 1e-12))
                sel_table[str(h)]["candidates"][cand] = {
                    "val_rmse": round(float(arr.mean()), 4),
                    "paired_improvement": round(float(d.mean()), 4),
                    "t": round(t_stat, 2)}
                if t_stat >= 2.0 and float(arr.mean()) < best_mean:
                    best_name, best_mean = cand, float(arr.mean())
            sel_table[str(h)]["selected"] = best_name
            policy[h] = best_name
            print(f"policy-select h={h}: {best_name} "
                  f"({json.dumps(sel_table[str(h)]['candidates'])})", flush=True)
        rows["_policy_selection_val"] = sel_table
        rows["_policy_selection_val"]["wall_s"] = round(time.time() - t0, 1)
        rows["_policy"] = {str(h): p for h, p in policy.items()}

        # frozen composed row on the report half: reuse the measured
        # decision-free test rows; run the guard only where selected
        composed = {}
        guard_hs = [h for h, p in policy.items() if p == "guard"]
        if guard_hs:
            t0 = time.time()
            res_g = ensemble_online_adaptation_eval(
                stacked, ds, config, horizons_hours=guard_hs,
                adapt_steps=args.steps, learning_rate=args.lr,
                anchor_weight=args.anchor, guard=True, ucb_k=0.5,
                window_indices=test_idx)
            rows["_guard_report_wall_s"] = round(time.time() - t0, 1)
        for h in HORIZONS:
            if policy[h] == "none":
                composed[str(h)] = rows["ens_no_adaptation"][str(h)]
            elif policy[h] == "always":
                composed[str(h)] = rows["ens_online_anchored"][str(h)]
            else:
                composed[str(h)] = round(res_g[h], 4)
        rows["ens_policy_composed"] = composed
        print("ens_policy_composed", composed, flush=True)

    if args.per_member_guard_24h:
        from hybrid_ode_tpu.train.online import (
            adapt_subject_guarded_ensemble,
            ensemble_forecast_remainder_rmse,
        )

        h = 24.0
        val_idx = list(range(0, n // 2))
        g_std = float(ds.state_std[0])
        per_none, per_pm = [], []
        t0 = time.time()
        for w in val_idx:
            window = {
                "observations": ds.observations[w],
                "time_points": ds.time_points[w],
                "external_inputs": {"meal": ds.meal[w], "tVNS": ds.tvns[w]},
                "mask": ds.mask[w],
            }
            tw0 = float(ds.time_points[w, 0])
            reveal = int(np.searchsorted(ds.time_points[w], tw0 + h))
            reveal = int(np.clip(reveal, 4, len(ds.time_points[w]) - 4))
            per_none.append(g_std * ensemble_forecast_remainder_rmse(
                stacked, ds, w, reveal, config))
            gpm = adapt_subject_guarded_ensemble(
                stacked, window, config, reveal, args.steps, args.lr,
                anchor_weight=args.anchor, ucb_k=0.5, blend_mode="per_member")
            per_pm.append(g_std * ensemble_forecast_remainder_rmse(
                gpm, ds, w, reveal, config))
        base, arr = np.asarray(per_none), np.asarray(per_pm)
        d = base - arr
        t_stat = float(d.mean() / (d.std(ddof=1) / np.sqrt(len(d)) + 1e-12))
        v1_mean = rows.get("_policy_selection_val", {}).get(str(h), {}).get(
            "candidates", {}).get("guard", {}).get("val_rmse", np.inf)
        sel = {"none_val_rmse": round(float(base.mean()), 4),
               "per_member_val_rmse": round(float(arr.mean()), 4),
               "t_vs_none": round(t_stat, 2),
               "v1_guard_mean_val_rmse": v1_mean,
               "wall_s": round(time.time() - t0, 1)}
        use_pm = t_stat >= 2.0 and float(arr.mean()) < float(v1_mean)
        sel["selected"] = "guard_per_member" if use_pm else "v1_choice"
        rows["_per_member_selection_val_24h"] = sel
        print("per-member 24h selection:", json.dumps(sel), flush=True)

        composed2 = dict(rows.get("ens_policy_composed", {}))
        if use_pm:
            t0 = time.time()
            res_pm = ensemble_online_adaptation_eval(
                stacked, ds, config, horizons_hours=[h],
                adapt_steps=args.steps, learning_rate=args.lr,
                anchor_weight=args.anchor, guard=True, ucb_k=0.5,
                blend_mode="per_member", window_indices=test_idx)
            composed2[str(h)] = round(res_pm[h], 4)
            composed2["_24h_report_wall_s"] = round(time.time() - t0, 1)
        rows["ens_policy_composed_v2"] = composed2
        print("ens_policy_composed_v2", composed2, flush=True)

    if args.steps_sweep_24h:
        from hybrid_ode_tpu.train.online import (
            adapt_subject_guarded_ensemble,
            ensemble_forecast_remainder_rmse,
        )

        h = 24.0
        val_idx = list(range(0, n // 2))
        g_std = float(ds.state_std[0])
        cand_steps = (args.steps, 100, 150)  # incumbent first (paired ref)
        per = {s: [] for s in cand_steps}
        t0 = time.time()
        for w in val_idx:
            window = {
                "observations": ds.observations[w],
                "time_points": ds.time_points[w],
                "external_inputs": {"meal": ds.meal[w], "tVNS": ds.tvns[w]},
                "mask": ds.mask[w],
            }
            tw0 = float(ds.time_points[w, 0])
            reveal = int(np.searchsorted(ds.time_points[w], tw0 + h))
            reveal = int(np.clip(reveal, 4, len(ds.time_points[w]) - 4))
            for s in cand_steps:
                g = adapt_subject_guarded_ensemble(
                    stacked, window, config, reveal, s, args.lr,
                    anchor_weight=args.anchor, ucb_k=0.5,
                    blend_mode="per_member")
                per[s].append(g_std * ensemble_forecast_remainder_rmse(
                    g, ds, w, reveal, config))
        base = np.asarray(per[args.steps])
        sel = {"incumbent_steps": args.steps,
               "incumbent_val_rmse": round(float(base.mean()), 4),
               "candidates": {}, "n": len(val_idx)}
        best_steps, best_mean = args.steps, float(base.mean())
        for s in cand_steps[1:]:
            arr = np.asarray(per[s])
            d = base - arr
            t_stat = float(d.mean() / (d.std(ddof=1) / np.sqrt(len(d)) + 1e-12))
            sel["candidates"][str(s)] = {
                "val_rmse": round(float(arr.mean()), 4),
                "paired_improvement_vs_incumbent": round(float(d.mean()), 4),
                "t": round(t_stat, 2)}
            if t_stat >= 2.0 and float(arr.mean()) < best_mean:
                best_steps, best_mean = s, float(arr.mean())
        sel["selected_steps"] = best_steps
        sel["wall_s"] = round(time.time() - t0, 1)
        rows["_steps_sweep_selection_val_24h"] = sel
        print("24h steps-sweep selection:", json.dumps(sel), flush=True)

        composed3 = dict(rows.get("ens_policy_composed_v2",
                                  rows.get("ens_policy_composed", {})))
        composed3.pop("_24h_report_wall_s", None)
        if best_steps != args.steps:
            t0 = time.time()
            res_s = ensemble_online_adaptation_eval(
                stacked, ds, config, horizons_hours=[h],
                adapt_steps=best_steps, learning_rate=args.lr,
                anchor_weight=args.anchor, guard=True, ucb_k=0.5,
                blend_mode="per_member", window_indices=test_idx)
            composed3[str(h)] = round(res_s[h], 4)
            composed3["_24h_report_wall_s"] = round(time.time() - t0, 1)
            composed3["_24h_steps"] = best_steps
        rows["ens_policy_composed_v3"] = composed3
        print("ens_policy_composed_v3", composed3, flush=True)

    single = REPO / "results" / "online_adaptation.json"
    if single.exists():
        srows = json.loads(single.read_text())
        rows["_single_model_reference"] = {
            k: srows[k] for k in
            ("no_adaptation", "online_anchored", "online_guarded")
            if k in srows}
    rows["_protocol"] = (
        f"K={K} population ensemble, identical pretrain cohort/recipe and "
        f"eval streams as online_adapt.py; decision-free arms measured on "
        f"the report half ({len(test_idx)} subjects); every member adapts "
        f"independently ({args.steps} steps, lr {args.lr}, anchor "
        f"{args.anchor}), forecast = ensemble mean re-anchored at the last "
        f"revealed observation")
    out = REPO / "results" / "online_adaptation_ensemble.json"
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
