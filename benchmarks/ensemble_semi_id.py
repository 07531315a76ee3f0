"""Semi-amortized ensemble identification (VERDICT r3 #5).

The best-estimator pipeline (benchmarks/ensemble_id.py: K=8 params-mode
ensemble + per-member MAP identification, fresh 0.606 / test 0.543) costs
`id_steps`=150 ODE-solve Adam iterations x K members per deployment batch.
This benchmark distills that into ONE shared encoder
(`parallel.ensemble.amortize_ensemble_encoder`: a single MLP whose
K*ctx_dim-wide head emits every member's latent from the window prefix)
and deploys SEMI-AMORTIZED: one MLP pass + <=15 refinement steps per
member (`identify_context(init=...)`, whose per-window best-iterate guard
means refinement can only improve each window's data misfit over the
amortized initialization).

Protocol: identical ensemble recipe + fresh-cohort evaluation as
ensemble_id.py (same seeds); the amortization cohort is a DISJOINT
simulated cohort (seed 777). Target (VERDICT): fresh-cohort RMSE within
2%% of full per-member identification at <= 1/3 the identification wall.

Writes results/ensemble_semi_id.json.
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
    ap.add_argument("--epochs", type=int, default=2500)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--id-steps", type=int, default=150)
    ap.add_argument("--semi-steps", type=int, default=15)
    ap.add_argument("--points", type=int, default=36)
    ap.add_argument("--fresh-subjects", type=int, default=50)
    ap.add_argument("--amortize-subjects", type=int, default=200)
    ap.add_argument("--enc-epochs", type=int, default=3000)
    ap.add_argument("--sweep", action="store_true",
                    help="refinement-depth sweep: select steps on a DISJOINT "
                         "selection cohort (seed 555), report the frozen "
                         "choice (and the whole curve) on the fresh cohort")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import (
        GlucoseDataset, batch_iterator, create_data_arrays, pad_batch,
        split_dataset)
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward, config_from_dict, identify_context)
    from hybrid_ode_tpu.parallel.ensemble import (
        amortize_ensemble_encoder, encode_ensemble_context, init_ensemble,
        train_ensemble)
    from hybrid_ode_tpu.train.loop import make_optimizer
    from hybrid_ode_tpu.utils.config import default_config

    # ---- identical recipe to ensemble_id.py (same seeds) -------------------
    cfg = default_config()
    data_path = str(REPO / "data" / "4gi_dataset.csv")
    cfg["data"]["path"] = data_path
    cfg["model"].update(
        solver="rk4", substeps=4, mode="scan", nn_hidden=128, nn_layers=4,
        context_points=12, context_mode="params",
        context_params=["G_b", "I_b", "Glu_b"], use_pallas=False,
    )
    cfg["training"].update(
        epochs=args.epochs, batch_size=args.batch_size, learning_rate=3e-3,
        lambda1=0.0, lambda2=0.01, train_ode_params=True,
    )
    config = config_from_dict(cfg)

    ds = create_data_arrays(data_path)
    tr, va, te = split_dataset(ds, seed=42)
    K = args.members
    batches = [pad_batch(b, args.batch_size)[0]
               for b in batch_iterator(tr, args.batch_size, shuffle=False)]
    val_batches = [pad_batch(b, args.batch_size)[0]
                   for b in batch_iterator(va, args.batch_size, shuffle=False)]
    opt = make_optimizer(3e-3, args.epochs, len(batches), 5.0,
                         train_ode_params=True)
    t0 = time.time()
    stacked, best_val, _ = train_ensemble(
        init_ensemble(jax.random.PRNGKey(0), config, K),
        opt, config, batches, val_batches, jax.random.PRNGKey(1),
        args.epochs, lambda1=0.0, lambda2=0.01, use_physics=False)
    print(f"trained {K} members in {time.time()-t0:.1f}s; "
          f"best val {np.round(best_val, 4)}", flush=True)

    def renorm_cohort(path, seed, n_subjects):
        df = generate_4gi_dataset(path, seed=seed, n_subjects=n_subjects)
        raw = create_data_arrays(path)
        phys = raw.observations * raw.state_std + raw.state_mean
        renorm = (phys - ds.state_mean) / ds.state_std
        cohort = GlucoseDataset(
            initial_state=renorm[:, 0].astype(np.float32),
            observations=renorm.astype(np.float32),
            time_points=raw.time_points, meal=raw.meal,
            tvns=raw.tvns, mask=raw.mask,
            state_mean=ds.state_mean, state_std=ds.state_std,
            subject_ids=raw.subject_ids, loss_weights=ds.loss_weights,
        )
        truth = {sid: sub["glucose_true_mmol_L"].to_numpy()
                 for sid, sub in df.groupby("subject_id")}
        tarr = np.stack([truth[cohort.subject_ids[w]]
                         for w in range(len(cohort))])
        return cohort, tarr

    # ---- one-time amortization on a disjoint simulated cohort --------------
    amor, _ = renorm_cohort("/tmp/4gi_amortize_cohort.csv", 777,
                            args.amortize_subjects)
    amor_batch = amor.batch(np.arange(len(amor)))
    t0 = time.time()
    enc, info = amortize_ensemble_encoder(
        stacked, amor_batch, config, points=args.points,
        key=jax.random.PRNGKey(5), id_steps=args.id_steps,
        epochs=args.enc_epochs)
    amortize_wall = time.time() - t0
    print(f"amortized in {amortize_wall:.1f}s; {json.dumps(info)}", flush=True)

    # ---- fresh-cohort deployment comparison (ensemble_id.py protocol) ------
    fresh, tarr = renorm_cohort("/tmp/4gi_cohort_ens_id.csv", 123,
                                args.fresh_subjects)
    batch = fresh.batch(np.arange(len(fresh)))
    D = len(config.context_params)

    def ens_rmse_on(cohort, truth, ctxs):
        def one(p, ctx):
            controls = Controls(
                ts=jnp.asarray(cohort.time_points),
                signals={"meal": jnp.asarray(cohort.meal),
                         "tVNS": jnp.asarray(cohort.tvns), "context": ctx})
            return batched_forward(
                p, jnp.asarray(cohort.initial_state),
                jnp.asarray(cohort.time_points), controls, config)
        preds = np.asarray(jax.vmap(one)(stacked, ctxs))
        phys_k = preds * cohort.state_std + cohort.state_mean
        return float(np.sqrt(np.mean((phys_k[:, :, :, 0].mean(0) - truth) ** 2)))

    def ens_rmse(ctxs):
        return ens_rmse_on(fresh, tarr, ctxs)

    arms = {}

    # full per-member identification (the incumbent)
    ident_full = jax.jit(jax.vmap(
        lambda p: identify_context(p, batch, config, steps=args.id_steps,
                                   lr=0.02, prior_std=0.3,
                                   points=args.points)))
    ctxs = ident_full(stacked)
    ctxs.block_until_ready()  # compile outside the timed window
    t0 = time.time()
    ctxs = ident_full(stacked)
    ctxs.block_until_ready()
    arms["full_identification"] = {
        "steps": args.id_steps, "wall_s": round(time.time() - t0, 3),
        "fresh_rmse": round(ens_rmse(ctxs), 4)}

    # amortized only: one shared MLP pass
    enc_fn = jax.jit(lambda: encode_ensemble_context(
        enc, jnp.asarray(fresh.observations), jnp.asarray(fresh.time_points),
        args.points, K, D))
    ctx0 = enc_fn()
    ctx0.block_until_ready()
    t0 = time.time()
    ctx0 = enc_fn()
    ctx0.block_until_ready()
    arms["amortized_only"] = {
        "steps": 0, "wall_s": round(time.time() - t0, 3),
        "fresh_rmse": round(ens_rmse(ctx0), 4)}

    # semi-amortized: encoder init + <=15 refinement steps per member
    ident_semi = jax.jit(jax.vmap(
        lambda p, c0: identify_context(p, batch, config,
                                       steps=args.semi_steps, lr=0.02,
                                       prior_std=0.3, points=args.points,
                                       init=c0)))
    ctxs_semi = ident_semi(stacked, ctx0)
    ctxs_semi.block_until_ready()
    t0 = time.time()
    ctxs_semi = ident_semi(stacked, enc_fn())
    ctxs_semi.block_until_ready()
    arms["semi_amortized"] = {
        "steps": args.semi_steps, "wall_s": round(time.time() - t0, 3),
        "fresh_rmse": round(ens_rmse(ctxs_semi), 4)}

    sweep = None
    if args.sweep:
        # Refinement-depth sweep with leakage-free selection: steps chosen on
        # a DISJOINT simulated selection cohort (seed 555 — distinct from the
        # amortization cohort 777 and the fresh report cohort 123), then the
        # frozen choice reported on the fresh cohort. The full fresh curve is
        # published as a measurement; the headline is the SELECTED arm only.
        sel_cohort, sel_truth = renorm_cohort(
            "/tmp/4gi_cohort_semi_sel.csv", 555, args.fresh_subjects)
        sel_batch = sel_cohort.batch(np.arange(len(sel_cohort)))
        sel_ctx0 = jax.jit(lambda: encode_ensemble_context(
            enc, jnp.asarray(sel_cohort.observations),
            jnp.asarray(sel_cohort.time_points), args.points, K, D))()

        depths = (5, 15, 30, 50, 100)
        sel_curve, fresh_curve, wall_curve = {}, {}, {}
        for s in depths:
            ident_s = jax.jit(jax.vmap(
                lambda p, c0, s=s: identify_context(
                    p, sel_batch, config, steps=s, lr=0.02, prior_std=0.3,
                    points=args.points, init=c0)))
            sel_curve[str(s)] = round(
                ens_rmse_on(sel_cohort, sel_truth, ident_s(stacked, sel_ctx0)),
                4)
            ident_f = jax.jit(jax.vmap(
                lambda p, c0, s=s: identify_context(
                    p, batch, config, steps=s, lr=0.02, prior_std=0.3,
                    points=args.points, init=c0)))
            cf = ident_f(stacked, ctx0)
            cf.block_until_ready()
            t0 = time.time()
            cf = ident_f(stacked, enc_fn())
            cf.block_until_ready()
            wall_curve[str(s)] = round(time.time() - t0, 3)
            fresh_curve[str(s)] = round(ens_rmse(cf), 4)
            print(f"depth {s}: selection {sel_curve[str(s)]}, "
                  f"fresh {fresh_curve[str(s)]}", flush=True)
        chosen = min(depths, key=lambda s: sel_curve[str(s)])
        sweep = {
            "depths": list(depths),
            "selection_cohort_seed": 555,
            "selection_rmse": sel_curve,
            "fresh_rmse_curve": fresh_curve,
            "fresh_wall_s_curve": wall_curve,
            "selected_steps": chosen,
            "fresh_rmse_at_selected": fresh_curve[str(chosen)],
        }

    full = arms["full_identification"]
    semi = arms["semi_amortized"]
    results = {
        "n_members": K,
        "amortize_wall_s_one_time": round(amortize_wall, 1),
        "encoder_info": info,
        "arms": arms,
        "semi_rmse_vs_full_pct": round(
            100 * (semi["fresh_rmse"] / full["fresh_rmse"] - 1), 2),
        "semi_wall_vs_full": round(semi["wall_s"] / full["wall_s"], 3),
        "_target": "semi within +2% RMSE of full at <=1/3 wall (VERDICT r3 #5)",
    }
    if sweep is not None:
        results["depth_sweep"] = sweep
    out = REPO / "results" / "ensemble_semi_id.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
