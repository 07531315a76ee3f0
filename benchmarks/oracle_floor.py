"""Oracle floor for the fresh-cohort accuracy gate (VERDICT r4 missing #1).

The reference claims 0.45 +- 0.03 mmol/L glucose RMSE vs simulated ground
truth on held-out subjects (`/root/reference/manuscript.tex:690`; README
claim < 0.5, `/root/reference/README.md:187`). This framework's best
measured estimator sits at 0.543 (test split) / 0.554-0.606 (fresh cohort)
— results/ensemble_id.json, results/ensemble_semi_id.json — while the
reference's own code scores 2.57 on matched data (results/head2head.json).

This benchmark bounds what is ACHIEVABLE for the hybrid model family on
the matched fresh-cohort protocol by giving the estimator oracle access
nothing deployable could have:

  arm `identified_noisy36`   — the shipped estimator (36 noisy obs): baseline.
  arm `identified_true36`    — same 36 identification points but NOISELESS
                               (isolates the observation-noise contribution
                               to identification error).
  arm `oracle_context`       — per-member context identified on the FULL
                               61-point noiseless truth, 400 steps: the
                               floor of context-mode identification.
  arm `oracle_params`        — per-window multiplicative refinement of ALL
                               mechanistic parameters (17 log-scale deltas
                               per window per member) fit directly on the
                               full noiseless truth with per-window
                               best-iterate selection: the model-FAMILY
                               floor ("fit with true per-subject identity").

Decision rule written into the artifact: if even `oracle_params` cannot
reach < 0.5 mmol/L on the fresh cohort, the reference's 0.45 claim is
below the achievable floor of this model family on matched data (their
number cannot come from this protocol — consistent with their own code
measuring 2.57); if it CAN, the remaining gap is estimator work, not
model capacity.

Writes results/oracle_floor.json.
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
    ap.add_argument("--id-steps", type=int, default=150)
    ap.add_argument("--oracle-steps", type=int, default=400)
    ap.add_argument("--points", type=int, default=36)
    ap.add_argument("--fresh-subjects", type=int, default=50)
    ap.add_argument("--reuse", action="store_true",
                    help="load checkpoints/ensemble_id instead of retraining")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import pandas as pd

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import (
        GlucoseDataset, batch_iterator, create_data_arrays, pad_batch,
        split_dataset)
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import (
        config_from_dict, forward, identify_context)
    from hybrid_ode_tpu.parallel.ensemble import (
        identify_ensemble_context, init_ensemble, train_ensemble)
    from hybrid_ode_tpu.train.loop import make_optimizer
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from hybrid_ode_tpu.utils.config import default_config

    # ---- identical recipe to benchmarks/ensemble_id.py --------------------
    cfg = default_config()
    data_path = str(REPO / "data" / "4gi_dataset.csv")
    cfg["data"]["path"] = data_path
    cfg["model"].update(
        solver="rk4", substeps=4, mode="scan", nn_hidden=128, nn_layers=4,
        context_points=12, context_mode="params",
        context_params=["G_b", "I_b", "Glu_b"], use_pallas=False)
    cfg["training"].update(
        epochs=args.epochs, batch_size=8, learning_rate=3e-3,
        lambda1=0.0, lambda2=0.01, train_ode_params=True)
    config = config_from_dict(cfg)

    ds = create_data_arrays(data_path)
    tr, va, _ = split_dataset(ds, seed=42)
    K = args.members
    ckpt = REPO / "checkpoints" / "ensemble_id" / "ensemble_model"
    if args.reuse and ckpt.exists():
        stacked, meta = load_checkpoint(str(ckpt))
        print(f"reusing ensemble_id checkpoint (K={meta['n_members']})")
    else:
        batches = [pad_batch(b, 8)[0]
                   for b in batch_iterator(tr, 8, shuffle=False)]
        val_batches = [pad_batch(b, 8)[0]
                       for b in batch_iterator(va, 8, shuffle=False)]
        opt = make_optimizer(3e-3, args.epochs, len(batches), 5.0,
                             train_ode_params=True)
        t0 = time.time()
        stacked, best_val, _ = train_ensemble(
            init_ensemble(jax.random.PRNGKey(0), config, K),
            opt, config, batches, val_batches, jax.random.PRNGKey(1),
            args.epochs, lambda1=0.0, lambda2=0.01, use_physics=False)
        print(f"trained {K} x {args.epochs} epochs in {time.time()-t0:.0f}s")
        save_checkpoint(str(ckpt), stacked,
                        {"config": cfg, "n_members": K,
                         "best_val": [float(x) for x in best_val]})

    # ---- fresh cohort in the training normalization (ensemble_id protocol)
    fresh_path = "/tmp/4gi_cohort_oracle.csv"
    df = generate_4gi_dataset(fresh_path, seed=123,
                              n_subjects=args.fresh_subjects)
    raw = create_data_arrays(fresh_path)
    phys = raw.observations * raw.state_std + raw.state_mean
    renorm = (phys - ds.state_mean) / ds.state_std
    fresh = GlucoseDataset(
        initial_state=renorm[:, 0].astype(np.float32),
        observations=renorm.astype(np.float32),
        time_points=raw.time_points, meal=raw.meal,
        tvns=raw.tvns, mask=raw.mask,
        state_mean=ds.state_mean, state_std=ds.state_std,
        subject_ids=raw.subject_ids, loss_weights=ds.loss_weights)
    truth = {sid: sub for sid, sub in df.groupby("subject_id")}
    tarr = np.stack([truth[fresh.subject_ids[w]]
                     ["glucose_true_mmol_L"].to_numpy()
                     for w in range(len(fresh))])
    batch = fresh.batch(np.arange(len(fresh)))
    B, T = fresh.time_points.shape

    # noiseless batch: the 4 observed channels replaced by renormalized truth
    TRUE_COLS = {"glucose_true_mmol_L": 0, "insulin_true_pmol_L": 1,
                 "glucagon_true_pmol_L": 2, "glp1_true_pmol_L": 3}
    obs_true = np.array(fresh.observations)
    for col, ch in TRUE_COLS.items():
        vals = np.stack([truth[fresh.subject_ids[w]][col].to_numpy()
                         for w in range(len(fresh))])
        obs_true[:, :, ch] = ((vals - ds.state_mean[ch]) / ds.state_std[ch])
    batch_true = dict(batch)
    batch_true["observations"] = jnp.asarray(obs_true)
    # y0 from the noiseless state too (oracle knows the true initial point)
    batch_true["initial_state"] = jnp.asarray(obs_true[:, 0])

    signals = {"meal": jnp.asarray(fresh.meal), "tVNS": jnp.asarray(fresh.tvns)}
    ts_j = jnp.asarray(fresh.time_points)

    from hybrid_ode_tpu.models.hybrid import batched_forward

    def member_rollouts(ctxs, y0):
        def one(p, ctx):
            c = Controls(ts=ts_j, signals={**signals, "context": ctx})
            return batched_forward(p, y0, ts_j, c, config)
        return np.asarray(jax.vmap(one)(stacked, ctxs))

    def glucose_rmse(preds_k, y_true=tarr):
        g = preds_k[..., 0] * float(ds.state_std[0]) + float(ds.state_mean[0])
        return float(np.sqrt(np.mean((g.mean(0) - y_true) ** 2)))

    results = {"n_members": K, "fresh_subjects": args.fresh_subjects,
               "protocol": "ensemble_id.py fresh cohort (seed 123), "
                           "glucose RMSE vs noiseless truth, ensemble mean"}

    # ---- arm a: shipped estimator (noisy, 36 points) ----------------------
    t0 = time.time()
    ctxs = identify_ensemble_context(stacked, batch, config,
                                     steps=args.id_steps, lr=0.02,
                                     prior_std=0.3, points=args.points)
    preds = member_rollouts(ctxs, jnp.asarray(batch["initial_state"]))
    results["identified_noisy36"] = round(glucose_rmse(preds), 4)
    print(f"identified_noisy36: {results['identified_noisy36']} "
          f"({time.time()-t0:.0f}s)")

    # ---- arm b: same points, noiseless -------------------------------------
    ctxs_t = identify_ensemble_context(stacked, batch_true, config,
                                       steps=args.id_steps, lr=0.02,
                                       prior_std=0.3, points=args.points)
    preds_t = member_rollouts(ctxs_t, jnp.asarray(batch_true["initial_state"]))
    results["identified_true36"] = round(glucose_rmse(preds_t), 4)
    print(f"identified_true36: {results['identified_true36']}")

    # ---- arm c: oracle context (full noiseless trajectory) -----------------
    ctxs_o = identify_ensemble_context(stacked, batch_true, config,
                                       steps=args.oracle_steps, lr=0.02,
                                       prior_std=1.0, points=int(T))
    preds_o = member_rollouts(ctxs_o, jnp.asarray(batch_true["initial_state"]))
    results["oracle_context"] = round(glucose_rmse(preds_o), 4)
    print(f"oracle_context: {results['oracle_context']}")

    # ---- arm d: oracle per-window mechanistic parameters -------------------
    # per-window log-scale multipliers on ALL ode params (subsumes the
    # 3-basal context mode), fit on the full noiseless truth per member,
    # per-window best-iterate selection (identify_context's guard, extended)
    names = sorted(stacked["ode"].keys())
    P = len(names)
    mask_j = jnp.asarray(fresh.mask)
    obs_j = jnp.asarray(obs_true)
    y0_j = jnp.asarray(obs_true[:, 0])

    def member_oracle(p_member, ctx_member):
        def window_loss(delta_w, ctx_w, y0_w, ts_w, obs_w, m_w, meal_w, tv_w):
            ode = {k: p_member["ode"][k] * jnp.exp(delta_w[i])
                   for i, k in enumerate(names)}
            pw = {**p_member, "ode": ode}
            c = Controls(ts=ts_w, signals={"meal": meal_w, "tVNS": tv_w,
                                           "context": ctx_w})
            traj = forward(pw, y0_w, ts_w, c, config)
            se = (traj - obs_w) ** 2
            return jnp.sum(se * m_w[:, None]) / (jnp.sum(m_w) * se.shape[-1]
                                                 + 1e-8)

        def batch_loss(deltas):
            return jax.vmap(window_loss)(
                deltas, ctx_member, y0_j, ts_j, obs_j, mask_j,
                signals["meal"], signals["tVNS"])

        opt = optax.adam(0.02)
        deltas0 = jnp.zeros((B, P))
        state0 = opt.init(deltas0)

        def step(carry, _):
            deltas, ostate, best_d, best_l = carry
            losses, g = jax.vmap(jax.value_and_grad(window_loss),
                                 in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
                deltas, ctx_member, y0_j, ts_j, obs_j, mask_j,
                signals["meal"], signals["tVNS"])
            upd, ostate = opt.update(g, ostate)
            new = optax.apply_updates(deltas, upd)
            better = losses < best_l
            best_d = jnp.where(better[:, None], deltas, best_d)
            best_l = jnp.where(better, losses, best_l)
            return (new, ostate, best_d, best_l), None

        init_l = batch_loss(deltas0)
        (deltas, _, best_d, best_l), _ = jax.lax.scan(
            step, (deltas0, state0, deltas0, init_l), None,
            length=args.oracle_steps)
        final_l = batch_loss(deltas)
        better = final_l < best_l
        return jnp.where(better[:, None], deltas, best_d)

    t0 = time.time()
    deltas_k = jax.vmap(member_oracle)(stacked, ctxs_o)
    deltas_k = jax.block_until_ready(deltas_k)
    print(f"oracle_params fit: {time.time()-t0:.0f}s")

    def one_param_rollout(p_member, ctx_member, deltas_member):
        def one_w(delta_w, ctx_w, y0_w, ts_w, meal_w, tv_w):
            ode = {k: p_member["ode"][k] * jnp.exp(delta_w[i])
                   for i, k in enumerate(names)}
            pw = {**p_member, "ode": ode}
            c = Controls(ts=ts_w, signals={"meal": meal_w, "tVNS": tv_w,
                                           "context": ctx_w})
            return forward(pw, y0_w, ts_w, c, config)
        return jax.vmap(one_w)(deltas_member, ctx_member, y0_j, ts_j,
                               signals["meal"], signals["tVNS"])

    preds_p = np.asarray(jax.vmap(one_param_rollout)(stacked, ctxs_o, deltas_k))
    results["oracle_params"] = round(glucose_rmse(preds_p), 4)
    print(f"oracle_params: {results['oracle_params']}")

    floor = min(results["oracle_context"], results["oracle_params"])
    results["floor_mmol"] = round(floor, 4)
    results["reference_claim"] = 0.45
    results["gate"] = 0.5
    results["claim_below_family_floor"] = bool(floor >= 0.5)
    results["_context"] = {
        "best_deployable_fresh": 0.554,
        "best_deployable_test": 0.543,
        "reference_code_on_matched_data": 2.57,
        "sources": ["results/ensemble_semi_id.json", "results/ensemble_id.json",
                    "results/head2head.json"]}
    out = REPO / "results" / "oracle_floor.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
