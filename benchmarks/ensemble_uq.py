"""Deep-ensemble UQ benchmark: K models trained in ONE vmapped program.

The round-3 ensemble-parallel layer (parallel/ensemble.py) makes deep
ensembles (Lakshminarayanan et al. 2017) nearly free on a chip: the K-member
train step is one XLA program (members' small matmuls batch into MXU-filling
ones), and the member axis shards over a mesh. This benchmark measures what
the capability BUYS:

  1. member scaling — wall per step at K=1 vs K=8 (how sub-linear the
     vmapped ensemble actually is on the chip);
  2. UQ quality — ensemble predictive (member spread + moment-matched
     per-state observation noise, per-state recalibration on val) scored
     with the same metric path as the VI arms in benchmarks/uq_calibration.py
     (parity target: manuscript.tex:707-720 UQ table, ECE 0.08 / Cov95 0.95).

Protocol mirrors uq_calibration.py: 4gi_dataset.csv, split_dataset(seed=42),
tuned recipe (configs/4gi_tuned.yaml) with use_pallas stripped (the ensemble
path vmaps over member weights — generic XLA solver; see
parallel/ensemble.py docstring). Writes results/ensemble_uq.json.

Usage: python benchmarks/ensemble_uq.py [--members 8] [--epochs 1500]
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


def collect_ensemble_predictive(stacked, ds, config, noise_sigma, batch_size=8):
    """Shared implementation: parallel.ensemble.collect_ensemble_predictive."""
    import jax.numpy as jnp

    from hybrid_ode_tpu.parallel.ensemble import (
        collect_ensemble_predictive as _collect,
    )

    return _collect(stacked, ds, config, noise_sigma=jnp.asarray(noise_sigma),
                    batch_size=batch_size)


def metrics_at(preds, unc, targs, mask, scale=1.0):
    from hybrid_ode_tpu.evals.metrics import (
        compute_calibration_error,
        compute_coverage,
        compute_crps,
        compute_nll,
    )

    u = np.asarray(scale) * unc
    out = compute_calibration_error(preds, u, targs, mask=mask)
    out["coverage_80"] = compute_coverage(preds, u, targs, 0.8, mask=mask)
    out["coverage_90"] = compute_coverage(preds, u, targs, 0.9, mask=mask)
    out["nll"] = compute_nll(preds, u, targs, mask=mask)
    out["crps"] = compute_crps(preds, u, targs, mask=mask)
    return {k: round(float(v), 4) for k, v in out.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--scaling-steps", type=int, default=100,
                    help="steps timed for the K=1 vs K=N scaling measurement")
    ap.add_argument("--recal-floor", type=float, default=None,
                    help="val 95%%-coverage floor for per-state recalibration. "
                         "Default None = select it WITHOUT touching test: "
                         "sweep candidate floors, fit the scale on val at "
                         "each, and pick the smallest whose coverage on a "
                         "fresh SIMULATED cohort (disjoint seed, zero test "
                         "leakage) reaches nominal 95%%. The val split is ONE "
                         "subject, so fitting at nominal generalizes short — "
                         "the margin must come from held-out evidence, not "
                         "from inspecting test (advisor r3 finding).")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import batch_iterator, create_data_arrays, pad_batch, split_dataset
    from hybrid_ode_tpu.evals.metrics import fit_per_state_recalibration
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.parallel.ensemble import (
        init_ensemble,
        init_ensemble_state,
        make_ensemble_train_step,
    )
    from hybrid_ode_tpu.train.loop import make_optimizer

    cfg_dict = yaml.safe_load((REPO / "configs" / "4gi_tuned.yaml").read_text())
    # ensemble path vmaps over member weights -> generic XLA solver
    config = config_from_dict(cfg_dict, use_pallas=False)
    tr_cfg = cfg_dict["training"]

    ds = create_data_arrays(str(REPO / "data" / "4gi_dataset.csv"),
                            sequence_length=61,
                            stride=cfg_dict["data"].get("stride", 30))
    tr, va, te = split_dataset(ds, seed=42)
    print(f"windows: train {len(tr)} / val {len(va)} / test {len(te)}")

    K = args.members
    steps_per_epoch = max(1, (len(tr) + args.batch_size - 1) // args.batch_size)
    opt = make_optimizer(tr_cfg["learning_rate"], args.epochs, steps_per_epoch,
                         tr_cfg.get("gradient_clip", 5.0),
                         train_ode_params=tr_cfg.get("train_ode_params", False))
    lam1 = tr_cfg.get("lambda1", 0.0)
    lam2 = tr_cfg.get("lambda2", 0.01)
    use_phys = not cfg_dict.get("ablation", {}).get("no_physics", False)

    step = make_ensemble_train_step(opt, config, lam1, lam2, use_phys)

    # ---- member-scaling measurement: steady-state step wall vs K ----------
    batches = [pad_batch(b, args.batch_size)[0]
               for b in batch_iterator(tr, args.batch_size, shuffle=False)]
    scaling = {}

    # plain (unvmapped) single-model step: the production K=1 baseline
    from hybrid_ode_tpu.models.hybrid import init_hybrid_params
    from hybrid_ode_tpu.train.loop import TrainState, make_train_step

    pstep = make_train_step(opt, config, lam1, lam2, use_phys)
    p0 = init_hybrid_params(jax.random.PRNGKey(0), config)
    pst = TrainState(p0, opt.init(p0), jnp.asarray(0, jnp.int32))
    key = jax.random.PRNGKey(100)
    key, sk = jax.random.split(key)
    pst, m = pstep(pst, batches[0], sk)
    # axon gotcha: block_until_ready returns early on queued remote work —
    # a scalar materialisation (float()) is the only reliable fence
    float(np.asarray(m["loss"]).sum())
    t0 = time.time()
    for i in range(args.scaling_steps):
        key, sk = jax.random.split(key)
        pst, m = pstep(pst, batches[i % len(batches)], sk)
    float(np.asarray(m["loss"]).sum())
    scaling["step_ms_plain_single"] = round(
        (time.time() - t0) / args.scaling_steps * 1e3, 2)

    for k_meas in sorted({1, K, 16, 32, 64}):
        st = init_ensemble_state(opt, init_ensemble(jax.random.PRNGKey(0), config, k_meas))
        key, sk = jax.random.split(key)
        st, m = step(st, batches[0], jax.random.split(sk, k_meas))  # compile
        float(np.asarray(m["loss"]).sum())
        t0 = time.time()
        for i in range(args.scaling_steps):
            key, sk = jax.random.split(key)
            st, m = step(st, batches[i % len(batches)], jax.random.split(sk, k_meas))
        float(np.asarray(m["loss"]).sum())
        scaling[f"step_ms_k{k_meas}"] = round((time.time() - t0) / args.scaling_steps * 1e3, 2)
    # pipelined steady-state throughput (dispatches overlap on the async
    # queue) — the production-relevant number, not latency. The vmapped
    # member axis turns the scan body's latency-bound tiny kernels into
    # batched MXU work, so a whole ensemble can cost LESS wall than one
    # plain step (measured; see RESULTS.md).
    scaling["kx_cost_ratio_vs_plain"] = round(
        scaling[f"step_ms_k{K}"] / scaling["step_ms_plain_single"], 3)
    print("scaling:", json.dumps(scaling))

    # ---- train the ensemble ------------------------------------------------
    state = init_ensemble_state(opt, init_ensemble(jax.random.PRNGKey(0), config, K))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for epoch in range(args.epochs):
        for b in batches:
            key, sk = jax.random.split(key)
            state, metrics = step(state, b, jax.random.split(sk, K))
        if epoch % 200 == 0:
            losses = np.asarray(metrics["loss"])  # scalar fence + progress
            print(f"epoch {epoch}: member losses {np.round(losses, 2)}")
    float(np.asarray(metrics["loss"]).sum())  # force completion (axon queue)
    wall = time.time() - t0
    final_losses = np.asarray(metrics["loss"])
    print(f"trained {K} members x {args.epochs} epochs in {wall:.1f}s; "
          f"final losses {np.round(final_losses, 3)}")

    # ---- moment-matched per-state observation noise (val split) -----------
    from hybrid_ode_tpu.parallel.ensemble import ensemble_forward

    bva, valid = pad_batch(next(batch_iterator(va, args.batch_size, shuffle=False)),
                           args.batch_size)
    trajs = np.asarray(ensemble_forward(state.params, bva, config))  # (K,B,T,6)
    nb = int(valid.sum())
    m_ = trajs[:, :nb].mean(axis=0)
    v_ = trajs[:, :nb].var(axis=0)
    resid2 = (np.asarray(bva["observations"])[:nb] - m_) ** 2
    w = np.asarray(bva["mask"])[:nb][..., None] * np.ones_like(resid2)
    num = (resid2 * w).sum(axis=(0, 1))
    den = np.maximum(w.sum(axis=(0, 1)), 1.0)
    mem = (v_ * w).sum(axis=(0, 1)) / den
    sigma = np.sqrt(np.maximum(num / den - mem, 1e-4))  # (6,)
    print("per-state noise sigma (moment-matched on val):", np.round(sigma, 4))

    # ---- UQ metrics: raw + per-state recalibration (fit on val) -----------
    pv, uv, tv, mv = collect_ensemble_predictive(state.params, va, config, sigma,
                                                 args.batch_size)
    pt, ut, tt, mt = collect_ensemble_predictive(state.params, te, config, sigma,
                                                 args.batch_size)
    np.savez(REPO / "results" / "uq_arrays_deep_ensemble.npz",
             pv=pv, uv=uv, tv=tv, mv=mv, pt=pt, ut=ut, tt=tt, mt=mt)

    # ---- in-silico recalibration cohort ------------------------------------
    # The shipped val split is ONE subject (61 points/channel), which is why
    # the val-fitted floor needs a 3-pt safety margin and still under-covers
    # at 95 on test. The simulator provides unlimited validation data with
    # zero test leakage: recalibrate on a FRESH 20-subject cohort (disjoint
    # seed) at the NOMINAL floor.
    from hybrid_ode_tpu.data.dataset import GlucoseDataset
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset

    fresh_path = "/tmp/4gi_uq_recal_cohort.csv"
    generate_4gi_dataset(fresh_path, seed=777, n_subjects=20)
    fraw = create_data_arrays(fresh_path)
    fphys = fraw.observations * fraw.state_std + fraw.state_mean
    frenorm = (fphys - ds.state_mean) / ds.state_std
    fresh_ds = GlucoseDataset(
        initial_state=frenorm[:, 0].astype(np.float32),
        observations=frenorm.astype(np.float32),
        time_points=fraw.time_points, meal=fraw.meal,
        tvns=fraw.tvns, mask=fraw.mask,
        state_mean=ds.state_mean, state_std=ds.state_std,
        subject_ids=fraw.subject_ids, loss_weights=ds.loss_weights,
    )
    pf, uf, tf, mf = collect_ensemble_predictive(state.params, fresh_ds, config,
                                                 sigma, args.batch_size)
    s_fresh = fit_per_state_recalibration(pf, uf, tf, mask=mf,
                                          min_coverage_95=0.95)

    # ---- val-arm floor selection, leakage-free ----------------------------
    # Fit the per-state scale on val at each candidate floor and score its
    # 95% coverage on the FRESH simulated cohort (never on test): the
    # smallest floor reaching nominal there is frozen before test is touched.
    from hybrid_ode_tpu.evals.metrics import compute_coverage as _cov

    if args.recal_floor is not None:
        recal_floor = float(args.recal_floor)
    else:
        recal_floor = 0.99  # fallback: most conservative candidate
        for cand in (0.95, 0.96, 0.97, 0.98, 0.99):
            s_c = fit_per_state_recalibration(pv, uv, tv, mask=mv,
                                              min_coverage_95=cand)
            if float(_cov(pf, uf * s_c, tf, 0.95, mask=mf)) >= 0.95:
                recal_floor = cand
                break
    s_vec = fit_per_state_recalibration(pv, uv, tv, mask=mv,
                                        min_coverage_95=recal_floor)

    results = {
        "n_members": K,
        "epochs": args.epochs,
        "train_wall_s": round(wall, 1),
        "member_scaling": scaling,
        "final_member_losses": [round(float(x), 3) for x in final_losses],
        "noise_sigma_per_state": [round(float(x), 4) for x in sigma],
        "recal_floor_val": recal_floor,
        "recal_floor_selection": ("cli" if args.recal_floor is not None
                                  else "val-fit, fresh-cohort-validated sweep"),
        "recalibration_per_state_val": [round(float(x), 4) for x in s_vec],
        "recalibration_per_state_fresh_cohort": [round(float(x), 4) for x in s_fresh],
        "test_raw": metrics_at(pt, ut, tt, mt, 1.0),
        "test_recalibrated_per_state": metrics_at(pt, ut * s_vec, tt, mt, 1.0),
        "test_recalibrated_fresh_cohort": metrics_at(pt, ut * s_fresh, tt, mt, 1.0),
        "_targets": {"ece": 0.08, "coverage_95": 0.95,
                     "source": "manuscript.tex:707-720,:765 (claimed on MIMIC)"},
        "_vi_comparison": "results/uq_calibration.json (same split, same metric path)",
    }
    out = REPO / "results" / "ensemble_uq.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
