"""Ensemble-mean accuracy: K tuned-recipe members, one vmapped training run.

RESULTS.md round-1 measured that a 3-seed prediction ensemble moves the
2-subject test RMSE-vs-truth from 0.64-0.76 (seed spread) to 0.67, but
serial retraining made ensembling a side note. The ensemble-parallel layer
(parallel/ensemble.py) trains K members for LESS wall than one plain run
(measured, results/ensemble_uq.json), so the prediction-averaged model is
now the cheap default. This benchmark measures what ensemble-mean
prediction buys on the accuracy protocol of benchmarks/accuracy.py:

  - test windows of the shipped 10-subject cohort, glucose RMSE vs the
    noiseless simulator truth;
  - a FRESH 50-subject cohort (unseen subjects, exact truth) — the
    generalisation headline (single tuned model: 0.79 mmol/L feature
    recipe / 0.72 best params-mode seed, RESULTS.md).

Per-member numbers are reported next to the ensemble mean so the
variance-reduction gain is visible. Writes results/ensemble_accuracy.json.

Usage: python benchmarks/ensemble_accuracy.py [--members 8] [--epochs 3000]
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
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--fresh-subjects", type=int, default=50)
    ap.add_argument("--out", default="results/ensemble_accuracy.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd
    import yaml

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import (
        GlucoseDataset,
        batch_iterator,
        create_data_arrays,
        pad_batch,
        split_dataset,
    )
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.parallel.ensemble import (
        ensemble_forward,
        init_ensemble,
        init_ensemble_state,
        make_ensemble_train_step,
    )
    from hybrid_ode_tpu.train.loop import make_optimizer

    cfg_dict = yaml.safe_load((REPO / "configs" / "4gi_tuned.yaml").read_text())
    config = config_from_dict(cfg_dict, use_pallas=False)  # vmaps member weights
    tr_cfg = cfg_dict["training"]

    data_path = str(REPO / "data" / "4gi_dataset.csv")
    ds = create_data_arrays(data_path, sequence_length=61, stride=30)
    tr, va, te = split_dataset(ds, seed=42)

    K = args.members
    batches = [pad_batch(b, args.batch_size)[0]
               for b in batch_iterator(tr, args.batch_size, shuffle=False)]
    opt = make_optimizer(tr_cfg["learning_rate"], args.epochs, len(batches),
                         tr_cfg.get("gradient_clip", 5.0),
                         train_ode_params=tr_cfg.get("train_ode_params", False))
    step = make_ensemble_train_step(
        opt, config,
        tr_cfg.get("lambda1", 0.0), tr_cfg.get("lambda2", 0.01),
        not cfg_dict.get("ablation", {}).get("no_physics", False))

    state = init_ensemble_state(opt, init_ensemble(jax.random.PRNGKey(0), config, K))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for epoch in range(args.epochs):
        for b in batches:
            key, sk = jax.random.split(key)
            state, metrics = step(state, b, jax.random.split(sk, K))
        if epoch % 500 == 0:
            print(f"epoch {epoch}: losses {np.round(np.asarray(metrics['loss']), 3)}")
    float(np.asarray(metrics["loss"]).sum())  # axon fence
    wall = time.time() - t0
    print(f"trained {K} members x {args.epochs} epochs in {wall:.1f}s")

    def member_and_mean_truth_rmse(dataset, truth_df):
        """Glucose RMSE vs simulator truth: per-member and ensemble-mean."""
        batch = dataset.batch(np.arange(len(dataset)))
        trajs = np.asarray(ensemble_forward(state.params, batch, config))  # (K,B,T,6)
        phys = trajs * dataset.state_std + dataset.state_mean
        truth = {sid: sub["glucose_true_mmol_L"].to_numpy()
                 for sid, sub in truth_df.groupby("subject_id")}
        tarr = np.stack([truth[dataset.subject_ids[w]] for w in range(len(dataset))])
        per_member = np.sqrt(np.mean((phys[:, :, :, 0] - tarr[None]) ** 2, axis=(1, 2)))
        mean_rmse = float(np.sqrt(np.mean((phys[:, :, :, 0].mean(0) - tarr) ** 2)))
        return [round(float(x), 4) for x in per_member], round(mean_rmse, 4)

    df = pd.read_csv(data_path)
    test_members, test_mean = member_and_mean_truth_rmse(te, df)

    # fresh-cohort generalisation, scored in the TRAINING normalisation
    fresh_path = "/tmp/4gi_fresh_cohort_ens.csv"
    fresh_df = generate_4gi_dataset(fresh_path, seed=123,
                                    n_subjects=args.fresh_subjects)
    fresh_raw = create_data_arrays(fresh_path)
    phys = fresh_raw.observations * fresh_raw.state_std + fresh_raw.state_mean
    renorm = (phys - ds.state_mean) / ds.state_std
    fresh = GlucoseDataset(
        initial_state=renorm[:, 0].astype(np.float32),
        observations=renorm.astype(np.float32),
        time_points=fresh_raw.time_points, meal=fresh_raw.meal,
        tvns=fresh_raw.tvns, mask=fresh_raw.mask,
        state_mean=ds.state_mean, state_std=ds.state_std,
        subject_ids=fresh_raw.subject_ids, loss_weights=ds.loss_weights,
    )
    fresh_members, fresh_mean = member_and_mean_truth_rmse(fresh, fresh_df)

    results = {
        "n_members": K,
        "epochs": args.epochs,
        "train_wall_s": round(wall, 1),
        "test_rmse_vs_truth_per_member": test_members,
        "test_rmse_vs_truth_ensemble_mean": test_mean,
        "fresh_rmse_vs_truth_per_member": fresh_members,
        "fresh_rmse_vs_truth_ensemble_mean": fresh_mean,
        "_single_model_baselines": {
            "fresh_feature_recipe": 0.79, "fresh_params_mode_best_seed": 0.72,
            "source": "RESULTS.md accuracy section (round 1-3 measurements)",
        },
        "_reference_claim": 0.45,
    }
    out = REPO / args.out
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
