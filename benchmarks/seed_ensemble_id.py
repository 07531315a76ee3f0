"""Cross-seed ensemble of identified subject-conditioned models.

Combines the repo's two strongest accuracy levers on the fresh-cohort
protocol (benchmarks/subject_id.py): per-window test-time identification
(MAP refinement of the subject code, 3 h window) and prediction averaging
across independently trained seeds (cheap since the ensemble layer; here
the three round-3 subject_id_s{0,1,2} checkpoints are reused directly).

Each seed's model is identified separately (its own latent space), then the
PREDICTIONS are averaged — parameter averaging across seeds is meaningless,
prediction averaging is the deep-ensemble estimator. Single-seed identified
numbers: 0.680 / 0.665 / 0.741 mmol/L (results/subject_id.json).

Writes results/seed_ensemble_id.json.

Usage: python benchmarks/seed_ensemble_id.py [--id-steps 150]
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
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--id-steps", type=int, default=150)
    ap.add_argument("--points", type=int, default=36)
    ap.add_argument("--fresh-subjects", type=int, default=50)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from hybrid_ode_tpu.data.dataset import GlucoseDataset, create_data_arrays
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward,
        config_from_dict,
        identify_context,
    )
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    ds = create_data_arrays(str(REPO / "data" / "4gi_dataset.csv"))

    # fresh cohort re-expressed in the TRAINING normalization
    # (same protocol + seed as subject_id.py / accuracy.py)
    path = "/tmp/4gi_cohort_seed_ens.csv"
    df = generate_4gi_dataset(path, seed=123, n_subjects=args.fresh_subjects)
    raw = create_data_arrays(path)
    phys = raw.observations * raw.state_std + raw.state_mean
    renorm = (phys - ds.state_mean) / ds.state_std
    fresh = GlucoseDataset(
        initial_state=renorm[:, 0].astype(np.float32),
        observations=renorm.astype(np.float32),
        time_points=raw.time_points, meal=raw.meal,
        tvns=raw.tvns, mask=raw.mask,
        state_mean=ds.state_mean, state_std=ds.state_std,
        subject_ids=raw.subject_ids, loss_weights=ds.loss_weights,
    )
    truth = {sid: sub["glucose_true_mmol_L"].to_numpy()
             for sid, sub in df.groupby("subject_id")}
    tarr = np.stack([truth[fresh.subject_ids[w]] for w in range(len(fresh))])
    batch = fresh.batch(np.arange(len(fresh)))

    def predict_identified(params, config):
        t0 = time.time()
        ctx = identify_context(params, batch, config, steps=args.id_steps,
                               lr=0.02, prior_std=0.3, points=args.points)
        ctx.block_until_ready()
        wall = time.time() - t0
        controls = Controls(
            ts=jnp.asarray(fresh.time_points),
            signals={"meal": jnp.asarray(fresh.meal),
                     "tVNS": jnp.asarray(fresh.tvns), "context": ctx},
        )
        preds = np.asarray(batched_forward(
            params, jnp.asarray(fresh.initial_state),
            jnp.asarray(fresh.time_points), controls, config))
        return preds * fresh.state_std + fresh.state_mean, wall

    def rmse(preds_phys):
        return float(np.sqrt(np.mean((preds_phys[:, :, 0] - tarr) ** 2)))

    preds_all, per_seed = [], {}
    for seed in args.seeds:
        ckpt = REPO / "checkpoints" / f"subject_id_s{seed}" / "best_model"
        state, meta = load_checkpoint(str(ckpt))
        config = config_from_dict(meta["config"])
        preds, wall = predict_identified(state["params"], config)
        preds_all.append(preds)
        per_seed[str(seed)] = {"fresh_rmse_identified": round(rmse(preds), 4),
                               "identify_wall_s": round(wall, 2)}
        print(f"seed {seed}: identified {per_seed[str(seed)]}")

    ens = np.mean(np.stack(preds_all), axis=0)
    results = {
        "per_seed": per_seed,
        "id_steps": args.id_steps,
        "points": args.points,
        "fresh_rmse_seed_ensemble_identified": round(rmse(ens), 4),
        "_single_seed_baselines": "results/subject_id.json (0.680/0.665/0.741)",
    }
    out = REPO / "results" / "seed_ensemble_id.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
