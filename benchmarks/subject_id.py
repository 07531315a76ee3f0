"""Subject-identification benchmark: params-context + test-time refinement.

VERDICT r2 next-round #5: round 2's `context_mode='params'` produced the
best observed fresh-cohort run (0.72 mmol/L truth RMSE) but with a
0.72/0.79/0.90 spread across seeds — encoder variance, not model variance.
Round 3 adds `identify_context` (models/hybrid.py): per-window MAP
refinement of the subject latent on the identification window with the
trained model frozen, so the fresh-cohort result no longer depends on how
well the amortized encoder happened to train.

Protocol: train the params-context recipe on the shipped 10-subject 4GI
cohort for 3 seeds; evaluate each seed's fresh-cohort (50 unseen subjects,
seed 123 — same as benchmarks/accuracy.py) glucose RMSE vs simulator truth
with (a) the encoder's amortized code and (b) the identified code.
Done-criterion: identified RMSE <= 0.75 on ALL seeds.

Writes results/subject_id.json.
Usage: python benchmarks/subject_id.py [--epochs 2500] [--seeds 0 1 2]
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
    ap.add_argument("--epochs", type=int, default=2500)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--fresh-subjects", type=int, default=50)
    ap.add_argument("--id-steps", type=int, default=150)
    ap.add_argument("--reuse", action="store_true",
                    help="load checkpoints/subject_id_s{seed} instead of "
                         "retraining (identification-only rerun)")
    ap.add_argument("--amortize", type=int, default=0, metavar="N",
                    help="also distill identify_context into an amortized "
                         "encoder trained on N fresh simulated subjects "
                         "(one MLP pass at deployment instead of the "
                         "per-window MAP refinement)")
    ap.add_argument("--amortize-ft-epochs", type=int, default=400,
                    help="decoder-aware fine-tune epochs (stage 2 of "
                         "amortize_encoder; 0 disables)")
    ap.add_argument("--amortize-ft-lr", type=float, default=3e-4)
    ap.add_argument("--semi-steps", type=int, default=15,
                    help="per-window MAP refinement steps from the "
                         "amortized init (semi-amortized deployment row)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import pandas as pd

    from hybrid_ode_tpu.data.dataset import (
        GlucoseDataset,
        create_data_arrays,
        split_dataset,
    )
    from hybrid_ode_tpu.data.fourgi_gen import generate_4gi_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward,
        config_from_dict,
        identify_context,
        with_context,
    )
    from hybrid_ode_tpu.train.loop import train_model
    from hybrid_ode_tpu.utils.config import default_config

    data_path = str(REPO / "data" / "4gi_dataset.csv")
    ds = create_data_arrays(data_path)
    tr, va, _ = split_dataset(ds, seed=42)

    def load_cohort(tag, seed, n_subjects):
        """Generate a simulated cohort re-expressed in the TRAINING
        normalization (accuracy.py protocol); returns (dataset, truth)."""
        path = f"/tmp/4gi_cohort_sid_{tag}.csv"
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
        tru = {sid: sub["glucose_true_mmol_L"].to_numpy()
               for sid, sub in df.groupby("subject_id")}
        return cohort, tru

    # fresh cohort in the TRAINING normalization (accuracy.py protocol)
    fresh, truth = load_cohort("fresh", 123, args.fresh_subjects)

    def truth_rmse(params, config, ctx, skip=0):
        """Glucose RMSE vs simulator truth; skip>0 scores only t>=skip
        (forecast-only view when skipping the identification window)."""
        batch = fresh.batch(np.arange(len(fresh)))
        signals = {"meal": jnp.asarray(fresh.meal), "tVNS": jnp.asarray(fresh.tvns)}
        if ctx is not None:
            signals["context"] = ctx
        controls = Controls(ts=jnp.asarray(fresh.time_points), signals=signals)
        if ctx is None:
            controls = with_context(params, batch, controls, config)
        preds = np.asarray(batched_forward(
            params, jnp.asarray(fresh.initial_state),
            jnp.asarray(fresh.time_points), controls, config,
        ))
        preds_phys = preds * fresh.state_std + fresh.state_mean
        errs = [preds_phys[w, skip:, 0] - truth[fresh.subject_ids[w]][skip:]
                for w in range(len(fresh))]
        return float(np.sqrt(np.mean(np.square(errs))))

    # merge into an existing artifact instead of clobbering it: a
    # --seeds 2 rerun must not discard the other seeds' rows (same
    # two-writers-one-path failure mode as the round-2 table5 clobber)
    out = REPO / "results" / "subject_id.json"
    results = {"per_seed": {}}
    if out.exists():
        try:
            results["per_seed"] = json.loads(out.read_text()).get("per_seed", {})
        except (json.JSONDecodeError, OSError):
            pass
    for seed in args.seeds:
        cfg = default_config()
        cfg["data"]["path"] = data_path
        cfg["model"].update(
            solver="rk4", substeps=4, mode="scan", nn_hidden=128, nn_layers=4,
            context_points=12, context_mode="params",
            context_params=["G_b", "I_b", "Glu_b"],
        )
        cfg["training"].update(
            epochs=args.epochs, batch_size=32, learning_rate=3e-3,
            lambda1=0.0, lambda2=0.01, early_stopping_patience=args.epochs,
            train_ode_params=True,
        )
        cfg["seed"] = seed
        ckpt_dir = REPO / "checkpoints" / f"subject_id_s{seed}"
        t0 = time.time()
        if args.reuse and (ckpt_dir / "best_model").exists():
            from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

            state, _ = load_checkpoint(str(ckpt_dir / "best_model"))
            import types

            res = types.SimpleNamespace(params=state["params"], epochs_run=-1)
        else:
            res = train_model(cfg, tr, va, str(ckpt_dir))
        wall = time.time() - t0
        config = config_from_dict(cfg)

        rmse_enc = truth_rmse(res.params, config, None)
        batch = fresh.batch(np.arange(len(fresh)))
        row = {"fresh_rmse_encoder": round(rmse_enc, 4),
               "train_wall_s": round(wall, 1), "epochs_run": res.epochs_run}
        # identification-horizon sweep: the encoder is fixed at its trained
        # 12-point (1 h) input, but the MAP refinement can use any prefix —
        # basal multipliers are weakly identified from 1 h of 10%-CV data,
        # so identifiability grows with the window
        for k in (12, 24, 36):
            t_id = time.time()
            ctx_id = identify_context(res.params, batch, config,
                                      steps=args.id_steps, lr=0.02,
                                      prior_std=0.3, points=k)
            ctx_id.block_until_ready()
            row[f"identify_wall_s_k{k}"] = round(time.time() - t_id, 2)
            row[f"fresh_rmse_identified_k{k}"] = round(
                truth_rmse(res.params, config, ctx_id), 4)
            row[f"forecast_rmse_after_k{k}"] = round(
                truth_rmse(res.params, config, ctx_id, skip=k), 4)
        if args.amortize:
            from hybrid_ode_tpu.models.hybrid import (amortize_encoder,
                                                      encode_context)

            # amortization cohort: simulated subjects DISJOINT from both the
            # training data (seed 0) and the evaluation cohort (seed 123)
            amo, _ = load_cohort("amortize", 7, args.amortize)
            amo_batch = amo.batch(np.arange(len(amo)))
            t_am = time.time()
            enc36, info = amortize_encoder(
                res.params, amo_batch, config, points=36,
                id_steps=args.id_steps, id_lr=0.02, prior_std=0.3,
                key=jax.random.PRNGKey(seed),
                finetune_epochs=args.amortize_ft_epochs,
                finetune_lr=args.amortize_ft_lr,
            )
            row["amortize_train_wall_s"] = round(time.time() - t_am, 1)
            # decoder-aware fine-tune (stage 2) selection metric, measured
            # on held-out amortization windows: distilled -> finetuned
            if "val_data_loss_finetuned" in info:
                row["amortized_val_data_loss_distilled"] = round(
                    info["val_data_loss_distilled"], 5)
                row["amortized_val_data_loss_finetuned"] = round(
                    info["val_data_loss_finetuned"], 5)
            t_enc = time.time()
            ctx_am = encode_context(
                enc36, jnp.asarray(fresh.observations),
                jnp.asarray(fresh.time_points), 36, config.activation)
            ctx_am.block_until_ready()
            row["amortized_encode_wall_s"] = round(time.time() - t_enc, 3)
            row["amortized_val_code_mse"] = round(info["val_code_mse"], 5)
            row["fresh_rmse_amortized_k36"] = round(
                truth_rmse(res.params, config, ctx_am), 4)
            row["forecast_rmse_amortized_after_k36"] = round(
                truth_rmse(res.params, config, ctx_am, skip=36), 4)
            # SEMI-amortized deployment: amortized init + a few per-window
            # MAP steps (identify_context best-iterate => never scores
            # worse than the init on the identification window). Captures
            # the identification quality the pure encoder cannot (round 3
            # measured a sharp-landscape seed where decoder-aware encoder
            # fine-tuning cannot improve on the distilled point).
            t_semi = time.time()
            ctx_semi = identify_context(
                res.params, batch, config, steps=args.semi_steps, lr=0.02,
                prior_std=0.3, points=36, init=ctx_am)
            ctx_semi.block_until_ready()
            row["semi_steps"] = args.semi_steps
            row["semi_refine_wall_s"] = round(time.time() - t_semi, 2)
            row["fresh_rmse_semi_k36"] = round(
                truth_rmse(res.params, config, ctx_semi), 4)
            row["forecast_rmse_semi_after_k36"] = round(
                truth_rmse(res.params, config, ctx_semi, skip=36), 4)
        results["per_seed"][str(seed)] = row  # str keys: JSON round-trip
        print(f"seed {seed}: encoder {rmse_enc:.3f} -> identified "
              f"k12 {row['fresh_rmse_identified_k12']:.3f} / "
              f"k36 {row['fresh_rmse_identified_k36']:.3f} mmol/L "
              f"({wall:.0f}s)", flush=True)
        jax.clear_caches()

    ids36 = [v["fresh_rmse_identified_k36"] for v in results["per_seed"].values()]
    ids12 = [v["fresh_rmse_identified_k12"] for v in results["per_seed"].values()]
    encs = [v["fresh_rmse_encoder"] for v in results["per_seed"].values()]
    results["summary"] = {
        "identified_k36_max": round(max(ids36), 4),
        "identified_k36_mean": round(float(np.mean(ids36)), 4),
        "identified_k12_max": round(max(ids12), 4),
        "encoder_max": round(max(encs), 4),
        "target_all_seeds_leq": 0.75,
        "target_met_k36": bool(max(ids36) <= 0.75),
        "target_met_k12": bool(max(ids12) <= 0.75),
    }
    if args.amortize:
        ams = [v["fresh_rmse_amortized_k36"]
               for v in results["per_seed"].values()
               if "fresh_rmse_amortized_k36" in v]
        results["summary"].update(
            amortized_k36_max=round(max(ams), 4),
            amortized_k36_mean=round(float(np.mean(ams)), 4),
            amortize_subjects=args.amortize,
            target_met_amortized=bool(max(ams) <= 0.75),
        )
        semis = [v["fresh_rmse_semi_k36"]
                 for v in results["per_seed"].values()
                 if "fresh_rmse_semi_k36" in v]
        if semis:
            results["summary"].update(
                semi_k36_max=round(max(semis), 4),
                semi_k36_mean=round(float(np.mean(semis)), 4),
                target_met_semi=bool(max(semis) <= 0.75),
            )
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
