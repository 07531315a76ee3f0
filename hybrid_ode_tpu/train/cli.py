"""Training CLI — flag parity with the reference (`train/train_hybrid.py:307-328`).

    python -m hybrid_ode_tpu.train.cli --config configs/4gi_baseline.yaml

Flags: --config --data --solver --vi --mcmc --no-nn --no-bayes --no-physics
--experiment-name --seed (+ TPU-build extras: --epochs --batch-size
--mcmc-chains --platform).

Behavioral upgrades over the reference, kept behind the same flags:
  * --vi actually trains variational parameters (the reference logs a warning
    and falls back to point training, `train_hybrid.py:452-461`).
  * --mcmc runs vectorized NUTS over parallel chains after a MAP pretrain
    (reference: serial random-walk Metropolis, `inference/mcmc.py:127`).
"""

from __future__ import annotations

import argparse
import logging
from datetime import datetime
from pathlib import Path

import numpy as np

logger = logging.getLogger("hybrid_ode_tpu.cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train hybrid ODE-NN model (TPU-native)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--data", type=str, default=None,
                   help="Path to data file (default: config's data.path)")
    p.add_argument("--solver", type=str, default=None,
                   choices=["dopri5", "rk45", "dop853", "radau", "bdf", "rk4", "bosh3", "euler"])
    p.add_argument("--vi", action="store_true", help="Variational inference")
    p.add_argument("--mcmc", action="store_true", help="NUTS sampling after MAP pretrain")
    p.add_argument("--no-nn", dest="no_nn", action="store_true")
    p.add_argument("--no-bayes", dest="no_bayes", action="store_true")
    p.add_argument("--no-physics", dest="no_physics", action="store_true")
    p.add_argument("--experiment-name", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--mcmc-chains", type=int, default=8)
    p.add_argument("--mcmc-samples", type=int, default=1000)
    p.add_argument("--mcmc-warmup", type=int, default=500)
    p.add_argument("--ensemble", type=int, default=1, metavar="K",
                   help="train K deep-ensemble members in ONE vmapped program "
                        "(parallel/ensemble.py; K members cost LESS wall than "
                        "one plain run up to K~32 — results/ensemble_uq.json)")
    p.add_argument("--mcmc-engine", choices=["xla", "fused"], default="xla",
                   help="'fused' evaluates ALL chains through one Pallas "
                        "RK4 kernel per leapfrog (requires solver=rk4; "
                        "see inference/mcmc.py run_nuts)")
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    args = build_parser().parse_args(argv)

    import os

    import jax

    # Persistent compilation cache by default: the first reverse-mode
    # compile of an adaptive-solver train step costs 60-130 s on TPU and is
    # fully cacheable — every re-run of the same recipe should pay it once
    # per machine, not once per process (NOTES_NEXT_ROUND r2 #2).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.join(os.path.expanduser("~"), ".jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:  # pragma: no cover - older jax without the option
            pass

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.train.loop import train_model
    from hybrid_ode_tpu.utils.config import load_config, merge_cli_overrides, save_config

    cfg = merge_cli_overrides(load_config(args.config), args)
    seed = cfg.get("seed", 0)

    # experiment naming (parity: train_hybrid.py:384-397)
    if args.experiment_name:
        experiment = args.experiment_name
    else:
        experiment = f"hybrid_ode_nn_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
        if args.vi:
            experiment += "_vi"
        elif args.mcmc:
            experiment += "_mcmc"
        if cfg["ablation"]["no_nn"]:
            experiment += "_no_nn"
        if cfg["ablation"]["no_bayes"]:
            experiment += "_no_bayes"

    log_dir = Path("runs") / experiment
    ckpt_dir = Path("checkpoints") / experiment
    log_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, ckpt_dir / "config.yaml")

    logger.info("devices: %s", jax.devices())
    logger.info("experiment: %s", experiment)

    ds = create_data_arrays(
        cfg["data"]["path"],
        sequence_length=cfg["data"].get("sequence_length", 61),
        stride=cfg["data"].get("stride", 30),
        normalize=cfg["data"].get("normalize", True),
        # round 3: clinical charting observes channels independently; see
        # GlucoseDataset.mask_channels
        per_channel_mask=cfg["data"].get("per_channel_mask", False),
    )
    train_ds, val_ds, test_ds = split_dataset(
        ds, seed=42, level=cfg["data"].get("split_level", "window")
    )
    logger.info("dataset: %d windows (train %d / val %d / test %d)",
                len(ds), len(train_ds), len(val_ds), len(test_ds))

    use_variational = args.vi and not cfg["ablation"]["no_bayes"]

    if use_variational:
        _run_vi(cfg, args, train_ds, val_ds, ckpt_dir, seed)
    elif args.mcmc and not cfg["ablation"]["no_bayes"]:
        _run_mcmc(cfg, args, train_ds, val_ds, ckpt_dir, log_dir, seed)
    elif args.ensemble > 1:
        _run_ensemble(cfg, args, train_ds, val_ds, ckpt_dir, seed)
    else:
        result = train_model(cfg, train_ds, val_ds, str(ckpt_dir), str(log_dir))
        logger.info("training done: best val loss %.4f over %d epochs",
                    result.best_val_loss, result.epochs_run)


def _run_ensemble(cfg, args, train_ds, val_ds, ckpt_dir, seed):
    """Train a K-member deep ensemble in one vmapped program and save the
    stacked-params checkpoint ('ensemble_model'; leaves carry a leading
    member axis — `parallel.ensemble.member_params` unstacks one member)."""
    import jax
    import numpy as np

    from hybrid_ode_tpu.data.dataset import batch_iterator, pad_batch
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.parallel.ensemble import (
        ensemble_predictive,
        init_ensemble,
        train_ensemble,
    )
    from hybrid_ode_tpu.train.loop import make_optimizer
    from hybrid_ode_tpu.utils.checkpoint import save_checkpoint

    K = args.ensemble
    config = config_from_dict(cfg, use_pallas=False)  # vmaps member weights
    tr_cfg = cfg["training"]
    batch_size = tr_cfg.get("batch_size", 32)
    epochs = tr_cfg.get("epochs", 100)
    # train batches: one shuffled composition draw here; train_ensemble then
    # re-permutes the batch ORDER every epoch (advisor r3 — composition
    # staying fixed across epochs is a documented deviation from train_model)
    batches = [pad_batch(b, batch_size)[0]
               for b in batch_iterator(train_ds, batch_size, shuffle=True,
                                       seed=seed)]
    val_batches = [pad_batch(b, batch_size)[0]
                   for b in batch_iterator(val_ds, batch_size, shuffle=False)]
    opt = make_optimizer(tr_cfg.get("learning_rate", 1e-3), epochs, len(batches),
                         tr_cfg.get("gradient_clip", 5.0),
                         train_ode_params=tr_cfg.get("train_ode_params", False))

    # train_ensemble keeps each member's best-val params — the same
    # selection protocol as train_model, so --ensemble checkpoints stay
    # comparable to single-model ones
    stacked, best_val, metrics = train_ensemble(
        init_ensemble(jax.random.PRNGKey(seed), config, K),
        opt, config, batches, val_batches, jax.random.PRNGKey(seed + 1),
        epochs,
        lambda1=tr_cfg.get("lambda1", 1.0),
        lambda2=tr_cfg.get("lambda2", 0.01),
        use_physics=not cfg["ablation"].get("no_physics", False),
        eval_every=max(1, cfg.get("logging", {}).get("log_interval", 10)),
    )
    logger.info("ensemble final member losses %s; best val %s",
                np.round(np.asarray(metrics["loss"]), 4), np.round(best_val, 4))

    # ensemble-mean val fit (normalized RMSE over observed points, ALL batches)
    val_rmse = float("nan")
    if val_batches:
        se, wsum = 0.0, 0.0
        for vb in val_batches:
            mean, _ = ensemble_predictive(stacked, vb, config)
            err = np.asarray(mean) - vb["observations"]
            w = vb["mask"][..., None] * np.ones_like(err)
            se += float((err**2 * w).sum())
            wsum += float(w.sum())
        val_rmse = float(np.sqrt(se / max(wsum, 1.0)))
    logger.info("ensemble (K=%d) trained %d epochs; val RMSE (ens-mean, z) %.4f",
                K, epochs, val_rmse)
    save_checkpoint(str(Path(ckpt_dir) / "ensemble_model"), stacked,
                    {"config": cfg, "n_members": K, "val_rmse_ensemble": val_rmse,
                     "best_val": [float(x) for x in best_val],
                     "epoch": epochs, "val_loss": val_rmse})


def _run_vi(cfg, args, train_ds, val_ds, ckpt_dir, seed):
    import jax

    from hybrid_ode_tpu.inference.vi import VariationalInference
    from hybrid_ode_tpu.models.hybrid import config_from_dict, init_hybrid_params
    from hybrid_ode_tpu.train.loop import train_model

    # short MAP pretrain so posterior means start sensibly (point checkpoint
    # saved too: the VI template references it)
    logger.info("VI: MAP pretrain (<=20 epochs)")
    pre = train_model(cfg, train_ds, val_ds, str(ckpt_dir), None,
                      max_epochs=min(20, cfg["training"]["epochs"]))

    vcfg = cfg.get("vi_settings") or {}
    vi = VariationalInference(
        pre.params,
        config_from_dict(cfg),
        prior_params=cfg.get("ode_param_priors"),
        learning_rate=cfg["training"]["learning_rate"],
        n_samples=vcfg.get("n_samples", 5),
        noise_sigma=vcfg.get("noise_sigma", 0.35),
        kl_annealing=vcfg.get("kl_annealing", False),
        annealing_epochs=vcfg.get("annealing_epochs", 50),
        include_nn=vcfg.get("include_nn", False),
    )
    vi.train(
        train_ds, val_ds,
        epochs=cfg["training"]["epochs"],
        batch_size=cfg["training"]["batch_size"],
        early_stopping_patience=cfg["training"].get("early_stopping_patience", 10),
        seed=seed,
    )
    vi.save_checkpoint(str(Path(ckpt_dir) / "vi_model"))
    logger.info("VI training complete; checkpoint at %s", ckpt_dir)


def _run_mcmc(cfg, args, train_ds, val_ds, ckpt_dir, log_dir, seed):
    import jax

    from hybrid_ode_tpu.data.dataset import batch_iterator
    from hybrid_ode_tpu.inference.mcmc import posterior_summary, run_nuts, save_mcmc_results
    from hybrid_ode_tpu.models.hybrid import config_from_dict
    from hybrid_ode_tpu.train.loop import train_model

    logger.info("MCMC: MAP pretrain (<=50 epochs, parity train_hybrid.py:463-494)")
    pre = train_model(cfg, train_ds, val_ds, str(ckpt_dir), str(log_dir),
                      max_epochs=min(50, cfg["training"]["epochs"]))

    batch = next(batch_iterator(val_ds, cfg["training"]["batch_size"], shuffle=False))
    # The sampler uses the config's own solver (incl. adaptive dopri5): the
    # iterative single-instantiation NUTS transition traces the
    # grad-of-solve exactly once, so the compiled program stays ~6x smaller
    # than the unrolled-doubling form that used to crash the TPU worker and
    # forced an RK4 pin here.
    sample_cfg = config_from_dict(cfg)
    samples = run_nuts(
        pre.params, batch, sample_cfg,
        key=jax.random.PRNGKey(seed),
        num_samples=args.mcmc_samples, num_warmup=args.mcmc_warmup,
        n_chains=args.mcmc_chains, engine=args.mcmc_engine,
    )
    np.savez(Path(ckpt_dir) / "mcmc_samples.npz", **samples)
    save_mcmc_results(samples, str(Path(ckpt_dir) / "mcmc_results"))
    summ = posterior_summary(samples)
    for name, st in summ.items():
        logger.info("  %s: mean=%.4g std=%.3g [%.4g, %.4g]",
                    name, st["mean"], st["std"], st["q025"], st["q975"])


if __name__ == "__main__":
    main()
