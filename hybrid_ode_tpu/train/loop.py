"""Jitted training loop: Adam + cosine schedule + clipping + early stopping.

Redesign of the reference training stack (`train/train_hybrid.py:225-302,
518-561`): the whole update (forward solve -> loss -> backward through the
integrator -> clip -> Adam) is ONE compiled XLA program per batch shape.
Optimizer parity: Adam lr 1e-3, CosineAnnealingLR over `epochs` (per-epoch in
torch == per-step cosine over epochs*steps here), global-norm clip 5.0.

Trainable-parameter parity: the reference trains ONLY the NN weights (ODE
parameters are registered as non-trainable buffers, `models/ode_core.py:78-79`;
under --no-nn it literally optimises a dummy scalar, `train_hybrid.py:430-436`).
We reproduce that via an optax mask, with an opt-in `train_ode_params` escape
hatch the reference lacks.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hybrid_ode_tpu.data.dataset import GlucoseDataset, batch_iterator, pad_batch
from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    config_from_dict,
    hybrid_loss,
    init_hybrid_params,
)
from hybrid_ode_tpu.utils.checkpoint import save_checkpoint
from hybrid_ode_tpu.utils.logging import MetricsLogger

logger = logging.getLogger("hybrid_ode_tpu.train")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    gradient_clip: float = 5.0,
    train_ode_params=False,
) -> optax.GradientTransformation:
    """train_ode_params: False (reference parity: ODE params are frozen
    buffers), True (all 17 train through the solver), or a list/tuple of
    parameter NAMES to train selectively (e.g. ['V_max', 'k_L'] for
    system-identification of one pathway while the rest stay at Table-I —
    selective freedom also removes sign-flip degeneracies, see
    benchmarks/latent.py)."""
    schedule = optax.cosine_decay_schedule(
        init_value=learning_rate,
        decay_steps=max(1, epochs * steps_per_epoch),
        alpha=0.0,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(gradient_clip) if gradient_clip > 0 else optax.identity(),
        optax.adam(schedule),
    )
    # Frozen groups: 'norm' (never trainable), 'ode' per train_ode_params.
    # Anything else ('nn', 'enc', ...) trains. NOTE: optax.masked would pass
    # unmasked leaves' updates (= raw gradients) straight through — must
    # ZERO them.
    selective = isinstance(train_ode_params, (list, tuple, set))

    def labels(params):
        out = {}
        for k, v in params.items():
            if k == "norm":
                out[k] = jax.tree.map(lambda _: "freeze", v)
            elif k == "ode" and selective:
                names = set(train_ode_params)
                out[k] = {n: ("train" if n in names else "freeze") for n in v}
            elif k == "ode" and not train_ode_params:
                out[k] = jax.tree.map(lambda _: "freeze", v)
            else:
                out[k] = jax.tree.map(lambda _: "train", v)
        return out

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_train_step(
    optimizer: optax.GradientTransformation,
    config: HybridConfig,
    lambda1: float,
    lambda2: float,
    use_physics: bool,
):
    """Build the jitted (state, batch, key) -> (state, metrics) update."""

    def step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_fn(params):
            return hybrid_loss(
                params, batch, key, config,
                lambda1=lambda1, lambda2=lambda2, use_physics_loss=use_physics,
            )

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(comps, loss=loss, grad_norm=gnorm)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(config: HybridConfig, lambda1: float, lambda2: float, use_physics: bool):
    def step(params, batch: Dict, key: jax.Array):
        loss, comps = hybrid_loss(
            params, batch, key, config,
            lambda1=lambda1, lambda2=lambda2, use_physics_loss=use_physics,
        )
        return loss, comps

    return jax.jit(step)


@dataclasses.dataclass
class TrainResult:
    params: Any
    best_val_loss: float
    history: Dict[str, list]
    epochs_run: int


def train_model(
    cfg: Dict[str, Any],
    train_ds: GlucoseDataset,
    val_ds: GlucoseDataset,
    checkpoint_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
    params: Any = None,
    max_epochs: Optional[int] = None,
    resume_from: Optional[str] = None,
) -> TrainResult:
    """Standard (point-estimate) training with best/final checkpoints and
    early stopping (parity: `train_hybrid.py:518-561`).

    resume_from: path to a prior checkpoint directory — restores params AND
    optimizer state and continues (mid-training resume; the reference can
    only restart from scratch, SURVEY.md §5)."""
    tcfg = cfg["training"]
    mcfg = cfg["model"]
    abl = cfg["ablation"]

    config = config_from_dict(cfg)

    key = jax.random.PRNGKey(cfg.get("seed", 0))
    key, init_key = jax.random.split(key)
    if params is None:
        norm_stats = None
        ode_overrides = cfg.get("ode_params")
        if mcfg.get("physical_core", False):
            norm_stats = (train_ds.state_mean, train_ds.state_std)
            # seed basal parameters at the DATA operating point: Table-I
            # basals (G_b=5, I_b=60, Glu_b=80) can sit several sigma from a
            # cohort's means, giving the physical-units core a large initial
            # drift the NN would have to fight
            ode_overrides = dict(ode_overrides or {})
            ode_overrides["G_b"] = float(train_ds.state_mean[0])
            ode_overrides["I_b"] = float(train_ds.state_mean[1])
            ode_overrides["Glu_b"] = float(train_ds.state_mean[2])
        params = init_hybrid_params(init_key, config, ode_overrides,
                                    norm_stats=norm_stats)

    batch_size = tcfg["batch_size"]
    epochs = max_epochs if max_epochs is not None else tcfg["epochs"]
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    optimizer = make_optimizer(
        tcfg["learning_rate"], epochs, steps_per_epoch,
        tcfg.get("gradient_clip", 5.0),
        train_ode_params=tcfg.get("train_ode_params", False),
    )
    lambda1 = tcfg.get("lambda1", 1.0)
    lambda2 = tcfg.get("lambda2", 1.0)
    use_physics = not abl.get("no_physics", False)

    train_step = make_train_step(optimizer, config, lambda1, lambda2, use_physics)
    eval_step = make_eval_step(config, lambda1, lambda2, use_physics)

    start_epoch = 0
    if resume_from is not None:
        from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

        saved, meta = load_checkpoint(resume_from)
        params = saved["params"]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(optimizer.init(params)),
            jax.tree_util.tree_leaves(saved["opt_state"]),
        )
        state = TrainState(params, opt_state, jnp.asarray(0, jnp.int32))
        start_epoch = int(meta.get("epoch", -1)) + 1
        logger.info("resumed from %s at epoch %d", resume_from, start_epoch)
    else:
        state = TrainState(params, optimizer.init(params), jnp.asarray(0, jnp.int32))
    mlogger = MetricsLogger(log_dir, cfg["logging"].get("tensorboard", False)) if log_dir else None

    best_val = float("inf")
    best_params = jax.tree.map(lambda x: jnp.array(x), state.params)
    best_opt_state = jax.tree.map(lambda x: jnp.array(x), state.opt_state)
    best_meta = {"epoch": -1, "val_loss": None, "config": cfg,
                 "state_mean": train_ds.state_mean, "state_std": train_ds.state_std}
    best_dirty = False
    patience = tcfg.get("early_stopping_patience", 20)
    patience_counter = 0
    history = {"train_loss": [], "val_loss": [], "epoch_time": []}
    epoch = -1

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        key, ek = jax.random.split(key)
        total, nb = 0.0, 0
        min_success = 1.0
        for batch in batch_iterator(train_ds, batch_size, shuffle=True, seed=cfg.get("seed", 0) + epoch):
            batch, _ = pad_batch(batch, batch_size)
            ek, sk = jax.random.split(ek)
            state, metrics = train_step(state, batch, sk)
            total += float(metrics["loss"])
            min_success = min(min_success, float(metrics.get("solver_success", 1.0)))
            nb += 1
        train_loss = total / max(nb, 1)
        if min_success < 1.0:
            # an adaptive interval exhausted its step budget somewhere this
            # epoch (parity: the reference warns + zero-pads failed solves,
            # hybrid_ode_nn.py:243-256); raise max_steps_per_interval or
            # loosen tolerances if this persists
            logger.warning(
                "epoch %d: solver step budget exhausted in >=1 batch "
                "(min success fraction %.3f)", epoch, min_success,
            )

        # validation
        vtotal, vb = 0.0, 0
        for batch in batch_iterator(val_ds, batch_size, shuffle=False):
            batch, _ = pad_batch(batch, batch_size)
            key, sk = jax.random.split(key)
            vloss, _ = eval_step(state.params, batch, sk)
            vtotal += float(vloss)
            vb += 1
        val_loss = vtotal / max(vb, 1)

        dt = time.time() - t0
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["epoch_time"].append(dt)
        if mlogger:
            mlogger.log(epoch, {"train/epoch_loss": train_loss, "val/epoch_loss": val_loss, "epoch_time_s": dt})
        logger.info("epoch %d: train=%.4f val=%.4f (%.2fs)", epoch, train_loss, val_loss, dt)

        if val_loss < best_val:
            best_val = val_loss
            # deep-copy: train_step donates its input state, so holding a
            # reference would point at deleted buffers after the next step
            best_params = jax.tree.map(lambda x: jnp.array(x), state.params)
            best_opt_state = jax.tree.map(lambda x: jnp.array(x), state.opt_state)
            best_meta = {"epoch": epoch, "val_loss": val_loss, "config": cfg,
                         "state_mean": train_ds.state_mean, "state_std": train_ds.state_std}
            best_dirty = True
            patience_counter = 0
            # throttle disk writes: long tuned runs improve val on most early
            # epochs; keep the pending best in memory and write at most every
            # save_interval epochs — the held best is flushed unconditionally
            # after the loop, so the on-disk best_model is never stale.
            save_every = max(1, int(cfg["logging"].get("save_interval", 1)))
            if checkpoint_dir and (epoch % save_every == 0 or epoch < 5):
                save_checkpoint(
                    Path(checkpoint_dir) / "best_model",
                    {"params": best_params, "opt_state": best_opt_state},
                    best_meta,
                )
                best_dirty = False
        else:
            patience_counter += 1
        if patience_counter >= patience:
            logger.info("early stopping at epoch %d", epoch)
            break

    if checkpoint_dir:
        if best_dirty:
            save_checkpoint(
                Path(checkpoint_dir) / "best_model",
                {"params": best_params, "opt_state": best_opt_state},
                best_meta,
            )
        save_checkpoint(
            Path(checkpoint_dir) / "final_model",
            {"params": state.params, "opt_state": state.opt_state},
            {"epoch": epoch, "val_loss": history["val_loss"][-1] if history["val_loss"] else None,
             "config": cfg, "state_mean": train_ds.state_mean, "state_std": train_ds.state_std},
        )
    if mlogger:
        mlogger.close()
    return TrainResult(best_params, best_val, history, epoch + 1)
