"""Sharded training and cohort simulation over a device mesh.

Data-parallel training: parameters replicated, batch sharded on the 'data'
axis, gradients reduced by XLA-inserted all-reduce over ICI. Expressed with
`jit` + `NamedSharding` constraints (the modern pjit path); a `shard_map`
variant of the cohort simulator is provided for explicit-collective control.

No reference analogue (SURVEY.md §2.7: zero parallelism in the reference) —
this is where the TPU build earns its multi-chip scaling.
"""

from __future__ import annotations

from typing import Dict

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybrid_ode_tpu.models.hybrid import HybridConfig, forward, hybrid_loss


def make_parallel_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    config: HybridConfig,
    lambda1: float = 1.0,
    lambda2: float = 1.0,
    use_physics: bool = True,
    axis: str = "data",
):
    """Build a jitted DP train step: params replicated, batch sharded.

    Returns step(state, batch, key) with the same contract as
    `train.loop.make_train_step`; XLA lowers the gradient mean over the
    sharded batch to an all-reduce across the mesh.
    """
    from hybrid_ode_tpu.train.loop import TrainState

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_fn(params):
            return hybrid_loss(
                params, batch, key, config,
                lambda1=lambda1, lambda2=lambda2, use_physics_loss=use_physics,
            )

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), dict(comps, loss=loss)

    batch_spec = {
        "initial_state": shard, "observations": shard, "time_points": shard,
        "external_inputs": {"meal": shard, "tVNS": shard}, "mask": shard,
    }
    state_spec = TrainState(params=repl, opt_state=repl, step=repl)
    return jax.jit(
        step,
        in_shardings=(state_spec, batch_spec, repl),
        out_shardings=(state_spec, repl),
    )


def parallel_cohort_sim(
    mesh: Mesh,
    config: HybridConfig,
    axis: str = "data",
):
    """Cohort simulator sharded over chips via shard_map: each device
    integrates its shard of subjects; zero cross-device traffic during the
    solve (embarrassingly parallel — the win is pure throughput scaling)."""

    def local_sim(params, y0s, ts):
        # y0s: (local_B, n); ts: (T,) replicated
        fn = lambda y0: forward(params, y0, ts, None, config, mode="while")
        return jax.vmap(fn)(y0s)

    sim = jax.shard_map(
        local_sim,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sim)
