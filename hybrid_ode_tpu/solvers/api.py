"""Unified `odeint` front-end with reference-compatible solver names.

    ys = odeint(f, y0, ts, args, solver='dopri5', rtol=1e-6, atol=1e-8,
                mode='scan')

Solver-name parity with the reference CLI (`train/train_hybrid.py:312-314`:
dopri5 | rk45 | dop853 | radau | bdf), plus TPU-first extras (rk4, euler,
bosh3). `mode='scan'` is reverse-differentiable; `mode='while'` is the fast
inference path; `adjoint='backsolve'` wraps the while-mode forward with a
continuous-adjoint VJP (O(1) memory in trajectory length).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from hybrid_ode_tpu.solvers.bdf import odeint_bdf
from hybrid_ode_tpu.solvers.explicit import odeint_erk
from hybrid_ode_tpu.solvers.fixed import odeint_fixed
from hybrid_ode_tpu.solvers.implicit import odeint_bdf2, odeint_radau
from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

SOLVERS = ("dopri5", "rk45", "dop853", "bosh3", "radau", "bdf", "bdf2", "rk4", "euler")


def odeint(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any = None,
    *,
    solver: str = "dopri5",
    rtol: float = 1e-6,
    atol: float = 1e-8,
    mode: str = "scan",
    max_steps_per_interval: int = 32,
    substeps: int = 4,
    checkpoint_intervals: bool = True,
    adjoint: str = "discrete",
    return_stats: bool = False,
    norm_weights=None,
):
    """Solve dy/dt = f(t, y, args), reporting y(ts[i]) for every output time.

    Args:
        f: vector field `(t, y, args) -> dy` (pure; closure over nothing traced).
        y0: initial state (n,). Batch by `jax.vmap`-ing the whole call.
        ts: increasing output times (T,), ts[0] = t0.
        solver: one of SOLVERS.
        mode: 'scan' (differentiable) | 'while' (fast forward-only).
        max_steps_per_interval: adaptive step budget between output points.
        substeps: fixed steps per interval for 'rk4'/'euler'.
        adjoint: 'discrete' (backprop through the solver) or 'backsolve'
            (continuous adjoint; implies while-mode forward).
        return_stats: also return StepStats (adaptive solvers only).
        norm_weights: optional (n,) error-SEMINORM component weights —
            explicit adaptive solvers only (Kidger et al. 2021; used by the
            backsolve adjoint to exclude parameter-cotangent components).
    """
    solver = solver.lower()
    if norm_weights is not None and (
        mode == "dense" or adjoint == "backsolve" or solver not in TABLEAUS
    ):
        raise ValueError(
            "norm_weights is supported for the explicit adaptive solvers "
            "(scan/while modes) only"
        )
    if mode == "dense":
        # free-running steps + 4th-order dense interpolation (dopri5 only):
        # step size set by the dynamics, not by the observation grid
        if adjoint == "backsolve":
            raise ValueError(
                "mode='dense' uses discretize-then-optimize gradients; "
                "adjoint='backsolve' is unsupported with dense output"
            )
        if solver not in ("dopri5", "rk45", "dop853", "radau", "bdf"):
            raise ValueError(
                "mode='dense' is implemented for dopri5/rk45/dop853/radau/bdf"
            )
        from hybrid_ode_tpu.solvers.dense import (
            odeint_bdf_dense,
            odeint_dop853_dense,
            odeint_dopri5_dense,
            odeint_radau_dense,
        )

        dense_fn = {"dop853": odeint_dop853_dense,
                    "radau": odeint_radau_dense,
                    "bdf": odeint_bdf_dense}.get(solver, odeint_dopri5_dense)
        return dense_fn(
            f, y0, ts, args, rtol=rtol, atol=atol,
            max_steps=max_steps_per_interval * max(ts.shape[0] - 1, 1) // 4,
            return_stats=return_stats,
        )
    if adjoint == "backsolve":
        from hybrid_ode_tpu.solvers.adjoint import odeint_backsolve

        if return_stats:
            raise ValueError("return_stats is unsupported with adjoint='backsolve'")
        return odeint_backsolve(
            f, y0, ts, args, solver=solver, rtol=rtol, atol=atol,
            max_steps_per_interval=max_steps_per_interval, substeps=substeps,
        )

    if solver in TABLEAUS:
        return odeint_erk(
            f, y0, ts, args, TABLEAUS[solver],
            rtol=rtol, atol=atol, mode=mode,
            max_steps_per_interval=max_steps_per_interval,
            checkpoint_intervals=checkpoint_intervals,
            return_stats=return_stats,
            norm_weights=norm_weights,
        )
    if solver == "radau":
        return odeint_radau(
            f, y0, ts, args, rtol=rtol, atol=atol, mode=mode,
            max_steps_per_interval=max_steps_per_interval,
            checkpoint_intervals=checkpoint_intervals,
            return_stats=return_stats,
        )
    if solver == "bdf":
        # variable-order BDF(1-5) — the scipy.BDF-class method the reference
        # maps 'bdf' to (`models/hybrid_ode_nn.py:174-181`)
        return odeint_bdf(
            f, y0, ts, args, rtol=rtol, atol=atol, mode=mode,
            max_steps_per_interval=max_steps_per_interval,
            checkpoint_intervals=checkpoint_intervals,
            return_stats=return_stats,
        )
    if solver == "bdf2":
        return odeint_bdf2(
            f, y0, ts, args, rtol=rtol, atol=atol, mode=mode,
            max_steps_per_interval=max_steps_per_interval,
            checkpoint_intervals=checkpoint_intervals,
            return_stats=return_stats,
        )
    if solver in ("rk4", "euler"):
        if return_stats:
            raise ValueError("fixed-grid solvers have no step stats")
        return odeint_fixed(
            f, y0, ts, args, method=solver, substeps=substeps,
            checkpoint_intervals=checkpoint_intervals,
        )
    raise ValueError(f"unknown solver {solver!r}; available: {SOLVERS}")
