"""Continuous-adjoint (backsolve) differentiation for the adaptive solvers.

Gives gradients of `odeint` outputs w.r.t. `y0` and `args` with O(1) memory
in trajectory length: the forward pass runs the fast while-mode solve, and
the backward pass integrates the adjoint ODE

    dy/dt      = f(t, y, args)
    da/dt      = -a^T (df/dy)
    dgrad_args = -a^T (df/dargs)

backwards through each output interval, injecting the incoming cotangent of
each observation as it passes (Pontryagin / neural-ODE adjoint). The
reference has no analogue — its integrator is gradient-free
(`models/hybrid_ode_nn.py:234`).

Notes:
  * cotangents for `ts` are returned as zeros (observation times are data,
    never optimised in this framework).
  * adjoint accuracy is controlled by the same rtol/atol as the forward.
  * seminorm=True (default): the backward solve's step control uses an error
    SEMINORM over the [y, adjoint] components only — the parameter-cotangent
    components are passive integrals (they never feed back into the
    augmented dynamics), so controlling step size on them only wastes steps
    (Kidger, Chen & Lyons 2021, arXiv:2009.09457; ~30-60% fewer backward
    steps measured there, gradient accuracy unchanged).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


def odeint_backsolve(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    *,
    solver: str = "dopri5",
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps_per_interval: int = 32,
    substeps: int = 4,
    seminorm: bool = True,
):
    from hybrid_ode_tpu.solvers.api import odeint as _odeint
    from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

    solve_kwargs = dict(
        solver=solver, rtol=rtol, atol=atol, mode="while",
        max_steps_per_interval=max_steps_per_interval, substeps=substeps,
        checkpoint_intervals=False,
    )
    if solver in ("rk4", "euler"):
        # fixed solvers have no mode; drop adaptive-only kwargs
        solve_kwargs = dict(solver=solver, substeps=substeps, checkpoint_intervals=False)

    args_flat, unravel_args = ravel_pytree(args)
    n = y0.shape[-1]
    m = args_flat.shape[0]

    bwd_kwargs = dict(solve_kwargs)
    if seminorm and solver in TABLEAUS:
        # weight [y, a] = 1, parameter cotangents = 0 (seminorm, see above)
        bwd_kwargs["norm_weights"] = jnp.concatenate(
            [jnp.ones(2 * n), jnp.zeros(m)])

    def solve(y0_, ts_, args_flat_):
        return _odeint(f, y0_, ts_, unravel_args(args_flat_), **solve_kwargs)

    @jax.custom_vjp
    def _solve_cv(y0_, ts_, args_flat_):
        return solve(y0_, ts_, args_flat_)

    def _fwd(y0_, ts_, args_flat_):
        ys = solve(y0_, ts_, args_flat_)
        return ys, (ys, ts_, args_flat_)

    def _bwd(res, g_ys):
        ys, ts_, args_flat_ = res
        dtype = ys.dtype

        def aug_field(tau, aug, af):
            # tau = -t: integrate forward in tau == backward in t
            t = -tau
            y = aug[:n]
            a = aug[n : 2 * n]
            fy, vjp_fn = jax.vjp(lambda yy, aa: f(t, yy, unravel_args(aa)), y, af)
            a_dot_y, a_dot_args = vjp_fn(a)
            # d/dtau [y, a, g_args] = [-f, +a^T df/dy, +a^T df/dargs]
            return jnp.concatenate([-fy, a_dot_y, a_dot_args])

        def backward_interval(carry, idx):
            # integrate from t_{idx+1} down to t_idx
            aug = carry
            t_hi = ts_[idx + 1]
            t_lo = ts_[idx]
            # inject cotangent of the observation at t_hi
            aug = aug.at[n : 2 * n].add(g_ys[idx + 1])
            aug = aug.at[:n].set(ys[idx + 1])
            tau_grid = jnp.stack([-t_hi, -t_lo])
            out = _odeint(aug_field, aug, tau_grid, args_flat_, **bwd_kwargs)
            return out[-1], None

        aug0 = jnp.zeros((2 * n + m,), dtype)
        T = ts_.shape[0]
        idxs = jnp.arange(T - 2, -1, -1)
        aug_final, _ = lax.scan(backward_interval, aug0, idxs)

        g_y0 = aug_final[n : 2 * n] + g_ys[0]
        g_args_flat = aug_final[2 * n :]
        return g_y0, jnp.zeros_like(ts_), g_args_flat

    _solve_cv.defvjp(_fwd, _bwd)
    return _solve_cv(y0, jnp.asarray(ts, y0.dtype), args_flat)
