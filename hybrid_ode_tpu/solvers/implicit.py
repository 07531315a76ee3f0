"""Implicit stiff solvers: Radau IIA (order 5) and variable-step BDF2.

The reference reaches stiff integration through SciPy's `Radau`/`BDF`
(`models/hybrid_ode_nn.py:174-181`, used by the MIMIC clinical config). Those
are host-side, gradient-free, per-sample serial. Here each implicit step is a
simplified-Newton solve expressed with `jax.jacfwd` + dense LU — for the
6-state system the iteration matrix is 18x18, which XLA handles as a single
fused kernel, and the whole stiff solve remains jittable, differentiable
(scan mode) and vmappable over patients/chains.

Radau IIA(3 stages, order 5):
  * collocation nodes c = [(4-sqrt6)/10, (4+sqrt6)/10, 1]; stiffly accurate.
  * simplified Newton on stacked stage increments Z in R^{3n} with iteration
    matrix M = I - h (A (x) J), J = df/dy at (t0, y0); LU factored once/step.
  * embedded 3rd-order error estimate: weights solved at import from the
    order conditions with bhat_0 = gamma0 (the real eigenvalue of A), then
    smoothed by (I - h*gamma0*J)^-1 as in Hairer-Wanner's RADAU5.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import lu_factor, lu_solve

from hybrid_ode_tpu.solvers import explicit as _exp

# ---------------------------------------------------------------------------
# Radau IIA coefficients (order 5, 3 stages) — computed exactly at import.
# ---------------------------------------------------------------------------
_SQ6 = np.sqrt(6.0)
RADAU_C = np.array([(4.0 - _SQ6) / 10.0, (4.0 + _SQ6) / 10.0, 1.0])
RADAU_A = np.array(
    [
        [(88.0 - 7.0 * _SQ6) / 360.0, (296.0 - 169.0 * _SQ6) / 1800.0, (-2.0 + 3.0 * _SQ6) / 225.0],
        [(296.0 + 169.0 * _SQ6) / 1800.0, (88.0 + 7.0 * _SQ6) / 360.0, (-2.0 - 3.0 * _SQ6) / 225.0],
        [(16.0 - _SQ6) / 36.0, (16.0 + _SQ6) / 36.0, 1.0 / 9.0],
    ]
)
RADAU_B = RADAU_A[-1]  # stiffly accurate

# gamma0 = the real eigenvalue of A (~0.27489); bhat solves the order-3
# conditions sum_i bhat_i c_i^{k-1} = 1/k - gamma0*delta_{k1}.
_eigs = np.linalg.eigvals(RADAU_A)
RADAU_GAMMA0 = float(np.real(_eigs[np.argmin(np.abs(np.imag(_eigs)))]))
_V = np.vander(RADAU_C, 3, increasing=True).T  # rows: c^0, c^1, c^2
_rhs = np.array([1.0 - RADAU_GAMMA0, 0.5, 1.0 / 3.0])
RADAU_BHAT = np.linalg.solve(_V, _rhs)
RADAU_ERR_W = RADAU_BHAT - RADAU_B  # stage-weight part of the error estimate

NEWTON_ITERS = 7
NEWTON_TOL_FACTOR = 0.03  # converged when |dZ|_rms <= factor * tol scale


def make_radau_step(f: Callable, rtol: float, atol: float) -> Callable:
    """Build (t, y, fy, h, args) -> (y1, f1, err_norm), plug-compatible with
    the explicit interval drivers in solvers/explicit.py."""
    full = make_radau_step_full(f, rtol, atol)

    def step(t, y, fy, h, args):
        y1, f1, err_norm, _Z = full(t, y, fy, h, args)
        return y1, f1, err_norm

    return step


def make_radau_step_full(f: Callable, rtol: float, atol: float) -> Callable:
    """Like make_radau_step but also returns the stage increments Z (3, n) —
    the collocation values y(t + c_i h) - y needed by the dense-output
    driver's interpolant (solvers/dense.py odeint_radau_dense)."""

    def step(t, y, fy, h, args):
        dtype = y.dtype
        n = y.shape[-1]
        A = jnp.asarray(RADAU_A, dtype)
        c = jnp.asarray(RADAU_C, dtype)
        ew = jnp.asarray(RADAU_ERR_W, dtype)
        g0 = jnp.asarray(RADAU_GAMMA0, dtype)

        J = jax.jacfwd(lambda yy: f(t, yy, args))(y)  # (n, n)
        I3n = jnp.eye(3 * n, dtype=dtype)
        M = I3n - h * jnp.kron(A, J)
        lu = lu_factor(M)

        stage_ts = t + c * h

        def F_of_Z(Z):  # Z: (3, n) -> stage derivatives (3, n)
            return jax.vmap(lambda ti, zi: f(ti, y + zi, args))(stage_ts, Z)

        def newton_body(carry, _):
            Z, _prev_dz = carry
            Fz = F_of_Z(Z)
            # HIGHEST: TPU f32 matmul defaults to bf16 MXU passes, which
            # would noise the Newton residual below f32 accuracy
            G = Z - h * jnp.matmul(A, Fz, precision=jax.lax.Precision.HIGHEST)
            dZ = -lu_solve(lu, G.reshape(-1)).reshape(3, n)
            Z_new = Z + dZ
            dz_rms = jnp.sqrt(jnp.mean(dZ**2))
            return (Z_new, dz_rms), None

        Z0 = jnp.zeros((3, n), dtype)
        (Z, dz_rms), _ = lax.scan(newton_body, (Z0, jnp.asarray(jnp.inf, dtype)), None, length=NEWTON_ITERS)

        y1 = y + Z[2]  # stiffly accurate: c3 = 1
        Fz = F_of_Z(Z)
        f1 = Fz[2]

        # Embedded error, smoothed through (I - h*gamma0*J)
        err_raw = h * (g0 * fy + jnp.matmul(
            ew, Fz, precision=jax.lax.Precision.HIGHEST))  # (n,)
        Msm = jnp.eye(n, dtype=dtype) - h * g0 * J
        err = jnp.linalg.solve(Msm, err_raw)

        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        # Non-converged Newton => force rejection via inflated error.
        newton_ok = dz_rms <= NEWTON_TOL_FACTOR * jnp.sqrt(jnp.mean(scale**2))
        err_norm = jnp.where(newton_ok, err_norm, jnp.maximum(err_norm, jnp.asarray(2.0, dtype)))
        return y1, f1, err_norm, Z

    return step


def odeint_radau(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    mode: str = "scan",
    max_steps_per_interval: int = 32,
    checkpoint_intervals: bool = True,
    return_stats: bool = False,
):
    """Radau IIA(5) over the output grid; same driver contract as odeint_erk."""
    dtype = y0.dtype
    ts = jnp.asarray(ts, dtype)
    rtol_e, atol_e = _exp._effective_tols(rtol, atol, dtype)
    step = make_radau_step(f, rtol_e, atol_e)
    error_order = 3

    f0 = f(ts[0], y0, args)
    h0 = lax.stop_gradient(
        _exp.initial_step_size(f, ts[0], y0, f0, args, error_order, rtol_e, atol_e)
    )

    interval_fn = _exp._interval_scan if mode == "scan" else _exp._interval_while
    interval = functools.partial(
        interval_fn, step, max_steps=max_steps_per_interval, error_order=error_order
    )

    def one_interval(carry, tpair):
        y, fy, h = carry
        t0, t1 = tpair
        y1, f1, h1, done, nacc, nrej = interval(t0, t1, y, fy, h, args)
        return (y1, f1, h1), (y1, done, nacc, nrej)

    if mode == "scan" and checkpoint_intervals:
        one_interval = jax.checkpoint(one_interval)
    (_, _, _), (ys, dones, naccs, nrejs) = lax.scan(one_interval, (y0, f0, h0), (ts[:-1], ts[1:]))
    ys_full = jnp.concatenate([y0[None], ys], axis=0)
    if return_stats:
        stats = _exp.StepStats(
            n_accepted=jnp.sum(naccs), n_rejected=jnp.sum(nrejs), success=jnp.all(dones)
        )
        return ys_full, stats
    return ys_full


# ---------------------------------------------------------------------------
# BDF2 (variable step, Newton-corrected) — stiff alternative with cheap steps.
# ---------------------------------------------------------------------------

def _bdf_newton(f, t1, y_pred, rhs_const, beta, h, args, rtol, atol):
    """Solve y = rhs_const + beta*h*f(t1, y) by simplified Newton from y_pred.

    Also returns the LU of (I - beta*h*J) so the caller can smooth the error
    estimate through it (essential for stiff problems, where raw
    polynomial-predictor differences wildly overestimate the error in the
    fast-decaying directions — cf. Hairer-Wanner RADAU5's filtered estimate).
    """
    n = y_pred.shape[-1]
    dtype = y_pred.dtype
    J = jax.jacfwd(lambda yy: f(t1, yy, args))(y_pred)
    M = jnp.eye(n, dtype=dtype) - beta * h * J
    lu = lu_factor(M)

    def body(carry, _):
        yk, _ = carry
        G = yk - rhs_const - beta * h * f(t1, yk, args)
        dy = -lu_solve(lu, G)
        y_new = yk + dy
        return (y_new, jnp.sqrt(jnp.mean(dy**2))), None

    (y1, dy_rms), _ = lax.scan(body, (y_pred, jnp.asarray(jnp.inf, dtype)), None, length=NEWTON_ITERS)
    scale = atol + rtol * jnp.abs(y1)
    ok = dy_rms <= NEWTON_TOL_FACTOR * jnp.sqrt(jnp.mean(scale**2))
    return y1, ok, lu


def odeint_bdf2(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    mode: str = "scan",
    max_steps_per_interval: int = 64,
    checkpoint_intervals: bool = True,
    return_stats: bool = False,
):
    """Variable-step BDF2 on the output grid.

    Formula (step ratio r = h_n / h_{n-1}):
        y_{n+1} = [(1+r)^2 y_n - r^2 y_{n-1}] / (1 + 2r)
                  + h_n (1+r)/(1+2r) f(t_{n+1}, y_{n+1})
    First step of the trajectory bootstraps with implicit Euler. Local error
    is estimated against the linear predictor (order-2 consistent).
    """
    dtype = y0.dtype
    ts = jnp.asarray(ts, dtype)
    rtol_e, atol_e = _exp._effective_tols(rtol, atol, dtype)
    error_order = 2

    f0 = f(ts[0], y0, args)
    h_init = lax.stop_gradient(
        _exp.initial_step_size(f, ts[0], y0, f0, args, error_order, rtol_e, atol_e)
    )

    def attempt_step(t, y, y_prev, h, h_prev, have_hist, args):
        t1 = t + h
        hp = jnp.maximum(h_prev, jnp.finfo(dtype).tiny)
        r = h / hp
        # BDF2 coefficients (fall back to implicit Euler without history)
        denom = 1.0 + 2.0 * r
        rhs_bdf2 = ((1.0 + r) ** 2 * y - r**2 * y_prev) / denom
        beta_bdf2 = (1.0 + r) / denom
        rhs_c = jnp.where(have_hist, rhs_bdf2, y)
        beta = jnp.where(have_hist, beta_bdf2, jnp.asarray(1.0, dtype))
        # Quadratic predictor through (y_prev, y, f(t, y)) — O(h^3) accurate,
        # so the Milne difference (corrector - predictor) is order-consistent
        # with BDF2's local error. (A linear predictor would be O(h^2) and
        # strangle the controller.) Taylor analysis with step ratio r = h/hp:
        #   corrector LTE  = -h^3 y''' (1+r)^2 / (6 r (1+2r))
        #   predictor err  = -h^3 y''' (1+r) / (6 r)
        #   => LTE = (y1 - y_pred) * (1+r)/r   (r=1 gives the classic 2x).
        fy = f(t, y, args)
        a_quad = (y_prev - y + fy * hp) / hp**2
        y_quad = y + fy * h + a_quad * h**2
        y_pred = jnp.where(have_hist, y_quad, y + h * fy)
        y1, ok, lu = _bdf_newton(f, t1, y_pred, rhs_c, beta, h, args, rtol_e, atol_e)
        milne = (1.0 + r) / jnp.maximum(r, jnp.finfo(dtype).tiny)
        err = (y1 - y_pred) * jnp.where(have_hist, milne, 0.5)
        # Filter the estimate through (I - beta*h*J)^-1 (stiff smoothing).
        err = lu_solve(lu, err)
        scale = atol_e + rtol_e * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        errn = jnp.sqrt(jnp.mean((err / scale) ** 2))
        errn = jnp.where(ok, errn, jnp.maximum(errn, jnp.asarray(2.0, dtype)))
        return y1, errn

    def interval_scan(t0, t1, y, y_prev, h, h_prev, have_hist):
        def body(carry, _):
            t, y, y_prev, h, h_prev, have_hist, done, nacc, nrej = carry
            remaining = t1 - t
            at_end = h >= remaining
            h_eff = jnp.minimum(h, remaining)
            y1, errn = attempt_step(t, y, y_prev, h_eff, h_prev, have_hist, args)
            accept = errn <= 1.0
            move = accept & ~done
            t_new = jnp.where(move, jnp.where(at_end, t1, t + h_eff), t)
            y_prev_new = jnp.where(move, y, y_prev)
            y_new = jnp.where(move, y1, y)
            h_prev_new = jnp.where(move, h_eff, h_prev)
            have_hist_new = have_hist | move
            done_new = done | (move & at_end)
            factor = _exp._controller_factor(errn, accept, error_order, dtype)
            cand = h_eff * factor
            h_cand = jnp.where(accept & at_end, jnp.maximum(h, cand), cand)
            h_new = jnp.where(done, h, h_cand)
            nacc = nacc + move.astype(jnp.int32)
            nrej = nrej + ((~accept) & (~done)).astype(jnp.int32)
            return (t_new, y_new, y_prev_new, h_new, h_prev_new, have_hist_new, done_new, nacc, nrej), None

        init = (
            t0, y, y_prev, h, h_prev, have_hist,
            jnp.asarray(False), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        )
        (t, y, y_prev, h, h_prev, have_hist, done, nacc, nrej), _ = lax.scan(
            body, init, None, length=max_steps_per_interval
        )
        return y, y_prev, h, h_prev, have_hist, done, nacc, nrej

    def one_interval(carry, tpair):
        y, y_prev, h, h_prev, have_hist = carry
        t0, t1 = tpair
        y1, y_prev1, h1, h_prev1, hist1, done, nacc, nrej = interval_scan(
            t0, t1, y, y_prev, h, h_prev, have_hist
        )
        return (y1, y_prev1, h1, h_prev1, hist1), (y1, done, nacc, nrej)

    if mode == "scan" and checkpoint_intervals:
        one_interval = jax.checkpoint(one_interval)

    init = (y0, y0, h_init, h_init, jnp.asarray(False))
    (_, _, _, _, _), (ys, dones, naccs, nrejs) = lax.scan(one_interval, init, (ts[:-1], ts[1:]))
    ys_full = jnp.concatenate([y0[None], ys], axis=0)
    if return_stats:
        stats = _exp.StepStats(
            n_accepted=jnp.sum(naccs), n_rejected=jnp.sum(nrejs), success=jnp.all(dones)
        )
        return ys_full, stats
    return ys_full
