"""Dense-output Dormand-Prince 5(4): free-running steps + free interpolation.

Every other adaptive driver in this suite forces solver steps onto the
observation grid (one bounded sub-solve per output interval). That is ideal
for the 5-minute CGM grids the datasets ship, but wasteful when observations
are sparse or irregular: the step size is capped by the output spacing, not
by the dynamics. This driver integrates the WHOLE span with free step-size
control and reports observation values through dopri5's classical 4th-order
dense interpolant (Hairer-Norsett-Wanner DOPRI5's CONTD5 continuous
extension) — observations become O(T) masked reads per accepted step, and
the number of field evaluations is set purely by accuracy.

The reference cannot express this at all: it asks scipy for `t_eval` points
(scipy does its own dense output host-side, `models/hybrid_ode_nn.py:240`).

Select with `odeint(..., solver='dopri5', mode='dense')`. Differentiable
(fixed-shape masked `lax.scan` over the step budget, `jax.checkpoint`ed
body); the step controller is stop-gradiented like the other drivers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hybrid_ode_tpu.solvers import explicit as _exp
from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

#: CONTD5 coefficients (Hairer's dopri5.f): rcont5 = h * (D . K)
_D_CONT = np.array([
    -12715105075.0 / 11282082432.0,
    0.0,
    87487479700.0 / 32700410799.0,
    -10690763975.0 / 1880347072.0,
    701980252875.0 / 199316789632.0,
    -1453857185.0 / 822651844.0,
    69997945.0 / 29380423.0,
])


def odeint_dopri5_dense(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 256,
    checkpoint_body: bool = True,
    return_stats: bool = False,
):
    """Integrate [ts[0], ts[-1]] freely; interpolate y(ts). Returns (T, n)."""
    tab = TABLEAUS["dopri5"]
    dtype = y0.dtype
    ts = jnp.asarray(ts, dtype)
    n = y0.shape[-1]
    T = ts.shape[0]
    A = jnp.asarray(tab.a, dtype)
    B = jnp.asarray(tab.b, dtype)
    C = jnp.asarray(tab.c, dtype)
    E = jnp.asarray(tab.err_weights, dtype)   # (7,): stages incl. FSAL stage
    D = jnp.asarray(_D_CONT, dtype)
    rtol_e, atol_e = _exp._effective_tols(rtol, atol, dtype)
    error_order = 4

    t0 = ts[0]
    t_end = ts[-1]
    f0 = f(t0, y0, args)
    h0 = lax.stop_gradient(
        _exp.initial_step_size(f, t0, y0, f0, args, error_order, rtol_e, atol_e)
    )

    ys0 = jnp.zeros((T, n), dtype).at[0].set(y0)

    def body(carry, _):
        t, y, fy, h, ys, done, nacc, nrej = carry
        remaining = t_end - t
        at_end = h >= remaining
        h_eff = jnp.minimum(h, jnp.maximum(remaining, jnp.finfo(dtype).tiny))

        # --- dopri5 stages (k1 = FSAL'd f(t, y); stage 7 IS f(t+h, y1),
        # the tableau's a[6,:] equals b) -------------------------------------
        ks = [fy]
        for i in range(1, 7):
            yi = y + h_eff * sum(A[i, j] * ks[j] for j in range(i))
            ks.append(f(t + C[i] * h_eff, yi, args))
        K = jnp.stack(ks)                      # (7, n)
        hi = jax.lax.Precision.HIGHEST        # TPU f32 @ defaults to bf16 MXU
        y1 = y + h_eff * jnp.matmul(B, K, precision=hi)  # b[6] = 0
        k_last = ks[6]                         # FSAL stage f(t+h, y1)
        err = h_eff * jnp.matmul(E, K, precision=hi)
        scale = atol_e + rtol_e * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        err_norm = lax.stop_gradient(jnp.sqrt(jnp.mean((err / scale) ** 2)))

        accept = err_norm <= 1.0
        move = accept & ~done
        finish = move & at_end

        # --- dense update: fill every output point inside (t, t+h] --------
        ydiff = y1 - y
        bspl = h_eff * ks[0] - ydiff
        r4 = ydiff - h_eff * k_last - bspl
        r5 = h_eff * jnp.matmul(D, K, precision=hi)
        theta = (ts - t) / h_eff               # (T,)
        th = jnp.clip(theta, 0.0, 1.0)[:, None]
        interp = y + th * (ydiff + (1.0 - th) * (bspl + th * (r4 + (1.0 - th) * r5)))
        in_span = (theta > 0.0) & (theta <= 1.0) & move
        ys_new = jnp.where(in_span[:, None], interp, ys)

        factor = _exp._controller_factor(err_norm, accept, error_order, dtype)
        t_new = jnp.where(finish, t_end, jnp.where(move, t + h_eff, t))
        y_new = jnp.where(move, y1, y)
        fy_new = jnp.where(move, k_last, fy)   # FSAL
        h_new = jnp.where(done, h, h_eff * factor)
        done_new = done | finish
        nacc = nacc + move.astype(jnp.int32)
        nrej = nrej + ((~accept) & (~done)).astype(jnp.int32)
        return (t_new, y_new, fy_new, h_new, ys_new, done_new, nacc, nrej), None

    if checkpoint_body:
        body = jax.checkpoint(body)

    init = (t0, y0, f0, h0, ys0, jnp.asarray(False),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    (t, y, fy, h, ys, done, nacc, nrej), _ = lax.scan(
        body, init, None, length=max_steps
    )
    if return_stats:
        stats = _exp.StepStats(n_accepted=nacc, n_rejected=nrej, success=done)
        return ys, stats
    return ys
