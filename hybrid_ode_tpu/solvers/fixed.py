"""Fixed-grid explicit solvers (classic RK4 and Euler).

The fastest differentiable path: no error control, `substeps` RK4 stages per
output interval under one `lax.scan`. For the smooth glucose dynamics on
5-minute grids this matches adaptive dopri5 to well below measurement noise
while doing a deterministic, perfectly lockstep amount of work — ideal for
TPU training throughput (no reference analogue; the reference cannot
differentiate through its integrator at all, `models/hybrid_ode_nn.py:234`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax


def _rk4_step(f: Callable, t, y, h, args):
    k1 = f(t, y, args)
    k2 = f(t + 0.5 * h, y + 0.5 * h * k1, args)
    k3 = f(t + 0.5 * h, y + 0.5 * h * k2, args)
    k4 = f(t + h, y + h * k3, args)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def _euler_step(f: Callable, t, y, h, args):
    return y + h * f(t, y, args)


_STEPPERS = {"rk4": _rk4_step, "euler": _euler_step}


def odeint_fixed(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    *,
    method: str = "rk4",
    substeps: int = 4,
    checkpoint_intervals: bool = True,
):
    """Integrate on the output grid with `substeps` fixed steps per interval."""
    stepper = _STEPPERS[method]
    ts = jnp.asarray(ts, y0.dtype)

    def one_interval(y, tpair):
        t0, t1 = tpair
        h = (t1 - t0) / substeps

        def sub(carry, i):
            yc = carry
            t = t0 + i * h
            return stepper(f, t, yc, h, args), None

        y1, _ = lax.scan(sub, y, jnp.arange(substeps, dtype=y0.dtype))
        return y1, y1

    if checkpoint_intervals:
        one_interval = jax.checkpoint(one_interval)
    _, ys = lax.scan(one_interval, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
