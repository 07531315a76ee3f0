"""Adaptive explicit Runge–Kutta integration as a single XLA program.

Design notes (vs the reference, `models/hybrid_ode_nn.py:184-241`):

* The reference crosses Python<->SciPy<->torch boundaries twice per solver
  micro-step and runs batch elements serially. Here one trajectory is one
  jitted function of `(y0, ts, args)`; batches/cohorts/chains/samples are
  `vmap` axes; the whole solve fuses into one program on the TPU.
* The reference's integrator runs under `torch.no_grad()` so *no* gradients
  flow through the dynamics. Here gradients are first-class:
    - mode='scan'  : bounded-step adaptive loop built on `lax.scan`, fully
      reverse-differentiable, `jax.checkpoint` applied per output interval
      so memory stays O(T + max_steps) instead of O(T * max_steps).
    - mode='while' : `lax.while_loop` stepping — fastest forward execution
      (no wasted lockstep iterations), used for inference/simulation and as
      the forward pass of the continuous adjoint (solvers/adjoint.py).
* Step-size control: standard I-controller on the embedded error estimate,
  with DOP853's combined 5th/3rd-order error norm special-cased.
* Output times are honored by clipping steps to land exactly on each
  requested grid point (the solve is an outer scan over output intervals).
  Dense output is unnecessary for the 5-minute clinical grids this framework
  targets and would add data-dependent branching that XLA tiles poorly.

All public entry points take `f(t, y, args) -> dy` and are shape-polymorphic
in the state dimension.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from hybrid_ode_tpu.solvers.tableaus import ERKTableau

# Controller constants (Hairer's recommended defaults).
SAFETY = 0.9
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0


class StepStats(NamedTuple):
    n_accepted: jnp.ndarray  # total accepted steps
    n_rejected: jnp.ndarray  # total rejected steps
    success: jnp.ndarray     # bool: every interval reached its endpoint


def _effective_tols(rtol: float, atol: float, dtype) -> Tuple[float, float]:
    """Clamp tolerances to what the dtype can express.

    float32 cannot honor rtol=1e-6 (reference default, configs/default.yaml);
    below ~100*eps the controller would stall rejecting steps forever. The
    clamp keeps reference configs runnable on TPU f32 while float64 runs use
    them verbatim.
    """
    eps = float(jnp.finfo(dtype).eps)
    return max(float(rtol), 100.0 * eps), max(float(atol), 10.0 * float(jnp.finfo(dtype).tiny))


def _error_norm(tab: ERKTableau, K: jnp.ndarray, h, y0, y1, rtol, atol,
                norm_weights=None) -> jnp.ndarray:
    """RMS error norm; accept when <= 1.

    norm_weights: optional per-component weights (n,) turning the norm into
    a SEMINORM — zero-weighted components do not drive step control. Used by
    the continuous adjoint to exclude the passively-integrated parameter
    cotangents (Kidger, Chen & Lyons 2021, "'Hey, that's not an ODE': Faster
    ODE Adjoints via Seminorms" — accuracy of the backward solve is governed
    by the state/adjoint components; controlling on the parameter-gradient
    integrals wastes steps)."""
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    n = y0.shape[-1]
    hi = jax.lax.Precision.HIGHEST  # TPU f32 @ defaults to bf16 MXU passes
    if norm_weights is None:
        w = None
        w_total = float(n)
    else:
        w = jnp.asarray(norm_weights, K.dtype)
        w_total = jnp.maximum(jnp.sum(w), 1.0)
    if tab.err_weights_low is None:
        e = jnp.asarray(tab.err_weights, K.dtype)
        err = h * jnp.matmul(e, K, precision=hi)
        sq = (err / scale) ** 2
        if w is not None:
            sq = sq * w
        return jnp.sqrt(jnp.sum(sq) / w_total)
    # DOP853: err = err5 * |err5| / sqrt(|err5|^2 + 0.01 |err3|^2)
    e5 = jnp.asarray(tab.err_weights, K.dtype)
    e3 = jnp.asarray(tab.err_weights_low, K.dtype)
    v5 = jnp.matmul(e5, K, precision=hi) / scale
    v3 = jnp.matmul(e3, K, precision=hi) / scale
    if w is not None:
        n5 = jnp.sum(w * v5 * v5)
        n3 = jnp.sum(w * v3 * v3)
    else:
        n5 = jnp.sum(v5 * v5)
        n3 = jnp.sum(v3 * v3)
    denom = n5 + 0.01 * n3
    safe = jnp.sqrt(jnp.maximum(denom * w_total, jnp.finfo(K.dtype).tiny))
    return jnp.where(denom > 0, jnp.abs(h) * n5 / safe, jnp.zeros_like(h))


def make_erk_step(
    f: Callable, tab: ERKTableau, rtol: float, atol: float, norm_weights=None
) -> Callable:
    """Build a single-trial-step function: (t, y, fy, h, args) -> (y1, f1, err_norm).

    Stage loop is unrolled at trace time (<= 13 stages); zero tableau entries
    are skipped so XLA sees only real FMAs.
    """
    s = len(tab.b)
    a, b, c = tab.a, tab.b, tab.c
    has_extra_stage = len(tab.err_weights) == s + 1

    def step(t, y, fy, h, args):
        ks = [fy]
        for i in range(1, s):
            acc = None
            for j in range(i):
                if a[i, j] == 0.0:
                    continue
                term = a[i, j] * ks[j]
                acc = term if acc is None else acc + term
            yi = y + h * acc
            ks.append(f(t + c[i] * h, yi, args))
        y_acc = None
        for j in range(s):
            if b[j] == 0.0:
                continue
            term = b[j] * ks[j]
            y_acc = term if y_acc is None else y_acc + term
        y1 = y + h * y_acc
        if has_extra_stage:
            f1 = f(t + h, y1, args)
            ks.append(f1)
        else:
            # FSAL: the final stage was evaluated at (t+h, y1).
            f1 = ks[-1]
        K = jnp.stack(ks)
        err = _error_norm(tab, K, h, y, y1, rtol, atol, norm_weights)
        return y1, f1, err

    return step


def _controller_factor(err_norm, accepted, error_order, dtype):
    """Step-size update factor.

    Gradient-stopped: the controller's decisions affect the solution only
    through discretization error (kept below tolerance), and differentiating
    err^(-1/(q+1)) overflows f32 near err=0. Same convention as diffrax.
    """
    err_norm = lax.stop_gradient(err_norm)
    expo = 1.0 / (error_order + 1.0)
    safe_err = jnp.maximum(err_norm, jnp.finfo(dtype).tiny)
    factor = SAFETY * safe_err ** (-expo)
    factor = jnp.clip(factor, MIN_FACTOR, MAX_FACTOR)
    # After a rejection never grow the step.
    return jnp.where(accepted, factor, jnp.minimum(factor, 1.0))


def initial_step_size(f, t0, y0, f0, args, error_order, rtol, atol):
    """Hairer-style automatic initial step selection (one extra f eval)."""
    dtype = y0.dtype
    scale = atol + rtol * jnp.abs(y0)
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    tiny = jnp.asarray(1e-6, dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), tiny, 0.01 * d0 / jnp.maximum(d1, jnp.finfo(dtype).tiny))
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1, args)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    expo = 1.0 / (error_order + 1.0)
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(tiny, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, jnp.finfo(dtype).tiny)) ** expo,
    )
    return jnp.minimum(100.0 * h0, h1)


def _interval_scan(step, t0, t1, y0, fy0, h0, args, max_steps, error_order):
    """Adaptive steps across [t0, t1] with a bounded, differentiable scan.

    Runs exactly `max_steps` lockstep iterations (masked once done) — the
    price of reverse-mode differentiability through adaptive control.
    """
    dtype = y0.dtype

    def body(carry, _):
        t, y, fy, h, done, nacc, nrej = carry
        remaining = t1 - t
        at_end = h >= remaining
        h_eff = jnp.minimum(h, remaining)
        y1, f1, errn = step(t, y, fy, h_eff, args)
        accept = errn <= 1.0
        move = accept & ~done
        t_new = jnp.where(move, jnp.where(at_end, t1, t + h_eff), t)
        y_new = jnp.where(move, y1, y)
        fy_new = jnp.where(move, f1, fy)
        done_new = done | (move & at_end)
        factor = _controller_factor(errn, accept, error_order, dtype)
        cand = h_eff * factor
        # When the step was clipped to the endpoint, don't let the clip drag
        # the natural step size down.
        h_cand = jnp.where(accept & at_end, jnp.maximum(h, cand), cand)
        h_new = jnp.where(done, h, h_cand)
        nacc = nacc + move.astype(jnp.int32)
        nrej = nrej + ((~accept) & (~done)).astype(jnp.int32)
        return (t_new, y_new, fy_new, h_new, done_new, nacc, nrej), None

    init = (t0, y0, fy0, h0, jnp.asarray(False), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    (t, y, fy, h, done, nacc, nrej), _ = lax.scan(body, init, None, length=max_steps)
    return y, fy, h, done, nacc, nrej


def _interval_while(step, t0, t1, y0, fy0, h0, args, max_steps, error_order):
    """Adaptive steps across [t0, t1] with lax.while_loop (fast, non-diff)."""
    dtype = y0.dtype

    def cond(carry):
        _, _, _, _, done, it, _, _ = carry
        return (~done) & (it < max_steps)

    def body(carry):
        t, y, fy, h, done, it, nacc, nrej = carry
        remaining = t1 - t
        at_end = h >= remaining
        h_eff = jnp.minimum(h, remaining)
        y1, f1, errn = step(t, y, fy, h_eff, args)
        accept = errn <= 1.0
        t_new = jnp.where(accept, jnp.where(at_end, t1, t + h_eff), t)
        y_new = jnp.where(accept, y1, y)
        fy_new = jnp.where(accept, f1, fy)
        done_new = accept & at_end
        factor = _controller_factor(errn, accept, error_order, dtype)
        cand = h_eff * factor
        h_new = jnp.where(accept & at_end, jnp.maximum(h, cand), cand)
        nacc = nacc + accept.astype(jnp.int32)
        nrej = nrej + (~accept).astype(jnp.int32)
        return (t_new, y_new, fy_new, h_new, done_new, it + 1, nacc, nrej)

    init = (
        t0, y0, fy0, h0,
        jnp.asarray(False), jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
    )
    t, y, fy, h, done, it, nacc, nrej = lax.while_loop(cond, body, init)
    return y, fy, h, done, nacc, nrej


def odeint_erk(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    tab: ERKTableau,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    mode: str = "scan",
    max_steps_per_interval: int = 32,
    checkpoint_intervals: bool = True,
    return_stats: bool = False,
    norm_weights=None,
):
    """Integrate dy/dt = f(t, y, args) and report y at every ts[i].

    Args:
        y0: initial state (n,). Batch via `jax.vmap`.
        ts: strictly increasing output times (T,); ts[0] is the initial time.
        mode: 'scan' (differentiable, bounded lockstep steps) or 'while'
            (fast forward-only).
        max_steps_per_interval: adaptive-step budget between consecutive
            output points.
        checkpoint_intervals: in scan mode, rematerialise each interval in
            the backward pass (memory O(T) instead of O(T * max_steps)).
        norm_weights: optional (n,) component weights for the error SEMINORM
            (see `_error_norm`; zero-weighted components don't drive step
            control — the continuous adjoint's backward solve uses this).

    Returns:
        ys: (T, n) trajectory with ys[0] = y0 (optionally with StepStats).
    """
    dtype = y0.dtype
    ts = jnp.asarray(ts, dtype)
    rtol_e, atol_e = _effective_tols(rtol, atol, dtype)
    step = make_erk_step(f, tab, rtol_e, atol_e, norm_weights)

    f0 = f(ts[0], y0, args)
    h0 = lax.stop_gradient(
        initial_step_size(f, ts[0], y0, f0, args, tab.error_order, rtol_e, atol_e)
    )

    if mode == "scan":
        interval = functools.partial(
            _interval_scan, step, max_steps=max_steps_per_interval, error_order=tab.error_order
        )

        def one_interval(carry, tpair):
            y, fy, h = carry
            t0, t1 = tpair
            y1, f1, h1, done, nacc, nrej = interval(t0, t1, y, fy, h, args)
            return (y1, f1, h1), (y1, done, nacc, nrej)

        if checkpoint_intervals:
            one_interval = jax.checkpoint(one_interval)
        (_, _, _), (ys, dones, naccs, nrejs) = lax.scan(
            one_interval, (y0, f0, h0), (ts[:-1], ts[1:])
        )
    elif mode == "while":
        interval = functools.partial(
            _interval_while, step, max_steps=max_steps_per_interval, error_order=tab.error_order
        )

        def one_interval(carry, tpair):
            y, fy, h = carry
            t0, t1 = tpair
            y1, f1, h1, done, nacc, nrej = interval(t0, t1, y, fy, h, args)
            return (y1, f1, h1), (y1, done, nacc, nrej)

        (_, _, _), (ys, dones, naccs, nrejs) = lax.scan(
            one_interval, (y0, f0, h0), (ts[:-1], ts[1:])
        )
    else:
        raise ValueError(f"unknown mode: {mode!r}")

    ys_full = jnp.concatenate([y0[None], ys], axis=0)
    if return_stats:
        stats = StepStats(
            n_accepted=jnp.sum(naccs), n_rejected=jnp.sum(nrejs), success=jnp.all(dones)
        )
        return ys_full, stats
    return ys_full
