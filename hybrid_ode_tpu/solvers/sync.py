"""Batch-SYNCHRONIZED adaptive Runge–Kutta integration (two-pass gradients).

Replaces `scipy.integrate.solve_ivp` at `/root/reference/models/
hybrid_ode_nn.py:240` for BATCHED training workloads, solving the
performance problem measured in results/adaptive_bound.json (round 4): the
per-sample adaptive path (`jax.vmap` of `solvers/explicit.py` in
mode='scan') must run a fixed lockstep budget of trial steps per output
interval to stay reverse-differentiable — 32 masked 7-stage trial steps per
interval whether a sample needs 2 or 30 — costing 6.7x the fused
fixed-step kernel on an identical train step (236.8 ms vs 35.4 ms at
B=256) and a 1679 s compile (nested checkpointed scan-of-scans).

TPU-first redesign, two passes:

  PASS 1 (mesh search, `lax.while_loop`, gradient-free): ONE shared step
  controller for the whole batch. Each trial step advances every sample
  together in normalized interval time sigma in [0, 1]; accept/reject is
  decided on the MAX of the per-sample RMS error norms, so the accepted
  mesh honors the tolerance for the *worst* sample. The while loop takes
  exactly the steps the batch needs (no lockstep waste) and is cheap: it
  runs forward-only under `stop_gradient`.

  PASS 2 (differentiable re-integration): the accepted mesh — a flat,
  compacted list of (interval, sigma_start, h_sigma) triples — is treated
  as DATA (step sizes are gradient-stopped everywhere in this package, see
  `explicit._controller_factor`), and the trajectory is recomputed as a
  single flat `lax.scan` of plain ERK steps on that fixed mesh. No error
  control, no masking, no nested scans: XLA sees a shallow chain of
  batched (B, n) stage FMAs — exactly the shape it tiles well — and
  reverse-mode has one clean scan to transpose.

This is discretize-then-optimize on the adaptive mesh: gradients are those
of the fixed-mesh discretization actually used for the solution, the same
convention as mode='scan' (whose controller is also gradient-stopped; its
rejected trial steps contribute nothing to the VJP).

Trade-off vs per-sample adaptivity: the shared controller takes
min-over-batch step sizes, so a batch with one stiff sample slows everyone
(the price of synchronization). For training batches drawn from one cohort
the step-size spread is small and the lockstep savings dominate (measured:
see results/adaptive_bound.json round 5).

Static-shape contract: the compacted mesh is padded to `total_step_budget`
flat steps (padding steps carry h=0 — exact no-ops). If the batch
genuinely needs more accepted steps than the budget, the tail is DROPPED
and `StepStats.success` is False — always check stats (or run the oracle
tier) when pushing tolerances; the budget is a compile-time knob.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hybrid_ode_tpu.solvers.explicit import (
    StepStats,
    _controller_factor,
    _effective_tols,
    initial_step_size,
    make_erk_step,
)
from hybrid_ode_tpu.solvers.tableaus import ERKTableau


def _sigma_field(f: Callable) -> Callable:
    """Per-sample field in normalized interval time.

    sigma in [0, 1] spans [t0_i, t1_i]; dy/dsigma = f(t, y) * dt_i. Each
    sample keeps its own physical clock, so batch synchronization works for
    per-sample output grids (B, T) as long as every sample has the same
    NUMBER of intervals."""

    def fs(sigma, y, sargs):
        t0, dt, args = sargs
        return f(t0 + sigma * dt, y, args) * dt

    return fs


def odeint_erk_sync(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args: Any,
    tab: ERKTableau,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    args_axes: Any = None,
    max_steps_per_interval: int = 32,
    total_step_budget: Optional[int] = None,
    return_stats: bool = False,
):
    """Batch-synchronized adaptive ERK solve: (B, n) x (B, T) -> (B, T, n).

    Args:
        f: per-sample field `(t, y, args) -> dy`, y (n,).
        y0: initial states (B, n).
        ts: output times, (B, T) per-sample or (T,) shared; strictly
            increasing along the last axis.
        args: field arguments; batched leaves per `args_axes`.
        args_axes: vmap-style in_axes prefix for `args` (None = replicated,
            0 = leading batch axis), e.g. `(None, Controls(ts=0, ...))` for
            the hybrid model's (params, controls) tuple.
        max_steps_per_interval: pass-1 trial-step budget per output interval.
        total_step_budget: static length of the compacted differentiable
            mesh (default 4 * (T-1)). Overflow drops steps and clears
            StepStats.success.

    Returns:
        ys (B, T, n), optionally with StepStats (aggregated over the batch:
        accepted/rejected SHARED steps, success = every interval reached
        its endpoint and the budget held).
    """
    dtype = y0.dtype
    B, n = y0.shape
    ts = jnp.asarray(ts, dtype)
    if ts.ndim == 1:
        ts = jnp.broadcast_to(ts[None, :], (B, ts.shape[0]))
    T = ts.shape[1]
    n_int = T - 1
    budget = int(total_step_budget) if total_step_budget else 4 * n_int
    rtol_e, atol_e = _effective_tols(rtol, atol, dtype)

    fs = _sigma_field(f)
    step1 = make_erk_step(fs, tab, rtol_e, atol_e)
    # shared sigma/h, per-sample (t0, dt, args slice)
    step_b = jax.vmap(step1, in_axes=(None, 0, 0, None, (0, 0, args_axes)))

    dts = ts[:, 1:] - ts[:, :-1]                      # (B, n_int)

    # ---- pass 1: shared-controller mesh search (gradient-free) -----------
    # Everything pass 1 touches is a stop_gradient copy, so reverse-mode
    # never tries to transpose the while_loop: the accepted mesh is DATA.
    sg_y0, sg_ts, sg_dts, sg_args = jax.tree_util.tree_map(
        lax.stop_gradient, (y0, ts, dts, args))

    def interval_mesh(carry, k):
        y, f_phys, h = carry
        t0_b = jnp.take(sg_ts, k, axis=1)             # (B,)
        dt_b = jnp.take(sg_dts, k, axis=1)            # (B,)
        sargs = (t0_b, dt_b, sg_args)

        def cond(c):
            _, _, _, sigma, done, it, _ = c
            return (~done) & (it < max_steps_per_interval)

        def body(c):
            y_c, fy_c, h_c, sigma, done, it, log = c
            remaining = 1.0 - sigma
            at_end = h_c >= remaining
            h_eff = jnp.minimum(h_c, remaining)
            y1, f1, errn = step_b(sigma, y_c, fy_c, h_eff, sargs)
            err_max = jnp.max(errn)                    # batch-sync accept
            accept = err_max <= 1.0
            hbuf, cnt = log
            hbuf = jnp.where(accept, hbuf.at[cnt].set(h_eff), hbuf)
            cnt = cnt + accept.astype(jnp.int32)
            sigma_new = jnp.where(accept,
                                  jnp.where(at_end, 1.0, sigma + h_eff), sigma)
            y_new = jnp.where(accept, y1, y_c)
            fy_new = jnp.where(accept, f1, fy_c)
            done_new = accept & at_end
            factor = _controller_factor(err_max, accept, tab.error_order, dtype)
            cand = h_eff * factor
            h_new = jnp.where(accept & at_end, jnp.maximum(h_c, cand), cand)
            return (y_new, fy_new, h_new, sigma_new, done_new, it + 1,
                    (hbuf, cnt))

        fy0 = f_phys * dt_b[:, None]                  # sigma units
        log0 = (jnp.zeros((max_steps_per_interval,), dtype),
                jnp.asarray(0, jnp.int32))
        init = (y, fy0, h, jnp.asarray(0.0, dtype), jnp.asarray(False),
                jnp.asarray(0, jnp.int32), log0)
        y1, fy1, h1, sigma, done, _, (hbuf, cnt) = lax.while_loop(
            cond, body, init)
        f_phys1 = fy1 / dt_b[:, None]
        return (y1, f_phys1, h1), (hbuf, cnt, done)

    def fphys_sg(t_b, y_b):
        return jax.vmap(f, in_axes=(0, 0, args_axes))(t_b, y_b, sg_args)

    sg_f0 = fphys_sg(sg_ts[:, 0], sg_y0)
    # shared initial step: min over the batch of per-sample selections
    fs0 = sg_f0 * sg_dts[:, 0][:, None]
    h0s = jax.vmap(
        lambda t0, dt, y, fy, a: initial_step_size(
            fs, jnp.asarray(0.0, dtype), y, fy, (t0, dt, a),
            tab.error_order, rtol_e, atol_e),
        in_axes=(0, 0, 0, 0, args_axes),
    )(sg_ts[:, 0], sg_dts[:, 0], sg_y0, fs0, sg_args)
    h0 = jnp.min(h0s)
    (_, _, _), (hgrid, counts, dones) = lax.scan(
        interval_mesh, (sg_y0, sg_f0, h0), jnp.arange(n_int))
    # hgrid (n_int, S_per) shared step sizes; counts (n_int,)

    # ---- compact to a flat padded mesh ------------------------------------
    offsets = jnp.cumsum(counts) - counts                       # (n_int,)
    S_per = max_steps_per_interval
    j = jnp.arange(S_per)[None, :]
    valid = j < counts[:, None]                                 # (n_int, S_per)
    flat_idx = jnp.where(valid, offsets[:, None] + j, budget)   # drop tail
    sigma_grid = jnp.cumsum(hgrid, axis=1) - hgrid              # exclusive
    k_grid = jnp.broadcast_to(
        jnp.arange(n_int, dtype=jnp.int32)[:, None], (n_int, S_per))
    flat_h = jnp.zeros((budget,), dtype).at[flat_idx.ravel()].set(
        hgrid.ravel(), mode="drop")
    flat_sigma = jnp.zeros((budget,), dtype).at[flat_idx.ravel()].set(
        sigma_grid.ravel(), mode="drop")
    flat_k = jnp.zeros((budget,), jnp.int32).at[flat_idx.ravel()].set(
        k_grid.ravel(), mode="drop")

    # ---- pass 2: differentiable re-integration on the fixed mesh ----------
    f0 = jax.vmap(f, in_axes=(0, 0, args_axes))(ts[:, 0], y0, args)

    def flat_step(carry, xs):
        y, f_phys = carry
        k, sigma, h = xs
        t0_b = jnp.take(ts, k, axis=1)
        dt_b = jnp.take(dts, k, axis=1)
        fy = f_phys * dt_b[:, None]
        y1, f1, _ = step_b(sigma, y, fy, h, (t0_b, dt_b, args))
        pad = h == 0.0
        y_new = jnp.where(pad, y, y1)
        f_new = jnp.where(pad, f_phys, f1 / dt_b[:, None])
        return (y_new, f_new), y_new

    (_, _), ys_flat = lax.scan(flat_step, (y0, f0),
                               (flat_k, flat_sigma, flat_h))
    ends = jnp.clip(offsets + counts - 1, 0, budget - 1)        # (n_int,)
    ys = jnp.moveaxis(ys_flat[ends], 1, 0)                      # (B, n_int, n)
    ys_full = jnp.concatenate([y0[:, None], ys], axis=1)        # (B, T, n)

    if return_stats:
        total = jnp.sum(counts)
        stats = StepStats(
            n_accepted=total,
            n_rejected=jnp.asarray(0, jnp.int32),  # shared rejects not logged
            success=jnp.all(dones) & (total <= budget),
        )
        return ys_full, stats
    return ys_full
