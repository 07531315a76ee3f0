"""Pallas TPU kernel: fused full-trajectory RK4 for the hybrid ODE-NN field.

The hot inner loop of the framework is (mechanistic drift + 5-layer MLP
residual) evaluated 4x per RK4 substep, thousands of substeps per cohort
simulation. This kernel keeps the ENTIRE integration resident in VMEM:

  * states live transposed as (8, B_block): batch on the lane axis — at the
    default B_block=2048 every MLP matmul is (64,64)@(64,2048), a fat MXU
    shape, and the elementwise mechanistic math vectorises fully on the VPU.
  * MLP weights (~64 KB) are loaded to VMEM once per block and reused for
    all (T-1)*substeps*4 stage evaluations.
  * the time loop runs inside the kernel (`lax.fori_loop`); observation rows
    are written straight to the output block — zero HBM round-trips between
    solver steps.
  * controls (meal/tVNS) are piecewise-linear on the observation grid; at
    substep j, stage c of interval i the interpolation weight is exactly
    (j+c)/substeps, so stage values are two VMEM row reads + one FMA — no
    searchsorted, no host-side precomputation.

Forward/simulation path (no custom VJP yet); training uses the XLA path.

State layout parity: rows 0..5 = [G, I, Glu, GLP1, GE, FFA]; rows 6..7 pad.
MLP feature order parity with `dynamics.residual.residual_features`:
[t, y(6), glp1, tvns]. GD is 0 in this path (datasets carry no
gastric-distension signal), so k_GE == k_GE0 exactly as in
`dynamics.ode_core.mechanistic_field`.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

#: mech-param packing order for the (1, 32) parameter row
PARAM_ORDER = (
    "a_GI", "k_I", "rho", "G_b", "I_b", "E_max", "EC_50", "Glu_b",
    "V_max", "K_m", "k_L", "k_GE0", "IGD_50", "g", "p_7", "p_8", "p_9",
)

BLOCK_B = 2048  # batch lanes per kernel instance


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def _pack_weights(nn_params: Dict[str, jnp.ndarray], n_layers: int):
    """Transpose + pad the MLP weights for the (features, batch) layout."""
    ws, bs = [], []
    for i in range(n_layers + 1):
        w = nn_params[f"w{i}"]  # (in, out)
        b = nn_params[f"b{i}"]  # (out,)
        wt = w.T  # (out, in)
        out_dim, in_dim = wt.shape
        in_pad = 16 if i == 0 else in_dim
        out_pad = 8 if i == n_layers else out_dim
        wt = jnp.pad(wt, ((0, out_pad - out_dim), (0, in_pad - in_dim)))
        bt = jnp.pad(b, (0, out_pad - out_dim)).reshape(out_pad, 1)
        ws.append(wt)
        bs.append(bt)
    return ws, bs


def _kernel(n_steps, substeps, n_layers, block_b,
            y0_ref, ts_ref, meal_ref, tvns_ref, *rest):
    from jax.experimental import pallas as pl

    w_refs = rest[: n_layers + 1]
    b_refs = rest[n_layers + 1 : 2 * (n_layers + 1)]
    param_ref = rest[2 * (n_layers + 1)]
    out_ref = rest[2 * (n_layers + 1) + 1]

    P = {name: param_ref[0, i] for i, name in enumerate(PARAM_ORDER)}
    ws = [w_refs[i][:] for i in range(n_layers + 1)]
    bs = [b_refs[i][:] for i in range(n_layers + 1)]
    inv_s = 1.0 / substeps

    def field(t_row, Y, meal_row, tvns_row):
        # Y: (8, Bb) transposed states; *_row: (1, Bb)
        G = Y[0:1]
        I = Y[1:2]
        Glu = Y[2:3]
        GLP1 = Y[3:4]
        FFA = Y[5:6]

        Pi = 1.0 + P["rho"] * GLP1
        dI = Pi * P["a_GI"] * (G - P["G_b"]) - P["k_I"] * (I - P["I_b"])
        glp1_eff = P["E_max"] * GLP1 / (P["EC_50"] + GLP1)
        dGlu = -glp1_eff * (Glu - P["Glu_b"])
        dGLP1 = P["V_max"] * G / (P["K_m"] + G) - P["k_L"] * GLP1
        dFFA = -P["p_7"] * FFA - P["p_8"] * I * FFA + P["p_9"] * G * FFA
        dG = meal_row - 0.01 * (I - P["I_b"]) + 0.005 * (Glu - P["Glu_b"]) - P["k_GE0"] * G
        zero = jnp.zeros_like(G)
        dY = jnp.concatenate([dG, dI, dGlu, dGLP1, zero, dFFA, zero, zero], axis=0)

        # MLP residual: features (16, Bb) = [t, y(6), glp1, tvns, pad...]
        X = jnp.concatenate(
            [t_row, Y[0:6], GLP1, tvns_row, jnp.zeros((7, Y.shape[1]), Y.dtype)],
            axis=0,
        )
        H = X
        for li in range(n_layers):
            H = jnp.maximum(
                jax.lax.dot_general(
                    ws[li], H, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bs[li],
                0.0,
            )
        R = jax.lax.dot_general(
            ws[n_layers], H, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bs[n_layers]
        return dY + R

    out_ref[0] = y0_ref[:]

    def step(s, Y):
        i = s // substeps
        j = s - i * substeps
        jf = j.astype(jnp.float32)

        ts_l = ts_ref[pl.ds(i, 1)]            # (1, Bb)
        ts_r = ts_ref[pl.ds(i + 1, 1)]
        meal_l = meal_ref[pl.ds(i, 1)]
        meal_r = meal_ref[pl.ds(i + 1, 1)]
        tvns_l = tvns_ref[pl.ds(i, 1)]
        tvns_r = tvns_ref[pl.ds(i + 1, 1)]

        h = (ts_r - ts_l) * inv_s
        t = ts_l + jf * h

        def at(alpha_steps):  # control values at interp weight alpha_steps/substeps
            a = alpha_steps * inv_s
            return (meal_l + (meal_r - meal_l) * a, tvns_l + (tvns_r - tvns_l) * a)

        m0, v0 = at(jf)
        m1, v1 = at(jf + 0.5)
        m2, v2 = at(jf + 1.0)

        k1 = field(t, Y, m0, v0)
        k2 = field(t + 0.5 * h, Y + 0.5 * h * k1, m1, v1)
        k3 = field(t + 0.5 * h, Y + 0.5 * h * k2, m1, v1)
        k4 = field(t + h, Y + h * k3, m2, v2)
        Y_new = Y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        @pl.when(j == substeps - 1)
        def _():
            out_ref[pl.ds(i + 1, 1)] = Y_new[None]

        return Y_new

    jax.lax.fori_loop(0, n_steps, step, y0_ref[:])


@functools.partial(
    jax.jit, static_argnames=("substeps", "n_layers", "interpret", "block_b")
)
def fused_rk4_trajectory(
    y0: jnp.ndarray,                 # (B, 6) states
    ts: jnp.ndarray,                 # (B, T) per-sample time grids (hours)
    meal: jnp.ndarray,               # (B, T) meal signal on the grid
    tvns: jnp.ndarray,               # (B, T) tVNS signal on the grid
    ode_params: Dict[str, jnp.ndarray],
    nn_params: Dict[str, jnp.ndarray],
    substeps: int = 4,
    n_layers: int = 4,
    interpret: bool = False,
    block_b: int = BLOCK_B,
) -> jnp.ndarray:
    """Integrate the hybrid field with fused RK4; returns (B, T, 6).

    Equivalent to `odeint(hybrid_field, ..., solver='rk4', substeps=s)` with
    linear control interpolation — verified against the XLA path in tests.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T = ts.shape
    S = substeps
    n_steps = (T - 1) * S
    dtype = jnp.float32

    Bb = min(block_b, int(np.ceil(B / 128) * 128))
    Bp = int(np.ceil(B / Bb) * Bb)

    def padB(x, axis):
        if Bp == B:
            return x.astype(dtype)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, Bp - B)
        return jnp.pad(x.astype(dtype), pad)

    y0_t = padB(jnp.pad(y0.astype(dtype), ((0, 0), (0, 2))).T, 1)  # (8, Bp)
    ts_t = padB(ts.T, 1)      # (T, Bp) — pad columns get ts==0 => h==0, harmless
    meal_t = padB(meal.T, 1)
    tvns_t = padB(tvns.T, 1)
    # padded lanes carry ts rows of zeros -> h = 0 -> state stays y0 = 0: fine.

    ws, bs = _pack_weights(nn_params, n_layers)
    pvec = jnp.zeros((1, 32), dtype)
    for i, name in enumerate(PARAM_ORDER):
        pvec = pvec.at[0, i].set(jnp.asarray(ode_params[name], dtype))

    grid = (Bp // Bb,)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        bspec((8, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
    ]
    args = [y0_t, ts_t, meal_t, tvns_t]
    for w in ws:
        in_specs.append(full(w))
        args.append(w)
    for b in bs:
        in_specs.append(full(b))
        args.append(b)
    in_specs.append(full(pvec))
    args.append(pvec)

    kernel = functools.partial(_kernel, n_steps, S, n_layers, Bb)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=bspec((T, 8, Bb), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, 8, Bp), dtype),
        interpret=interpret,
    )(*args)

    return jnp.transpose(out[:, :6, :B], (2, 0, 1))  # (B, T, 6)
