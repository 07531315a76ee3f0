"""Pallas TPU kernels: fused full-trajectory RK4 for the hybrid ODE-NN field.

The hot inner loop of the framework is (mechanistic drift + MLP residual)
evaluated 4x per RK4 substep, thousands of substeps per cohort simulation /
training step. These kernels keep the ENTIRE integration resident in VMEM:

  * states live transposed as (8, B_block): batch on the lane axis — at the
    default B_block=2048 every MLP matmul is (H,H)@(H,2048), a fat MXU
    shape, and the elementwise mechanistic math vectorises fully on the VPU.
  * MLP weights (~64-300 KB) are loaded to VMEM once per block and reused
    for all (T-1)*substeps*4 stage evaluations.
  * the time loop runs inside the kernel (`lax.fori_loop`); observation rows
    are written straight to the output block — zero HBM round-trips between
    solver steps.
  * controls (meal/tVNS) are piecewise-linear on the observation grid; at
    substep j, stage c of interval i the interpolation weight is exactly
    (j+c)/substeps, so stage values are two VMEM row reads + one FMA — no
    searchsorted, no host-side precomputation.
  * optional per-sample context features (subject conditioning) ride along
    as a (C, B_block) VMEM block appended to the MLP input.

TRAINING PATH (`fused_rk4_hybrid`): a `jax.custom_vjp` pairs the forward
kernel with a reverse-time discrete-RK4 adjoint kernel (`_bwd_kernel_hand`,
the default). The backward kernel walks the intervals in reverse; per
interval it runs ONE residual-saving forward pass from the saved
observation-grid trajectory (O(T) memory, exactly the checkpointing
granularity of the XLA path's per-interval `jax.checkpoint`,
solvers/fixed.py:61), then back-propagates the cotangent through each RK4
substep with a HAND-WRITTEN transpose: weight transposes hoisted once per
block so every backward matmul is a standard MXU contraction, a
hand-derived mechanistic Jacobian-transpose, and per-lane parameter
cotangent rows (lane-reduced once, outside the kernel). The earlier
jax.vjp-generated backward (`bwd_impl='recompute'|'chained'`, kept for
A/B) spent ~27 of its 37 ms in Mosaic-materialized per-call operand
transposes of the MLP vjp matmuls — the hand adjoint is 2.5x faster
(41.3 -> 16.7 ms full train step at B=8192, T=61, H=64). Weight
cotangents accumulate in VMEM across the whole trajectory and across
batch blocks (sequential TPU grid revisiting one output block), so
gradient traffic to HBM is one weight-sized write total.

State layout parity: rows 0..5 = [G, I, Glu, GLP1, GE, FFA]; rows 6..7 pad.
MLP feature order parity with `dynamics.residual.residual_features`:
[t, y(6), glp1, tvns, context...]. GD is 0 in this path (datasets carry no
gastric-distension signal), so k_GE == k_GE0 exactly as in
`dynamics.ode_core.mechanistic_field`.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: mech-param packing order for the (1, 32) parameter row
PARAM_ORDER = (
    "a_GI", "k_I", "rho", "G_b", "I_b", "E_max", "EC_50", "Glu_b",
    "V_max", "K_m", "k_L", "k_GE0", "IGD_50", "g", "p_7", "p_8", "p_9",
)

BLOCK_B = 2048       # batch lanes per forward kernel instance
BLOCK_B_BWD = 2048   # batch lanes per backward kernel instance. Round-4
                     # sweep (hand-written adjoint, 110 MB scoped VMEM,
                     # B=8192 T=61 H=64): 26.9 / 18.5 / 16.7 ms full fwd+bwd
                     # at Bb=512/1024/2048. The r3 vjp-generated backward
                     # measured 41.3 ms at its best (Bb=1024) — its MLP
                     # transpose chain alone cost ~27 ms (see RESULTS.md
                     # round-4 roofline).


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


#: static-arg spelling -> matmul input dtype for the in-kernel MLP
_MLP_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def _round8(n: int) -> int:
    return int(np.ceil(n / 8) * 8)


def _pack_weights(nn_params: Dict[str, jnp.ndarray], n_layers: int):
    """Transpose + pad the MLP weights for the (features, batch) layout.

    Layer 0's input dim is padded to a multiple of 8 (f32 sublane tile);
    the final layer's output dim is padded to the 8-row state block."""
    ws, bs = [], []
    for i in range(n_layers + 1):
        w = nn_params[f"w{i}"]  # (in, out)
        b = nn_params[f"b{i}"]  # (out,)
        wt = w.T  # (out, in)
        out_dim, in_dim = wt.shape
        in_pad = _round8(in_dim) if i == 0 else in_dim
        out_pad = 8 if i == n_layers else out_dim
        wt = jnp.pad(wt, ((0, out_pad - out_dim), (0, in_pad - in_dim)))
        bt = jnp.pad(b, (0, out_pad - out_dim)).reshape(out_pad, 1)
        ws.append(wt)
        bs.append(bt)
    return ws, bs


def _unpack_weight_grads(dws, dbs, nn_params: Dict[str, jnp.ndarray], n_layers: int):
    """Inverse of `_pack_weights` for cotangents: un-pad + un-transpose."""
    out = {}
    for i in range(n_layers + 1):
        in_dim, out_dim = nn_params[f"w{i}"].shape
        out[f"w{i}"] = dws[i][:out_dim, :in_dim].T
        out[f"b{i}"] = dbs[i][:out_dim, 0]
    return out


def _pack_params(ode_params: Dict[str, jnp.ndarray], dtype=jnp.float32):
    vals = [jnp.asarray(ode_params[name], dtype).reshape(1, 1) for name in PARAM_ORDER]
    pad = jnp.zeros((1, 32 - len(PARAM_ORDER)), dtype)
    return jnp.concatenate(vals + [pad], axis=1)  # (1, 32)


def _hybrid_field_t(t_row, Y, meal_row, tvns_row, ws, bs, pv, ctx, n_layers,
                    ctx_param_idx=(), mlp_dtype=jnp.float32,
                    ctx_param_mode="mul", field_parts="both"):
    """Transposed-layout hybrid field: (8, Bb) states -> (8, Bb) derivative.

    Pure function of VALUES (not refs) so `jax.vjp` can transpose it inside
    the backward kernel. Parity: `dynamics.ode_core.mechanistic_field` with
    GD=0 + `dynamics.residual.residual_apply` (relu).

    ctx_param_idx: static tuple of PARAM_ORDER indices — when non-empty, the
    context rows act per-sample on those mechanistic parameters and the MLP
    sees no context features; the affected P entries become (1, Bb) rows.
    ctx_param_mode selects how:
      * 'mul' — multiplicative deltas, P_i <- P_i * e^{ctx_row}
        (models/hybrid.py context_mode='params');
      * 'abs' — ABSOLUTE per-sample values, P_i <- ctx_row. Linear in the
        context (clean vjp), sign-unconstrained — this is the MCMC-chain
        lane mode (inference/mcmc.py engine='fused': one lane per
        chain x subject, each chain's sampled parameter vector ridden in
        as context rows, identical posterior geometry to the XLA path).

    mlp_dtype: jnp.bfloat16 runs the MLP matmuls as single-pass bf16 MXU
    ops with f32 accumulation (the v5e-native mode; f32 matmuls decompose
    into multiple bf16 passes). Mechanistic math stays f32 on the VPU.

    pv may be either the packed (1, 32) parameter row (forward kernel) or a
    TUPLE of 17 (1, Bb) broadcast rows (backward kernel 'chained' impl):
    row-form params make the vjp's parameter cotangents per-lane elementwise
    accumulations instead of a cross-lane reduction per scalar use."""
    if isinstance(pv, (tuple, list)):
        P = {name: pv[i] for i, name in enumerate(PARAM_ORDER)}
    else:
        P = {name: pv[0, i] for i, name in enumerate(PARAM_ORDER)}
    if ctx_param_idx:
        for row, pidx in enumerate(ctx_param_idx):
            name = PARAM_ORDER[pidx]
            if ctx_param_mode == "abs":
                P[name] = ctx[row: row + 1]  # (1, Bb)
            else:
                P[name] = P[name] * jnp.exp(ctx[row: row + 1])  # (1, Bb)
        ctx = None  # consumed: not an MLP feature
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
    if field_parts == "mech":  # timing probe only
        return dY

    # MLP residual: features (in_pad, Bb) = [t, y(6), glp1, tvns, ctx..., pad]
    in_pad = ws[0].shape[1]
    feats = [t_row, Y[0:6], GLP1, tvns_row]
    n_feat = 9
    if ctx is not None:
        feats.append(ctx)
        n_feat += ctx.shape[0]
    if in_pad > n_feat:
        feats.append(jnp.zeros((in_pad - n_feat, Y.shape[1]), Y.dtype))
    X = jnp.concatenate(feats, axis=0)
    H = X.astype(mlp_dtype)
    for li in range(n_layers):
        H = jnp.maximum(
            jax.lax.dot_general(
                ws[li].astype(mlp_dtype), H, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bs[li],
            0.0,
        ).astype(mlp_dtype)
    R = jax.lax.dot_general(
        ws[n_layers].astype(mlp_dtype), H, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bs[n_layers]
    if field_parts == "mlp":  # timing probe only
        return R
    return dY + R


def _rk4_substep_t(Y, t, h, ctrls, ws, bs, pv, ctx, n_layers, ctx_param_idx=(),
                   mlp_dtype=jnp.float32, ctx_param_mode="mul",
                   field_parts="both"):
    """One transposed-layout RK4 substep. ctrls = ((m0,v0),(m1,v1),(m2,v2))
    are the control rows at stage offsets 0, h/2, h (constants wrt the vjp)."""
    (m0, v0), (m1, v1), (m2, v2) = ctrls
    f = lambda tt, YY, m, v: _hybrid_field_t(tt, YY, m, v, ws, bs, pv, ctx,
                                             n_layers, ctx_param_idx, mlp_dtype,
                                             ctx_param_mode, field_parts)
    k1 = f(t, Y, m0, v0)
    k2 = f(t + 0.5 * h, Y + 0.5 * h * k1, m1, v1)
    k3 = f(t + 0.5 * h, Y + 0.5 * h * k2, m1, v1)
    k4 = f(t + h, Y + h * k3, m2, v2)
    return Y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def _interval_inputs(pl, ts_ref, meal_ref, tvns_ref, i, jf, inv_s):
    """Per-substep (t, h, stage control rows) from the observation-grid rows."""
    ts_l = ts_ref[pl.ds(i, 1)]
    ts_r = ts_ref[pl.ds(i + 1, 1)]
    meal_l = meal_ref[pl.ds(i, 1)]
    meal_r = meal_ref[pl.ds(i + 1, 1)]
    tvns_l = tvns_ref[pl.ds(i, 1)]
    tvns_r = tvns_ref[pl.ds(i + 1, 1)]
    h = (ts_r - ts_l) * inv_s
    t = ts_l + jf * h

    def at(alpha_steps):
        a = alpha_steps * inv_s
        return (meal_l + (meal_r - meal_l) * a, tvns_l + (tvns_r - tvns_l) * a)

    ctrls = (at(jf), at(jf + 0.5), at(jf + 1.0))
    return t, h, ctrls


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(n_steps, substeps, n_layers, has_ctx, ctx_param_idx, mlp_dtype,
                ctx_param_mode,
                y0_ref, ts_ref, meal_ref, tvns_ref, *rest):
    from jax.experimental import pallas as pl

    k = 0
    ctx = None
    if has_ctx:
        ctx = rest[0][:]
        k = 1
    w_refs = rest[k: k + n_layers + 1]
    b_refs = rest[k + n_layers + 1: k + 2 * (n_layers + 1)]
    param_ref = rest[k + 2 * (n_layers + 1)]
    out_ref = rest[k + 2 * (n_layers + 1) + 1]

    pv = param_ref[:]
    ws = [w_refs[i][:] for i in range(n_layers + 1)]
    bs = [b_refs[i][:] for i in range(n_layers + 1)]
    inv_s = 1.0 / substeps

    out_ref[0] = y0_ref[:]

    def step(s, Y):
        i = s // substeps
        j = s - i * substeps
        jf = j.astype(jnp.float32)
        t, h, ctrls = _interval_inputs(pl, ts_ref, meal_ref, tvns_ref, i, jf, inv_s)
        Y_new = _rk4_substep_t(Y, t, h, ctrls, ws, bs, pv, ctx, n_layers,
                               ctx_param_idx, mlp_dtype, ctx_param_mode)

        @pl.when(j == substeps - 1)
        def _():
            out_ref[pl.ds(i + 1, 1)] = Y_new[None]

        return Y_new

    jax.lax.fori_loop(0, n_steps, step, y0_ref[:])


def _prep_inputs(y0, ts, meal, tvns, context, block_b):
    """Transpose + pad to the kernel layout. Returns (args, Bb, Bp, T)."""
    B, T = ts.shape
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
    ctx_t = None if context is None else padB(context.T, 1)  # (C, Bp)
    return (y0_t, ts_t, meal_t, tvns_t, ctx_t), Bb, Bp, T


def _fwd_pallas(y0_t, ts_t, meal_t, tvns_t, ctx_t, ws, bs, pvec,
                substeps, n_layers, interpret, Bb, ctx_param_idx=(),
                mlp_dtype="f32", ctx_param_mode="mul"):
    """Run the forward kernel on pre-packed inputs -> (T, 8, Bp) trajectory."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, Bp = ts_t.shape
    n_steps = (T - 1) * substeps
    grid = (Bp // Bb,)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)

    in_specs = [
        bspec((8, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
    ]
    args = [y0_t, ts_t, meal_t, tvns_t]
    if ctx_t is not None:
        C = ctx_t.shape[0]
        in_specs.append(bspec((C, Bb), lambda i: (0, i)))
        args.append(ctx_t)
    for w in ws:
        in_specs.append(full(w))
        args.append(w)
    for b in bs:
        in_specs.append(full(b))
        args.append(b)
    in_specs.append(full(pvec))
    args.append(pvec)

    kernel = functools.partial(
        _fwd_kernel, n_steps, substeps, n_layers, ctx_t is not None,
        ctx_param_idx, _MLP_DTYPES[mlp_dtype], ctx_param_mode,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=bspec((T, 8, Bb), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, 8, Bp), jnp.float32),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=(
        "substeps", "n_layers", "interpret", "block_b", "context_param_idx",
        "mlp_dtype", "ctx_param_mode",
    ),
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
    context: Optional[jnp.ndarray] = None,  # (B, C) per-sample features
    context_param_idx: tuple = (),
    mlp_dtype: str = "f32",
    ctx_param_mode: str = "mul",
) -> jnp.ndarray:
    """Integrate the hybrid field with fused RK4 (forward only); (B, T, 6).

    Equivalent to `odeint(hybrid_field, ..., solver='rk4', substeps=s)` with
    linear control interpolation — verified against the XLA path in tests.
    For a differentiable version use `fused_rk4_hybrid`.

    `context_param_idx` selects `context_mode='params'` semantics (context
    rows perturb the named mechanistic parameters instead of feeding the MLP)
    — it must be passed for params-conditioned models or the conditioning is
    silently dropped onto zero-padded MLP weight columns (advisor r2 finding).
    """
    (y0_t, ts_t, meal_t, tvns_t, ctx_t), Bb, Bp, T = _prep_inputs(
        y0, ts, meal, tvns, context, block_b
    )
    ws, bs = _pack_weights(nn_params, n_layers)
    pvec = _pack_params(ode_params)
    out = _fwd_pallas(y0_t, ts_t, meal_t, tvns_t, ctx_t, ws, bs, pvec,
                      substeps, n_layers, interpret, Bb,
                      ctx_param_idx=tuple(context_param_idx),
                      mlp_dtype=mlp_dtype, ctx_param_mode=ctx_param_mode)
    B = y0.shape[0]
    return jnp.transpose(out[:, :6, :B], (2, 0, 1))  # (B, T, 6)


# ---------------------------------------------------------------------------
# Backward kernel: reverse-time discrete-RK4 adjoint with per-interval
# recomputation from the saved observation-grid trajectory.
# ---------------------------------------------------------------------------

def _bwd_kernel_hand(substeps, n_layers, has_ctx, n_ctx, ctx_param_idx,
                     mlp_dtype, ctx_param_mode,
                     traj_ref, gbar_ref, ts_ref, meal_ref, tvns_ref, *rest):
    """HAND-WRITTEN reverse-time RK4 adjoint (the default backward).

    Measured motivation (round-4 roofline, B=8192 T=61 H=64, v5e): the
    jax.vjp-generated backward spent ~27 ms of its 37 ms in the MLP's
    transposed matmuls — Mosaic lowers the vjp's ((0,),(0,))-contraction
    dot_generals by materializing an operand transpose per call, 80×/
    interval inside the fori_loop. Here the weight transposes are hoisted
    ONCE per block and every backward matmul is a standard ((1,),(0,)) or
    lane-contraction form. Parameter cotangents accumulate as per-lane
    (1, Bb) rows (one lane reduction per block, outside the kernel);
    subject-context conditioning (feature or param mode) is closed-form
    at the end of the block. Gradient parity with the XLA discrete
    adjoint is asserted to ~1e-6 rel in tests/test_pallas_kernel.py."""
    from jax.experimental import pallas as pl

    k = 0
    ctx = None
    if has_ctx:
        ctx = rest[0][:]
        k = 1
    w_refs = rest[k: k + n_layers + 1]
    b_refs = rest[k + n_layers + 1: k + 2 * (n_layers + 1)]
    param_ref = rest[k + 2 * (n_layers + 1)]
    outs = rest[k + 2 * (n_layers + 1) + 1:]
    ybar0_ref = outs[0]
    dw_refs = outs[1: n_layers + 2]
    db_refs = outs[n_layers + 2: 2 * (n_layers + 1) + 1]
    dpv_ref = outs[2 * (n_layers + 1) + 1]
    dctx_ref = outs[2 * (n_layers + 1) + 2] if has_ctx else None

    pv = param_ref[:]
    ws = [w_refs[i][:] for i in range(n_layers + 1)]
    bs = [b_refs[i][:] for i in range(n_layers + 1)]
    # hoisted once per block: all backward matmuls become standard forms
    wsT = [w.T for w in ws]
    T = traj_ref.shape[0]
    Bb = traj_ref.shape[2]
    inv_s = 1.0 / substeps
    n_par = len(PARAM_ORDER)
    L = n_layers
    in_pad = ws[0].shape[1]
    feature_ctx = has_ctx and not ctx_param_idx

    ones_row = jnp.ones((1, Bb), jnp.float32)
    # effective per-lane parameter rows (context conditioning folded in)
    P_eff = [pv[0, i] * ones_row for i in range(n_par)]
    if ctx_param_idx:
        for row, pidx in enumerate(ctx_param_idx):
            if ctx_param_mode == "abs":
                P_eff[pidx] = ctx[row: row + 1]
            else:
                P_eff[pidx] = P_eff[pidx] * jnp.exp(ctx[row: row + 1])
    idx = {name: i for i, name in enumerate(PARAM_ORDER)}
    Pd = {name: P_eff[i] for i, name in enumerate(PARAM_ORDER)}

    def mlp_fwd(X):
        """Forward MLP on features (in_pad, Bb); returns (R, activations)."""
        acts = []
        H = X.astype(mlp_dtype)
        for li in range(L):
            H = jnp.maximum(
                jax.lax.dot_general(
                    ws[li].astype(mlp_dtype), H, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bs[li],
                0.0,
            )
            acts.append(H)
            H = H.astype(mlp_dtype)
        R = jax.lax.dot_general(
            ws[L].astype(mlp_dtype), H, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bs[L]
        return R, acts

    def mech_fwd(X_rows):
        """Mechanistic drift from the feature block's state rows."""
        G, I, Glu, GLP1, FFA = X_rows
        Pi = 1.0 + Pd["rho"] * GLP1
        dI = Pi * Pd["a_GI"] * (G - Pd["G_b"]) - Pd["k_I"] * (I - Pd["I_b"])
        glp1_eff = Pd["E_max"] * GLP1 / (Pd["EC_50"] + GLP1)
        dGlu = -glp1_eff * (Glu - Pd["Glu_b"])
        dGLP1 = Pd["V_max"] * G / (Pd["K_m"] + G) - Pd["k_L"] * GLP1
        dFFA = -Pd["p_7"] * FFA - Pd["p_8"] * I * FFA + Pd["p_9"] * G * FFA
        return dI, dGlu, dGLP1, dFFA

    def stage_eval(tc, Yc, mc, vc):
        """One field eval; returns (k, saved X, saved MLP activations)."""
        feats = [tc, Yc[0:6], Yc[3:4], vc]
        n_feat = 9
        if feature_ctx:
            feats.append(ctx)
            n_feat += n_ctx
        if in_pad > n_feat:
            feats.append(jnp.zeros((in_pad - n_feat, Bb), jnp.float32))
        X = jnp.concatenate(feats, axis=0)
        G, I, Glu, GLP1, FFA = Yc[0:1], Yc[1:2], Yc[2:3], Yc[3:4], Yc[5:6]
        dI, dGlu, dGLP1, dFFA = mech_fwd((G, I, Glu, GLP1, FFA))
        dG = (mc - 0.01 * (I - Pd["I_b"]) + 0.005 * (Glu - Pd["Glu_b"])
              - Pd["k_GE0"] * G)
        zero = jnp.zeros_like(G)
        dY = jnp.concatenate([dG, dI, dGlu, dGLP1, zero, dFFA, zero, zero], 0)
        R, acts = mlp_fwd(X)
        return dY + R, X, acts

    def stage_bwd(gd, X, acts, accs):
        """Transpose of stage_eval: cotangent gd (8, Bb) of the field output
        -> cotangent of the stage state (8, Bb); accumulates weight / bias /
        per-lane param / ctx cotangents into accs."""
        dws, dbs, dprows, dctx = accs
        # ---- MLP transpose: standard-contraction matmuls only ----
        gL = gd
        new_dws = list(dws)
        new_dbs = list(dbs)
        inp_L = acts[L - 1] if L > 0 else X
        new_dws[L] = dws[L] + jax.lax.dot_general(
            gL.astype(mlp_dtype), inp_L.astype(mlp_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        new_dbs[L] = dbs[L] + jnp.sum(gL, axis=1, keepdims=True)
        u = jax.lax.dot_general(
            wsT[L].astype(mlp_dtype), gL.astype(mlp_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for l in range(L - 1, -1, -1):
            gz = u * (acts[l] > 0)
            inp = acts[l - 1] if l > 0 else X
            new_dws[l] = dws[l] + jax.lax.dot_general(
                gz.astype(mlp_dtype), inp.astype(mlp_dtype),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            new_dbs[l] = dbs[l] + jnp.sum(gz, axis=1, keepdims=True)
            u = jax.lax.dot_general(
                wsT[l].astype(mlp_dtype), gz.astype(mlp_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dX = u  # (in_pad, Bb)
        if feature_ctx:
            dctx = dctx + dX[9: 9 + n_ctx]

        # ---- mechanistic transpose (hand-derived Jacobian rows) ----
        G, I, Glu = X[1:2], X[2:3], X[3:4]
        GLP1, FFA = X[4:5], X[6:7]
        gG, gI, gGlu = gd[0:1], gd[1:2], gd[2:3]
        gGLP, gFFA = gd[3:4], gd[5:6]
        Pi = 1.0 + Pd["rho"] * GLP1
        Gd = G - Pd["G_b"]
        Glud = Glu - Pd["Glu_b"]
        e_den = Pd["EC_50"] + GLP1
        glp1_eff = Pd["E_max"] * GLP1 / e_den
        km_den = Pd["K_m"] + G

        mech_G = (gI * (Pi * Pd["a_GI"]) + gGLP * (Pd["V_max"] * Pd["K_m"] / (km_den * km_den))
                  + gFFA * (Pd["p_9"] * FFA) - gG * Pd["k_GE0"])
        mech_I = -gI * Pd["k_I"] - gFFA * (Pd["p_8"] * FFA) - 0.01 * gG
        mech_Glu = -gGlu * glp1_eff + 0.005 * gG
        mech_GLP = (gI * (Pd["rho"] * Pd["a_GI"] * Gd)
                    - gGlu * (Glud * Pd["E_max"] * Pd["EC_50"] / (e_den * e_den))
                    - gGLP * Pd["k_L"])
        mech_FFA = gFFA * (-Pd["p_7"] - Pd["p_8"] * I + Pd["p_9"] * G)

        dY = jnp.concatenate([
            dX[1:2] + mech_G,
            dX[2:3] + mech_I,
            dX[3:4] + mech_Glu,
            dX[4:5] + dX[7:8] + mech_GLP,
            dX[5:6],
            dX[6:7] + mech_FFA,
            jnp.zeros((2, Bb), jnp.float32),
        ], axis=0)

        # ---- per-lane parameter cotangent rows (wrt EFFECTIVE params) ----
        p = list(dprows)
        p[idx["a_GI"]] = p[idx["a_GI"]] + gI * Pi * Gd
        p[idx["k_I"]] = p[idx["k_I"]] - gI * (I - Pd["I_b"])
        p[idx["rho"]] = p[idx["rho"]] + gI * Pd["a_GI"] * Gd * GLP1
        p[idx["G_b"]] = p[idx["G_b"]] - gI * Pi * Pd["a_GI"]
        p[idx["I_b"]] = p[idx["I_b"]] + gI * Pd["k_I"] + 0.01 * gG
        p[idx["E_max"]] = p[idx["E_max"]] - gGlu * Glud * GLP1 / e_den
        p[idx["EC_50"]] = (p[idx["EC_50"]]
                           + gGlu * Glud * Pd["E_max"] * GLP1 / (e_den * e_den))
        p[idx["Glu_b"]] = p[idx["Glu_b"]] + gGlu * glp1_eff - 0.005 * gG
        p[idx["V_max"]] = p[idx["V_max"]] + gGLP * G / km_den
        p[idx["K_m"]] = (p[idx["K_m"]]
                         - gGLP * Pd["V_max"] * G / (km_den * km_den))
        p[idx["k_L"]] = p[idx["k_L"]] - gGLP * GLP1
        p[idx["k_GE0"]] = p[idx["k_GE0"]] - gG * G
        p[idx["p_7"]] = p[idx["p_7"]] - gFFA * FFA
        p[idx["p_8"]] = p[idx["p_8"]] - gFFA * I * FFA
        p[idx["p_9"]] = p[idx["p_9"]] + gFFA * G * FFA

        return dY, (tuple(new_dws), tuple(new_dbs), tuple(p), dctx)

    def interval(kk, carry):
        ybar, dws, dbs, dprows, dctx = carry
        i = T - 2 - kk  # reverse interval walk

        # ---- single forward pass, saving stage features + activations ----
        Y = traj_ref[pl.ds(i, 1)][0]
        saved = []  # per substep: (h, [(X, acts)] x 4)
        for j in range(substeps):
            t, h, ctrls = _interval_inputs(
                pl, ts_ref, meal_ref, tvns_ref, i, jnp.float32(j), inv_s)
            (m0, v0), (m1, v1), (m2, v2) = ctrls
            k1, X1, a1 = stage_eval(t, Y, m0, v0)
            k2, X2, a2 = stage_eval(t + 0.5 * h, Y + 0.5 * h * k1, m1, v1)
            k3, X3, a3 = stage_eval(t + 0.5 * h, Y + 0.5 * h * k2, m1, v1)
            k4, X4, a4 = stage_eval(t + h, Y + h * k3, m2, v2)
            Y = Y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            saved.append((h, ((X1, a1), (X2, a2), (X3, a3), (X4, a4))))

        # ---- reverse sweep through the substeps' stages ----
        for j in range(substeps - 1, -1, -1):
            h, stages = saved[j]
            accs = (dws, dbs, dprows, dctx)
            go = ybar
            dk1 = (h / 6.0) * go
            dk2 = (h / 3.0) * go
            dk3 = (h / 3.0) * go
            dk4 = (h / 6.0) * go
            dY4, accs = stage_bwd(dk4, *stages[3], accs)
            dk3 = dk3 + h * dY4
            dY3, accs = stage_bwd(dk3, *stages[2], accs)
            dk2 = dk2 + 0.5 * h * dY3
            dY2, accs = stage_bwd(dk2, *stages[1], accs)
            dk1 = dk1 + 0.5 * h * dY2
            dY1, accs = stage_bwd(dk1, *stages[0], accs)
            ybar = go + dY1 + dY2 + dY3 + dY4
            dws, dbs, dprows, dctx = accs

        ybar = ybar + gbar_ref[pl.ds(i, 1)][0]
        return ybar, dws, dbs, dprows, dctx

    init = (
        gbar_ref[pl.ds(T - 1, 1)][0],
        tuple(jnp.zeros_like(w) for w in ws),
        tuple(jnp.zeros_like(b) for b in bs),
        tuple(jnp.zeros((1, Bb), jnp.float32) for _ in range(n_par)),
        jnp.zeros_like(ctx) if has_ctx else jnp.zeros((1, 1), jnp.float32),
    )
    ybar, dws, dbs, dprows, dctx = jax.lax.fori_loop(0, T - 1, interval, init)

    # ---- context conditioning: closed-form fold of the effective-param
    # cotangents (P_eff is constant over the trajectory, so the per-use
    # chain factors commute with the accumulation) ----
    dprows = list(dprows)
    if ctx_param_idx:
        dctx_rows = []
        for row, pidx in enumerate(ctx_param_idx):
            if ctx_param_mode == "abs":
                dctx_rows.append(dprows[pidx])
                dprows[pidx] = jnp.zeros((1, Bb), jnp.float32)
            else:  # 'mul': P_eff = base * e^c
                dctx_rows.append(dprows[pidx] * P_eff[pidx])
                dprows[pidx] = dprows[pidx] * jnp.exp(ctx[row: row + 1])
        dctx = jnp.concatenate(dctx_rows, axis=0)

    ybar0_ref[:] = ybar
    if has_ctx:
        dctx_ref[:] = dctx
    dpv_ref[:] = jnp.concatenate(
        dprows + [jnp.zeros((32 - n_par, Bb), jnp.float32)], axis=0)

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for r, g in zip(dw_refs, dws):
            r[:] = g
        for r, g in zip(db_refs, dbs):
            r[:] = g

    @pl.when(jnp.logical_not(is_first))
    def _():
        for r, g in zip(dw_refs, dws):
            r[:] = r[:] + g
        for r, g in zip(db_refs, dbs):
            r[:] = r[:] + g

def _bwd_kernel(substeps, n_layers, has_ctx, n_ctx, ctx_param_idx, mlp_dtype,
                ctx_param_mode, bwd_impl,
                traj_ref, gbar_ref, ts_ref, meal_ref, tvns_ref, *rest):
    from jax.experimental import pallas as pl

    k = 0
    ctx = None
    if has_ctx:
        ctx = rest[0][:]
        k = 1
    w_refs = rest[k: k + n_layers + 1]
    b_refs = rest[k + n_layers + 1: k + 2 * (n_layers + 1)]
    param_ref = rest[k + 2 * (n_layers + 1)]
    outs = rest[k + 2 * (n_layers + 1) + 1:]
    ybar0_ref = outs[0]
    dw_refs = outs[1: n_layers + 2]
    db_refs = outs[n_layers + 2: 2 * (n_layers + 1) + 1]
    dpv_ref = outs[2 * (n_layers + 1) + 1]
    dctx_ref = outs[2 * (n_layers + 1) + 2] if has_ctx else None

    pv = param_ref[:]
    ws = tuple(w_refs[i][:] for i in range(n_layers + 1))
    bs = tuple(b_refs[i][:] for i in range(n_layers + 1))
    T = traj_ref.shape[0]
    Bb = traj_ref.shape[2]
    inv_s = 1.0 / substeps
    n_par = len(PARAM_ORDER)

    field_parts = "both"
    if bwd_impl in ("probe_y_mlp", "probe_y_mech"):
        field_parts = bwd_impl.rsplit("_", 1)[-1]

    def substep_fn(Y, ws_, bs_, pv_, ctx_, t, h, ctrls):
        return _rk4_substep_t(Y, t, h, ctrls, list(ws_), list(bs_), pv_,
                              ctx_, n_layers, ctx_param_idx, mlp_dtype,
                              ctx_param_mode, field_parts)

    zero_ws = tuple(jnp.zeros_like(w) for w in ws)
    zero_bs = tuple(jnp.zeros_like(b) for b in bs)
    zero_ctx = jnp.zeros_like(ctx) if has_ctx else jnp.zeros((1, 1), jnp.float32)

    if bwd_impl.startswith("chained") or bwd_impl.startswith("probe"):
        # Single forward pass per interval: jax.vjp's primal output advances
        # the state, so the residual-saving forward IS the recompute (the
        # 'recompute' impl runs every substep's forward twice). Parameters
        # ride as 17 broadcast (1, Bb) rows so their cotangents accumulate
        # per-lane elementwise; ONE cross-lane reduction per block at the
        # end replaces a reduction per scalar use per stage eval. Costs
        # `substeps` live vjp-residual sets of VMEM instead of one.
        #
        # probe_y / probe_yw are TIMING DECOMPOSITION variants (wrong
        # grads by construction — zero dW/dpv resp. dpv): they measure the
        # adjoint chain wrt Y alone / Y+weights for the roofline analysis.
        probe = bwd_impl.startswith("probe")
        diff_w = bwd_impl not in ("probe_y", "probe_y_mlp", "probe_y_mech",
                                  "probe_fwd1", "probe_fwd2")
        diff_p = not probe
        fwd_only = bwd_impl in ("probe_fwd1", "probe_fwd2")
        n_fwd_passes = 2 if bwd_impl == "probe_fwd2" else 1
        ones_row = jnp.ones((1, Bb), jnp.float32)
        pv_rows = tuple(pv[0, i] * ones_row for i in range(n_par))

        def interval(kk, carry):
            ybar, dws, dbs, dprows, dctx = carry
            i = T - 2 - kk  # walk intervals in reverse

            Y = traj_ref[pl.ds(i, 1)][0]  # (8, Bb) saved left-edge state

            if fwd_only:
                # TIMING PROBES (wrong grads): n forward passes per interval
                # in the backward-kernel structure, no vjp — isolates the
                # transpose tax from the scaffolding + forward cost.
                acc = Y
                for _pass in range(n_fwd_passes):
                    Yp = Y + 1e-30 * acc  # serialize the passes
                    for j in range(substeps):
                        t, h, ctrls = _interval_inputs(
                            pl, ts_ref, meal_ref, tvns_ref, i,
                            jnp.float32(j), inv_s)
                        Yp = substep_fn(Yp, ws, bs, pv_rows,
                                        ctx if has_ctx else None, t, h, ctrls)
                    acc = Yp
                ybar = ybar + 1e-30 * acc + gbar_ref[pl.ds(i, 1)][0]
                return ybar, dws, dbs, dprows, dctx

            vjps = []
            for j in range(substeps):
                t, h, ctrls = _interval_inputs(
                    pl, ts_ref, meal_ref, tvns_ref, i, jnp.float32(j), inv_s
                )
                if has_ctx and diff_p:
                    Y, vjp = jax.vjp(
                        lambda Y_, w_, b_, p_, c_, t=t, h=h, ctrls=ctrls:
                            substep_fn(Y_, w_, b_, p_, c_, t, h, ctrls),
                        Y, ws, bs, pv_rows, ctx,
                    )
                elif diff_p:
                    Y, vjp = jax.vjp(
                        lambda Y_, w_, b_, p_, t=t, h=h, ctrls=ctrls:
                            substep_fn(Y_, w_, b_, p_, None, t, h, ctrls),
                        Y, ws, bs, pv_rows,
                    )
                elif diff_w:  # probe_yw
                    Y, vjp = jax.vjp(
                        lambda Y_, w_, b_, t=t, h=h, ctrls=ctrls:
                            substep_fn(Y_, w_, b_, pv_rows,
                                       ctx if has_ctx else None, t, h, ctrls),
                        Y, ws, bs,
                    )
                else:  # probe_y
                    Y, vjp = jax.vjp(
                        lambda Y_, t=t, h=h, ctrls=ctrls:
                            substep_fn(Y_, ws, bs, pv_rows,
                                       ctx if has_ctx else None, t, h, ctrls),
                        Y,
                    )
                vjps.append(vjp)

            for j in reversed(range(substeps)):
                if has_ctx and diff_p:
                    ybar, dws_j, dbs_j, dpr_j, dctx_j = vjps[j](ybar)
                    dctx = dctx + dctx_j
                elif diff_p:
                    ybar, dws_j, dbs_j, dpr_j = vjps[j](ybar)
                elif diff_w:
                    ybar, dws_j, dbs_j = vjps[j](ybar)
                    dpr_j = None
                else:
                    (ybar,) = vjps[j](ybar)
                    dws_j = dbs_j = dpr_j = None
                if dws_j is not None:
                    dws = tuple(a + g for a, g in zip(dws, dws_j))
                    dbs = tuple(a + g for a, g in zip(dbs, dbs_j))
                if dpr_j is not None:
                    dprows = tuple(a + g for a, g in zip(dprows, dpr_j))

            # cotangent injected at observation point i
            ybar = ybar + gbar_ref[pl.ds(i, 1)][0]
            return ybar, dws, dbs, dprows, dctx

        init = (
            gbar_ref[pl.ds(T - 1, 1)][0],
            zero_ws, zero_bs,
            tuple(jnp.zeros((1, Bb), jnp.float32) for _ in range(n_par)),
            zero_ctx,
        )
        ybar, dws, dbs, dprows, dctx = jax.lax.fori_loop(0, T - 1, interval, init)
        # per-lane parameter cotangents leave the kernel as a (32, Bb) block
        # per grid step (blocks own disjoint lanes — no cross-block
        # accumulation); the lane reduction happens in XLA outside (1 MB of
        # HBM traffic, negligible). An in-kernel 17-scalar concatenate
        # crashes the Mosaic backend (vector<1x1xf32> concat layouts).
        dpv = jnp.concatenate(
            list(dprows) + [jnp.zeros((32 - n_par, Bb), jnp.float32)], axis=0)
    else:
        def interval(kk, carry):
            ybar, dws, dbs, dpv, dctx = carry
            i = T - 2 - kk  # walk intervals in reverse

            # --- recompute the substep states from the saved left-edge state ---
            y_states = [traj_ref[pl.ds(i, 1)][0]]  # (8, Bb)
            step_inputs = []
            for j in range(substeps):
                t, h, ctrls = _interval_inputs(
                    pl, ts_ref, meal_ref, tvns_ref, i, jnp.float32(j), inv_s
                )
                step_inputs.append((t, h, ctrls))
                y_states.append(
                    substep_fn(y_states[j], ws, bs, pv, ctx, t, h, ctrls)
                )

            # --- reverse sweep: vjp of each substep, stage recomputation inside ---
            for j in reversed(range(substeps)):
                t, h, ctrls = step_inputs[j]
                if has_ctx:
                    _, vjp = jax.vjp(
                        lambda Y, w_, b_, p_, c_: substep_fn(Y, w_, b_, p_, c_, t, h, ctrls),
                        y_states[j], ws, bs, pv, ctx,
                    )
                    ybar, dws_j, dbs_j, dpv_j, dctx_j = vjp(ybar)
                    dctx = dctx + dctx_j
                else:
                    _, vjp = jax.vjp(
                        lambda Y, w_, b_, p_: substep_fn(Y, w_, b_, p_, None, t, h, ctrls),
                        y_states[j], ws, bs, pv,
                    )
                    ybar, dws_j, dbs_j, dpv_j = vjp(ybar)
                dws = tuple(a + g for a, g in zip(dws, dws_j))
                dbs = tuple(a + g for a, g in zip(dbs, dbs_j))
                dpv = dpv + dpv_j

            # cotangent injected at observation point i
            ybar = ybar + gbar_ref[pl.ds(i, 1)][0]
            return ybar, dws, dbs, dpv, dctx

        init = (
            gbar_ref[pl.ds(T - 1, 1)][0],
            zero_ws, zero_bs, jnp.zeros_like(pv), zero_ctx,
        )
        ybar, dws, dbs, dpv, dctx = jax.lax.fori_loop(0, T - 1, interval, init)

    ybar0_ref[:] = ybar
    if has_ctx:
        dctx_ref[:] = dctx

    # weight cotangents accumulate ACROSS batch blocks: the TPU grid is
    # sequential and every block maps to the same output tile, which stays
    # resident in VMEM between iterations. ('chained' param cotangents are
    # per-lane (32, Bb) blocks on disjoint lanes — written directly.)
    lanewise_dpv = bwd_impl != "recompute"
    if lanewise_dpv:
        dpv_ref[:] = dpv

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for r, g in zip(dw_refs, dws):
            r[:] = g
        for r, g in zip(db_refs, dbs):
            r[:] = g
        if not lanewise_dpv:
            dpv_ref[:] = dpv

    @pl.when(jnp.logical_not(is_first))
    def _():
        for r, g in zip(dw_refs, dws):
            r[:] = r[:] + g
        for r, g in zip(db_refs, dbs):
            r[:] = r[:] + g
        if not lanewise_dpv:
            dpv_ref[:] = dpv_ref[:] + dpv


def _bwd_pallas(traj, gbar_t, ts_t, meal_t, tvns_t, ctx_t, ws, bs, pvec,
                substeps, n_layers, interpret, Bb, ctx_param_idx=(),
                mlp_dtype="f32", ctx_param_mode="mul", bwd_impl="hand"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, _, Bp = traj.shape
    grid = (Bp // Bb,)
    bspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)

    in_specs = [
        bspec((T, 8, Bb), lambda i: (0, 0, i)),
        bspec((T, 8, Bb), lambda i: (0, 0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
        bspec((T, Bb), lambda i: (0, i)),
    ]
    args = [traj, gbar_t, ts_t, meal_t, tvns_t]
    has_ctx = ctx_t is not None
    if has_ctx:
        C = ctx_t.shape[0]
        in_specs.append(bspec((C, Bb), lambda i: (0, i)))
        args.append(ctx_t)
    for w in ws:
        in_specs.append(full(w))
        args.append(w)
    for b in bs:
        in_specs.append(full(b))
        args.append(b)
    in_specs.append(full(pvec))
    args.append(pvec)

    out_shapes = [jax.ShapeDtypeStruct((8, Bp), jnp.float32)]
    out_specs = [bspec((8, Bb), lambda i: (0, i))]
    for w in ws:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(full(w))
    for b in bs:
        out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        out_specs.append(full(b))
    if bwd_impl != "recompute":
        # per-lane param cotangents: (32, Bb) block per grid step
        out_shapes.append(jax.ShapeDtypeStruct((32, Bp), jnp.float32))
        out_specs.append(bspec((32, Bb), lambda i: (0, i)))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((1, 32), jnp.float32))
        out_specs.append(full(pvec))
    if has_ctx:
        C = ctx_t.shape[0]
        out_shapes.append(jax.ShapeDtypeStruct((C, Bp), jnp.float32))
        out_specs.append(bspec((C, Bb), lambda i: (0, i)))

    if bwd_impl == "hand":
        kernel = functools.partial(
            _bwd_kernel_hand, substeps, n_layers, has_ctx,
            ctx_t.shape[0] if has_ctx else 0, ctx_param_idx,
            _MLP_DTYPES[mlp_dtype], ctx_param_mode,
        )
    else:
        kernel = functools.partial(
            _bwd_kernel, substeps, n_layers, has_ctx,
            ctx_t.shape[0] if has_ctx else 0, ctx_param_idx,
            _MLP_DTYPES[mlp_dtype], ctx_param_mode, bwd_impl,
        )
    # Raise Mosaic's scoped-VMEM allowance above the 16 MB default: v5e has
    # 128 MB of VMEM per core, and the backward residuals (4 live RK stages
    # of MLP activations per substep) are what capped the lane block at 256.
    # 96 MB admits Bb=1024 (measured: 80.2 -> 41.2 ms full fwd+bwd at
    # B=8192, T=61 — see RESULTS.md roofline section).
    import os

    vmem_mb = int(os.environ.get("HYBRID_ODE_BWD_VMEM_MB", "110"))
    params = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else params,
    )(*args)


# ---------------------------------------------------------------------------
# Differentiable public API
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_fused_rk4(substeps: int, n_layers: int, interpret: bool,
                    block_b: int, block_b_bwd: int, ctx_param_idx: tuple = (),
                    mlp_dtype: str = "f32", ctx_param_mode: str = "mul",
                    bwd_impl: str = "hand"):
    """Build (and cache) the custom-VJP fused trajectory function for one
    static configuration."""

    def fwd_impl(y0, ts, meal, tvns, context, ode_params, nn_params):
        (y0_t, ts_t, meal_t, tvns_t, ctx_t), Bb, Bp, T = _prep_inputs(
            y0, ts, meal, tvns, context, block_b
        )
        ws, bs = _pack_weights(nn_params, n_layers)
        pvec = _pack_params(ode_params)
        traj = _fwd_pallas(y0_t, ts_t, meal_t, tvns_t, ctx_t, ws, bs, pvec,
                           substeps, n_layers, interpret, Bb, ctx_param_idx,
                           mlp_dtype, ctx_param_mode)
        return traj

    @jax.custom_vjp
    def fused(y0, ts, meal, tvns, context, ode_params, nn_params):
        traj = fwd_impl(y0, ts, meal, tvns, context, ode_params, nn_params)
        B = y0.shape[0]
        return jnp.transpose(traj[:, :6, :B], (2, 0, 1))

    def fused_fwd(y0, ts, meal, tvns, context, ode_params, nn_params):
        traj = fwd_impl(y0, ts, meal, tvns, context, ode_params, nn_params)
        B = y0.shape[0]
        out = jnp.transpose(traj[:, :6, :B], (2, 0, 1))
        return out, (traj, ts, meal, tvns, context, ode_params, nn_params)

    def fused_bwd(res, g):
        traj, ts, meal, tvns, context, ode_params, nn_params = res
        B, T = ts.shape
        _, _, Bp = traj.shape
        Bb = min(block_b_bwd, int(np.ceil(B / 128) * 128))
        # Bp from the forward packing may not be a multiple of the (smaller)
        # backward block; repad if needed.
        Bp_b = int(np.ceil(Bp / Bb) * Bb)
        if Bp_b != Bp:
            traj = jnp.pad(traj, ((0, 0), (0, 0), (0, Bp_b - Bp)))

        def padB(x, axis):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, Bp_b - x.shape[axis])
            return jnp.pad(x.astype(jnp.float32), pad)

        # cotangent in kernel layout: (T, 8, Bp) with pad rows/lanes zeroed
        gbar_t = padB(jnp.pad(jnp.transpose(g.astype(jnp.float32), (1, 2, 0)),
                              ((0, 0), (0, 2), (0, 0))), 2)
        ts_t = padB(ts.T, 1)
        meal_t = padB(meal.T, 1)
        tvns_t = padB(tvns.T, 1)
        ctx_t = None if context is None else padB(context.T, 1)

        ws, bs = _pack_weights(nn_params, n_layers)
        pvec = _pack_params(ode_params)
        outs = _bwd_pallas(traj, gbar_t, ts_t, meal_t, tvns_t, ctx_t,
                           ws, bs, pvec, substeps, n_layers, interpret, Bb,
                           ctx_param_idx, mlp_dtype, ctx_param_mode, bwd_impl)
        ybar0 = outs[0]
        dws = outs[1: n_layers + 2]
        dbs = outs[n_layers + 2: 2 * (n_layers + 1) + 1]
        dpv = outs[2 * (n_layers + 1) + 1]
        if bwd_impl != "recompute":
            dpv = jnp.sum(dpv, axis=1)[None, :]  # (32, Bp) lanes -> (1, 32)
        d_nn = _unpack_weight_grads(dws, dbs, nn_params, n_layers)
        d_ode = {
            name: dpv[0, i].astype(ode_params[name].dtype).reshape(
                ode_params[name].shape)
            for i, name in enumerate(PARAM_ORDER)
        }
        d_y0 = ybar0[:6, :B].T.astype(g.dtype)
        d_ctx = None
        if context is not None:
            C = context.shape[1]
            d_ctx = outs[-1][:C, :B].T.astype(g.dtype)
        return (d_y0, jnp.zeros_like(ts), jnp.zeros_like(meal),
                jnp.zeros_like(tvns), d_ctx, d_ode, d_nn)

    fused.defvjp(fused_fwd, fused_bwd)
    return jax.jit(fused)


def fused_rk4_hybrid(
    y0: jnp.ndarray,                 # (B, 6)
    ts: jnp.ndarray,                 # (B, T)
    meal: jnp.ndarray,               # (B, T)
    tvns: jnp.ndarray,               # (B, T)
    ode_params: Dict[str, jnp.ndarray],
    nn_params: Dict[str, jnp.ndarray],
    substeps: int = 4,
    n_layers: int = 4,
    interpret: bool = False,
    block_b: int = BLOCK_B,
    block_b_bwd: int = BLOCK_B_BWD,
    context: Optional[jnp.ndarray] = None,  # (B, C)
    context_param_idx: tuple = (),
    mlp_dtype: str = "f32",
    ctx_param_mode: str = "mul",
    bwd_impl: str = "hand",
) -> jnp.ndarray:
    """Differentiable fused-RK4 trajectory: custom-VJP Pallas forward AND
    backward. Gradients flow to y0, context, ode_params and nn_params
    (ts/meal/tvns receive symbolic zeros — they are data, not parameters).

    Matches `odeint(..., solver='rk4', mode='scan')` gradients to float32
    accuracy (tests/test_pallas_kernel.py::test_fused_rk4_gradients).

    mlp_dtype='bf16' (opt-in) runs the in-kernel MLP matmuls — forward AND
    the vjp's transposed matmuls — as single-pass bf16 MXU ops with f32
    accumulation; everything else (states, mechanistic drift, RK combine,
    cotangent accumulators) stays f32. DEVIATION from exact XLA-path
    parity by design: trajectories/grads agree to ~bf16 resolution.

    bwd_impl: 'chained' (default) runs ONE residual-saving forward pass per
    interval (the vjp primal advances the state) with per-lane parameter
    cotangent rows; 'recompute' is the r3 kernel (forward runs twice per
    interval, parameter grads lane-reduce per substep) kept for A/B."""
    fn = _make_fused_rk4(substeps, n_layers, interpret, block_b, block_b_bwd,
                         tuple(context_param_idx), mlp_dtype, ctx_param_mode,
                         bwd_impl)
    return fn(y0, ts, meal, tvns, context, ode_params, nn_params)
