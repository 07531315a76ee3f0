"""Model-based closed-loop protocol simulation and dosing optimization.

The reference positions its framework for "prospective prototyping for
future downstream tasks like clinical dosing or therapeutic guidance"
(/root/reference/manuscript.tex:52) but ships no protocol machinery at
all. This module makes that capability real AND differentiable: the
trained hybrid model rolls out an ICU sliding-scale insulin protocol in
closed loop (hourly nurse checks recompute the infusion rate from the
model's own predicted glucose), and the protocol parameters (gain,
target) are optimized by gradient descent THROUGH the rollout — a
chunked `lax.scan` of ODE solves, fully jittable on TPU.

The protocol law mirrors `data/mimic.py generate_icu_cohort` exactly
(rate = clip(gain * (G - target), 0, cap), recomputed every
`check_every` grid steps), so an optimized (gain, target) can be
validated against ground truth by re-simulating the SAME patients under
the new protocol (`protocol_gain`/`protocol_target` generator args,
paired by rng-consumption). DEVIATION from the generator: the model
rollout reads the model's noiseless predicted glucose at nurse checks
(no 3% meter noise) — policy design is deterministic; validation on the
simulator includes the noise.

Causal validity requires the model's insulin routing to be causal:
use checkpoints trained with `HybridConfig.exog_insulin='mech'` (the
NN-feature routing is measurably confounded under the closed loop —
RESULTS.md intervention study).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hybrid_ode_tpu.dynamics.controls import Controls
from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    batched_forward,
    controls_from_batch,
    with_context,
)


def closed_loop_rollout(
    params: Mapping[str, Any],
    batch: Mapping[str, jnp.ndarray],
    config: HybridConfig,
    gain: jnp.ndarray,
    target: jnp.ndarray,
    norm: Tuple[jnp.ndarray, jnp.ndarray],
    check_every: int = 12,
    rate_cap: float = 7000.0,
    rate_scale: float = 2000.0,
    basal: jnp.ndarray = 0.0,
    glucose_offset: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Roll the hybrid model forward under a closed-loop sliding scale.

    Args:
        params: hybrid parameter pytree (single model).
        batch: standard dataset batch over the DESIGN horizon — one window
            per patient: 'initial_state' (B, 6) z-space, 'time_points'
            (B, T) hours on a uniform grid, 'external_inputs' with the
            known 'meal' (carb) schedule (B, T). Any 'tVNS' in the batch is
            IGNORED — the protocol under design generates the insulin rate.
        config: model config (context conditioning handled as in eval).
        gain: protocol gain, pmol/h per mmol/L — scalar or (B,) per-patient.
        target: protocol glucose target, mmol/L — scalar or (B,).
        norm: (mean, std) physical normalization stats of the TRAINING
            cohort (z -> mmol/L for the protocol law).
        check_every: grid steps between nurse checks (12 = hourly on the
            ICU generator's 5-min grid). T-1 must be divisible by it.
        rate_cap: max infusion rate, pmol/h (generator parity: 7000).
        rate_scale: export scale of the tVNS channel (generator parity:
            rate/2000 is O(1), data/mimic.py:394).
        basal: background infusion, pmol/h — scalar or (B,). Continues
            below target (generator parity: `protocol_basal`,
            data/mimic.py); basal-heavy protocols carry real hypo risk.
        glucose_offset: optional (B, T) mmol/L additive correction applied
            to the model's predicted glucose BEFORE the protocol law reads
            it (typically `true_factual - model_factual` on the design
            windows — observational data only). Deployment fidelity: a real
            sliding scale reacts to MEASURED glucose, not to the model's
            belief, so the counterfactual dosing law should see
            bias-anchored glucose. Without it, any level bias in the model
            is AMPLIFIED by the loop (model predicts low -> law doses more
            -> predicts lower; measured round 5: gain-3600 arms predicted
            hypo-dangerous on the dysglycemic cohort while true outcomes
            improved, inverting the protocol ranking to Spearman -0.18).

    Returns:
        dict with 'trajectory' (B, T, 6) z-space, 'glucose' (B, T) mmol/L,
        'rates' (B, C) pmol/h (C = number of nurse-check intervals),
        'insulin_total' (B,) pmol (cap-clipped rate integrated over time).
    """
    y0 = jnp.asarray(batch["initial_state"])
    ts = jnp.asarray(batch["time_points"])
    B, T = ts.shape
    C = (T - 1) // check_every
    if C * check_every != T - 1:
        raise ValueError(
            f"T-1={T - 1} grid intervals not divisible by check_every={check_every}")
    meal = batch.get("external_inputs", {}).get(
        "meal", jnp.zeros((B, T), y0.dtype))

    mean0 = jnp.asarray(norm[0][0], y0.dtype)
    std0 = jnp.asarray(norm[1][0], y0.dtype)

    # subject context: encoded once from the batch's observation window
    # (patient identity does not change with the protocol under design)
    ctx = None
    if config.context_points > 0:
        ctrl = with_context(params, batch, controls_from_batch(batch), config)
        ctx = ctrl.signals["context"]  # (B, d)

    def chunk_slices(x):  # (B, T) -> (C, B, check_every+1), chunks share edges
        # numpy index: static gather even under jit (a jnp.arange here would
        # trace, and numpy batch arrays can't be indexed by tracers)
        idx = (np.arange(C)[:, None] * check_every
               + np.arange(check_every + 1)[None, :])  # (C, ce+1)
        return jnp.moveaxis(jnp.asarray(x)[:, idx], 1, 0)

    ts_c = chunk_slices(ts)
    meal_c = chunk_slices(meal)
    off = (jnp.zeros((B, T), y0.dtype) if glucose_offset is None
           else jnp.asarray(glucose_offset))
    off_c = chunk_slices(off)

    def protocol(G_mmol):
        rate = jnp.clip(basal + gain * (G_mmol - target), 0.0, rate_cap)
        return rate / rate_scale  # tVNS export scale

    dt_h = ts[0, 1] - ts[0, 0]

    def step(carry, xs):
        y, rate = carry
        ts_k, meal_k, off_k = xs  # (B, ce+1)
        signals = {"meal": meal_k,
                   "tVNS": jnp.broadcast_to(rate[:, None], ts_k.shape)}
        if ctx is not None:
            signals["context"] = ctx
        traj = batched_forward(params, y, ts_k,
                               Controls(ts=ts_k, signals=signals), config)
        y_end = traj[:, -1]
        new_rate = protocol(y_end[:, 0] * std0 + mean0 + off_k[:, -1])
        return (y_end, new_rate), (traj[:, 1:], rate)

    rate0 = protocol(y0[:, 0] * std0 + mean0 + off[:, 0])
    (_, _), (chunks, rates) = jax.lax.scan(
        step, (y0, rate0), (ts_c, meal_c, off_c))
    traj = jnp.concatenate(
        [y0[:, None], jnp.moveaxis(chunks, 0, 1).reshape(B, T - 1, -1)], axis=1)
    rates = rates.T * rate_scale  # (B, C) pmol/h
    return {
        "trajectory": traj,
        "glucose": traj[..., 0] * std0 + mean0,
        "rates": rates,
        "insulin_total": rates.sum(axis=1) * dt_h * check_every,
    }


def ensemble_closed_loop(
    stacked_params: Mapping[str, Any],
    batch: Mapping[str, jnp.ndarray],
    config: HybridConfig,
    gain: jnp.ndarray,
    target: jnp.ndarray,
    norm: Tuple[jnp.ndarray, jnp.ndarray],
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Per-member closed-loop rollouts (leading K axis on every output).

    Each member simulates its OWN closed loop — the protocol reacts to that
    member's predicted glucose — so the K rollouts are K samples of the
    policy's outcome under model uncertainty."""
    return jax.vmap(
        lambda p: closed_loop_rollout(p, batch, config, gain, target, norm, **kw)
    )(stacked_params)


def glycemic_risk(
    glucose_mmol: jnp.ndarray,
    hypo: float = 3.9,
    hyper: float = 10.0,
    hypo_weight: float = 25.0,
) -> jnp.ndarray:
    """Asymmetric out-of-range risk, mean over all axes.

    Quadratic excursion penalties outside [hypo, hyper] mmol/L with
    hypoglycemia weighted `hypo_weight`x — the standard clinical asymmetry
    (hypoglycemia is acutely dangerous; hyperglycemia is a slow harm)."""
    low = jnp.maximum(hypo - glucose_mmol, 0.0)
    high = jnp.maximum(glucose_mmol - hyper, 0.0)
    return jnp.mean(hypo_weight * low**2 + high**2)


def cvar_glycemic_risk(
    glucose_mmol: jnp.ndarray,
    alpha: float = 0.25,
    **risk_kw,
) -> jnp.ndarray:
    """Risk-averse objective: CVaR_alpha of the PER-MEMBER glycemic risk.

    glucose_mmol must carry a leading ensemble-member axis (K, ...). Each
    member's rollout is one sample of the policy's outcome under model
    uncertainty; CVaR averages the worst ceil(alpha*K) member risks, so the
    optimizer hedges against the members that predict the policy going
    badly instead of optimizing the average-case story. Differentiable
    (sort has a well-defined subgradient)."""
    K = glucose_mmol.shape[0]
    per_member = jax.vmap(lambda g: glycemic_risk(g, **risk_kw))(glucose_mmol)
    k_tail = max(1, int(np.ceil(alpha * K)))
    worst = jnp.sort(per_member)[K - k_tail:]
    return worst.mean()


def time_in_range(
    glucose_mmol: jnp.ndarray, lo: float = 3.9, hi: float = 10.0
) -> jnp.ndarray:
    """Fraction of time in the clinical target band [lo, hi] mmol/L."""
    return jnp.mean((glucose_mmol >= lo) & (glucose_mmol <= hi))


def counterfactual_delta_correction(
    pred_arm: jnp.ndarray,
    pred_factual: jnp.ndarray,
    observed_factual: jnp.ndarray,
) -> jnp.ndarray:
    """Bias-correct a counterfactual rollout with observed factual data.

    g_corrected = observed_factual + (pred_arm - pred_factual): the model
    contributes only its predicted POLICY DELTA, anchored to the trajectory
    actually observed under the deployed protocol. This is the standard
    residual/delta correction of model-based control, and it is the right
    estimator here for a measured reason (RESULTS.md dosing study): the
    model's absolute glycemic risk is dominated by its own prediction error
    (~0.26 flat across a 12-protocol grid whose true risks span 0.031-0.080),
    while its causal delta is well-signed (per-window effect r = +0.55 with
    simulator truth under mech routing). Subtracting the paired factual
    rollout cancels the window-level error exactly; at the factual protocol
    the corrected trajectory equals the observation by construction.

    Args:
        pred_arm: model glucose under the candidate protocol, (..., N, T)
            (a leading ensemble axis broadcasts).
        pred_factual: model glucose for the SAME windows under the deployed
            (factual) protocol — same shape as pred_arm.
        observed_factual: observed glucose under the deployed protocol,
            (N, T), broadcast over any leading ensemble axis.

    Returns:
        corrected counterfactual glucose, same shape as pred_arm.
    """
    return observed_factual + (pred_arm - pred_factual)


def robust_delta_risk(
    pred_arm: jnp.ndarray,
    pred_factual: jnp.ndarray,
    observed_factual: jnp.ndarray,
    lambdas: Tuple[float, ...] = (0.5, 1.0, 2.0),
    objective: Callable[[jnp.ndarray], jnp.ndarray] = glycemic_risk,
) -> jnp.ndarray:
    """Worst-case delta-corrected risk under dose-response uncertainty.

    Scores `objective(observed + lambda * (pred_arm - pred_factual))` for
    each response-scale factor lambda and returns the maximum — a robust
    (distributionally pessimistic) protocol evaluation for the OPTIMIZER.

    Why: an identified-from-observational-data dose response is off by an
    imperfectly known scale in EITHER direction (measured: ~2.2x
    attenuated on the standard varied cohort, but ~2x OVERSTATED on the
    dysglycemic cohort before in-loop anchoring — RESULTS.md dosing
    study), and the 25x hypo weight of `glycemic_risk` makes understating
    a high-gain protocol's downside catastrophic (measured: a lambda-blind
    optimizer picked gain 3387/target 4.56, truly deploying at 2.6x the
    default risk). The symmetric-in-log set {0.5, 1, 2} covers both error
    directions. NOTE this is an optimization objective, not a ranking
    metric: on a cohort whose true optimum is an aggressive protocol,
    worst-case inflation inverts even a PERFECT model's ranking (the
    max-lambda branch predicts hypo for exactly the truly-best arms), so
    protocol-ranking validation must use the plain (lambda=1) corrected
    risk. Differentiable (max has a well-defined subgradient), so it can
    be passed straight to `optimize_protocol` as a closure.
    """
    delta = pred_arm - pred_factual
    risks = jnp.stack([objective(observed_factual + lam * delta)
                       for lam in lambdas])
    return risks.max()


def optimize_protocol(
    rollout: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    init_gain: float = 900.0,
    init_target: float = 7.0,
    objective: Callable[[jnp.ndarray], jnp.ndarray] = glycemic_risk,
    steps: int = 150,
    lr: float = 0.05,
    target_bounds: Tuple[float, float] = (4.5, 9.0),
    gain_bounds: Optional[Tuple[float, float]] = None,
    init_basal: Optional[Any] = None,
    basal_bounds: Tuple[float, float] = (0.0, 15000.0),
) -> Dict[str, Any]:
    """Gradient-optimize (gain, target) through a model rollout.

    Args:
        rollout: (gain, target) -> predicted glucose (any shape, mmol/L).
            Typically a closure over `closed_loop_rollout` /
            `ensemble_closed_loop` returning ['glucose'].
        init_gain/init_target: start at the deployed protocol. Scalars
            optimize one population protocol; (B,) arrays optimize a
            PER-PATIENT personalized protocol (the rollout broadcasts
            per-patient gain/target over its batch axis).
        objective: risk functional on the predicted glucose (minimized).
        steps/lr: Adam schedule on (log gain, target).
        target_bounds: box for the target via a sigmoid reparameterization
            (keeps the optimizer inside the physiologically sane band).
        gain_bounds: optional (lo, hi) box for the gain, same sigmoid
            reparameterization. Default None keeps the legacy unbounded
            log-parameterization — which measurably runs away (gain 35k,
            4x the clinical grid maximum, deployed true risk 5.6x the
            default protocol's; RESULTS.md dosing study) whenever the
            model under-responds to insulin, so protocol studies should
            pass the clinically admissible range (e.g. (0, 3600)).
        init_basal: optional starting basal infusion (pmol/h, scalar or
            (B,)). When given, the protocol space is 3D — the rollout is
            called as rollout(gain, target, basal) and the returned dict
            gains a 'basal' entry — with basal sigmoid-boxed to
            `basal_bounds` (the basal axis is where the hypoglycemia tail
            lives, so an unbounded parameterization is never appropriate).
            None (default) keeps the legacy 2D rollout(gain, target).

    Returns:
        dict with 'gain', 'target' (optimized floats; plus 'basal' when
        init_basal is given), 'risk' trace (steps+1,), and
        'init_risk'/'final_risk'.
    """
    lo, hi = target_bounds

    def box(val, bounds):
        blo, bhi = bounds
        x0 = jnp.clip((jnp.asarray(val, jnp.float32) - blo) / (bhi - blo),
                      1e-3, 1 - 1e-3)
        return jnp.log(x0 / (1 - x0))

    def unbox(logit, bounds):
        blo, bhi = bounds
        return blo + (bhi - blo) * jax.nn.sigmoid(logit)

    def unpack(z):
        if gain_bounds is None:
            gain = jnp.exp(z["log_gain"])
        else:
            gain = unbox(z["logit_gain"], gain_bounds)
        target = unbox(z["logit_target"], target_bounds)
        if init_basal is None:
            return gain, target
        return gain, target, unbox(z["logit_basal"], basal_bounds)

    z = {"logit_target": box(init_target, (lo, hi))}
    if gain_bounds is None:
        z["log_gain"] = jnp.log(jnp.asarray(init_gain, jnp.float32))
    else:
        z["logit_gain"] = box(init_gain, gain_bounds)
    if init_basal is not None:
        z["logit_basal"] = box(init_basal, basal_bounds)

    def loss(z):
        return objective(rollout(*unpack(z)))

    opt = optax.adam(lr)
    state = opt.init(z)

    @jax.jit
    def update(z, state):
        val, g = jax.value_and_grad(loss)(z)
        upd, state = opt.update(g, state)
        return optax.apply_updates(z, upd), state, val

    trace = []
    for _ in range(steps):
        z, state, val = update(z, state)
        trace.append(float(val))  # risk at the pre-update parameters
    trace.append(float(jax.jit(loss)(z)))  # risk at the final parameters
    unpacked = unpack(z)

    def to_py(x):
        return float(x) if jnp.ndim(x) == 0 else np.asarray(x)

    out = {
        "gain": to_py(unpacked[0]),
        "target": to_py(unpacked[1]),
        "risk": trace,
        "init_risk": trace[0],
        "final_risk": trace[-1],
    }
    if init_basal is not None:
        out["basal"] = to_py(unpacked[2])
    return out


def calibrate_dose_response(
    stacked_params: Mapping[str, Any],
    batch: Mapping[str, jnp.ndarray],
    config: HybridConfig,
    norm: Tuple[jnp.ndarray, jnp.ndarray],
    gain_w: jnp.ndarray,
    target_w: jnp.ndarray,
    basal_w: jnp.ndarray,
    observed_glucose: jnp.ndarray,
    observed_mask: jnp.ndarray,
    subject_idx: np.ndarray,
    reference_protocol: Tuple[float, float, float] = (900.0, 7.0, 0.0),
    scales: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0, 16.0, 32.0),
    rate_cap: float = 20000.0,
    check_every: int = 12,
    instruments: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Identify the exogenous-insulin de-attenuation scale from randomized
    practice variation, and return a k_ex-calibrated ensemble.

    THE problem this solves (measured, RESULTS.md round-5 dosing study):
    under closed-loop dosing the NN-visible insulin signal is confounded,
    and even with full causal masking (`exog_insulin='mech_blind'`) joint
    training under-identifies `k_ex` — the learned dose response is
    attenuated by an unknown factor (k_ex collapsed to ~0.08 on the
    dysglycemic cohort; protocol-ranking Spearman stuck at 0.23 because
    every arm's predicted delta is too small to order the true risks).

    The identifying lever is the TRAINING cohort's per-patient protocol
    variation (`generate_icu_cohort_*(varied_protocol=True)` — the
    in-silico analogue of practice variation across units/physicians):
    protocol assignment is independent of patient state by construction,
    so a regression of observed outcomes on model-predicted protocol
    effects across patients is an unconfounded estimate of the response
    scale (instrumental logic: the randomized protocol is the instrument).

    For each candidate scale s (k_ex <- s * k_ex):
      m_p(s) = model-predicted effect for patient p of their OWN assigned
               protocol vs `reference_protocol` (anchored closed-loop
               rollouts, charting-time masked mean glucose delta, ensemble
               mean, windows averaged per patient);
      slope(s) = cov(y_p, m_p) / var(m_p)  over patients,
               where y_p = patient p's observed masked mean glucose.
    A perfectly scaled response has slope 1 (the model's predicted effect
    explains the observed cross-patient protocol contrast 1:1); slope > 1
    means the response is still attenuated. The returned s* is the
    LINEAR-REGIME estimate slope(1) — under local effect-linearity in k_ex
    that is exactly the scale at which slope(s*) = 1, and unlike solving
    slope(s) = 1 on the scanned curve it cannot be dragged onto the
    clamp-saturation plateau (see the selection comment below; measured
    failure: scan-cap 32x, grid ranking destroyed). The larger scan scales
    remain as published saturation diagnostics.

    With `instruments` (a (P, d) matrix of per-patient EXOGENOUS protocol
    features, e.g. [gain, target, basal]) the slope is estimated by 2SLS:
    m_p is first projected onto the instruments (+intercept), and the
    slope regresses y on the projection. This matters because the plain
    OLS slope is severity-confounded — the model's predicted effect of a
    sliding scale is larger for sicker (higher-glucose) patients, and
    severity also raises observed glucose, biasing cov(y, m) upward
    (measured: OLS slope 183 at s=1 on the dysglycemic cohort where the
    instrumented slope is far smaller). Protocol assignment is randomized,
    so the projection keeps only the exogenous variation.

    Args:
        stacked_params: ensemble pytree, leading member axis K.
        batch: training windows (B, T, ...) with z-scored observations.
        gain_w/target_w/basal_w: (B,) each window's FACTUAL (assigned)
            protocol parameters.
        observed_glucose: (B, T) observed glucose, mmol/L (NaN-free;
            masked positions may hold anything).
        observed_mask: (B, T) 1.0 where glucose was actually charted.
        subject_idx: (B,) integer patient index per window.
        reference_protocol: common contrast protocol (gain, target, basal).

    Returns dict with 'scale' (s*), 'slopes' per scanned scale,
    'regression_r2' at s*, 'n_patients', and 'stacked_calibrated' (the
    input pytree with ode.k_ex multiplied by s*).
    """
    g_ref, t_ref, b_ref = (jnp.asarray(x) for x in reference_protocol)
    mask = jnp.asarray(observed_mask)
    obs = jnp.asarray(observed_glucose)
    B = obs.shape[0]
    P = int(subject_idx.max()) + 1
    ones_w = np.ones(B)
    win_per_p = np.zeros(P)
    np.add.at(win_per_p, subject_idx, ones_w)

    def per_patient(vals_w):
        acc = np.zeros(P)
        np.add.at(acc, subject_idx, np.asarray(vals_w))
        return acc / np.maximum(win_per_p, 1.0)

    def masked_mean_t(g):
        # (..., B, T) -> (..., B): charting-time mean per window
        return (g * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)

    y_w = np.asarray(masked_mean_t(obs))
    y_p = per_patient(y_w)

    def scaled(s):
        out = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in stacked_params.items()}
        out["ode"] = dict(out["ode"])
        out["ode"]["k_ex"] = out["ode"]["k_ex"] * s
        return out

    @jax.jit
    def effects(s):
        ps = scaled(s)
        def roll(gain, target, basal, off):
            return ensemble_closed_loop(
                ps, batch, config, gain, target, norm, basal=basal,
                glucose_offset=off, rate_cap=rate_cap,
                check_every=check_every)["glucose"]
        zero = jnp.zeros_like(obs)
        g_own0 = roll(gain_w, target_w, basal_w, zero)
        anchor = obs - jnp.mean(g_own0, axis=0)
        g_own = roll(gain_w, target_w, basal_w, anchor)
        g_rf = roll(g_ref, t_ref, b_ref, anchor)
        return masked_mean_t(jnp.mean(g_own, 0) - jnp.mean(g_rf, 0))

    Z = None
    if instruments is not None:
        zr = np.asarray(instruments, np.float64)
        zr = (zr - zr.mean(0)) / np.maximum(zr.std(0), 1e-12)
        Z = np.concatenate([np.ones((P, 1)), zr], axis=1)

    slopes, details = {}, {}
    for s in scales:
        m_p = per_patient(np.asarray(effects(jnp.asarray(float(s)))))
        mc = m_p - m_p.mean()
        yc = y_p - y_p.mean()
        extra = {}
        if Z is not None:
            # 2SLS: keep only the instrument-projected (exogenous) part of
            # the model effect, then regress the outcome on the projection
            coef, *_ = np.linalg.lstsq(Z, mc, rcond=None)
            m_hat = Z @ coef
            var_mh = float((m_hat * m_hat).mean())
            slope = float((m_hat * yc).mean() / max(var_mh, 1e-12))
            fs_r2 = var_mh / max(float((mc * mc).mean()), 1e-12)
            extra["first_stage_r2"] = round(fs_r2, 4)
            resid = yc - slope * m_hat
        else:
            var_m = float((mc * mc).mean())
            slope = float((mc * yc).mean() / max(var_m, 1e-12))
            resid = yc - slope * mc
        r2 = 1.0 - float((resid**2).mean()) / max(float((yc**2).mean()), 1e-12)
        slopes[float(s)] = slope
        # non-finite entries (rollout blow-up at an over-inflated scale) are
        # recorded as null, not NaN — artifact-finiteness convention; a
        # non-finite slope also cannot be used for interpolation below
        fin = lambda x, nd: round(float(x), nd) if np.isfinite(x) else None
        details[float(s)] = {"slope": fin(slope, 4), "r2": fin(r2, 4),
                             "effect_sd_mmol": fin(m_p.std(), 4),
                             **{k: fin(v, 4) for k, v in extra.items()}}

    # LINEAR-REGIME scale estimate: s* = slope at the trained scale (s=1).
    # If the model's effect were linear in k_ex, "attenuated 5.7x at s=1"
    # means the true scale is 5.7 — the same number "solve slope(s)=1"
    # would find. But the two estimators diverge hard when the scanned
    # rollouts SATURATE (measured, round 5): at large s the trajectories
    # slam into the solver's z-space state clamp, effects stop growing,
    # slope(s) plateaus just above 1, and the slope(s)=1 solver rides that
    # artificial plateau to the scan cap (picked 32x -> k_ex ~ 12,800 and
    # every dosed grid arm clamped to the same floor; protocol ranking
    # Spearman collapsed to -0.04). The linear-regime estimate stays in
    # the regime where the regression is meaningful; on the dysglycemic
    # cohort it recovers s* = 5.7, matching the generator's first-
    # principles PK ratio (true k_ex = rate_scale / V_d_effective = 2000
    # vs trained 400 -> 5x). slope(s*) is reported as `slope_at_scale`
    # (with the grid's nearest measured point) so saturation remains
    # visible: >> 1 there means the model cannot reproduce the observed
    # contrast at ANY scale without clamping — a model defect, not a
    # calibration target.
    ss = np.array(sorted(slopes))
    sl = np.array([slopes[s] for s in ss])
    s1 = float(sl[0]) if np.isfinite(sl[0]) else 0.0
    if s1 <= 0.0:
        s_star = float(ss[0])  # response sign-inverted: do not inflate
    else:
        s_star = s1            # < 1 shrinks an over-responsive pathway
    near = float(ss[np.argmin(np.abs(np.log(ss) - np.log(max(s_star, 1e-9))))])
    return {
        "scale": s_star,
        "slope_at_scale": {"nearest_scanned_scale": near,
                           "slope": details[near]["slope"]},
        "slopes": details,
        "n_patients": int(P),
        "stacked_calibrated": scaled(jnp.asarray(s_star)),
    }
