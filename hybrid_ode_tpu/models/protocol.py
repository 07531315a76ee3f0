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

    def protocol(G_mmol):
        rate = jnp.clip(basal + gain * (G_mmol - target), 0.0, rate_cap)
        return rate / rate_scale  # tVNS export scale

    dt_h = ts[0, 1] - ts[0, 0]

    def step(carry, xs):
        y, rate = carry
        ts_k, meal_k = xs  # (B, ce+1)
        signals = {"meal": meal_k,
                   "tVNS": jnp.broadcast_to(rate[:, None], ts_k.shape)}
        if ctx is not None:
            signals["context"] = ctx
        traj = batched_forward(params, y, ts_k,
                               Controls(ts=ts_k, signals=signals), config)
        y_end = traj[:, -1]
        new_rate = protocol(y_end[:, 0] * std0 + mean0)
        return (y_end, new_rate), (traj[:, 1:], rate)

    rate0 = protocol(y0[:, 0] * std0 + mean0)
    (_, _), (chunks, rates) = jax.lax.scan(step, (y0, rate0), (ts_c, meal_c))
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
    lambdas: Tuple[float, ...] = (1.0, 2.0, 4.0),
    objective: Callable[[jnp.ndarray], jnp.ndarray] = glycemic_risk,
) -> jnp.ndarray:
    """Worst-case delta-corrected risk under dose-response uncertainty.

    Scores `objective(observed + lambda * (pred_arm - pred_factual))` for
    each de-attenuation factor lambda and returns the maximum — a robust
    (distributionally pessimistic) protocol evaluation.

    Why: an identified-from-observational-data dose response is attenuated
    by an imperfectly known factor (measured here: ~2.2x on the varied
    cohort, ~6x on the factual cohort — RESULTS.md causal-routing study).
    Plain delta correction therefore UNDERSTATES how far a high-gain
    protocol drives glucose down, which hides its hypoglycemia tail (the
    25x-weighted half of `glycemic_risk`) — measured: plain-corrected
    ranking picked gain 3387/target 4.56, which truly deploys at 2.6x the
    default risk. Evaluating the worst case over a plausible attenuation
    set surfaces that tail without needing the true factor: protocols
    whose predicted deltas are near zero (withhold/high-target arms) are
    insensitive to lambda, while aggressive arms reveal their downside.
    Differentiable (max has a well-defined subgradient), so it can be
    passed straight to `optimize_protocol` as a closure.
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
