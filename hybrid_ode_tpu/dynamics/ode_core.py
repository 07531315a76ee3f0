"""Mechanistic 6-state glucose–insulin–glucagon–GLP-1–GE–FFA vector field.

TPU-native redesign of the reference `models/ode_core.py:14-210` (a torch
nn.Module with parameters held as buffers). Here the field is a *pure
function* of `(t, y, params, inputs)`: parameters live in an ordinary dict
pytree, so vmapping over parameter samples (VI/MCMC/Sobol) and swapping
parameters functionally (the reference's 60-line `forward_with_params`
buffer-swap dance, `models/hybrid_ode_nn.py:381-438`) are both free.

State layout (last axis, size 6), identical to the reference:
    0: G     glucose (mmol/L)
    1: I     insulin (pmol/L)
    2: Glu   glucagon (pmol/L)
    3: GLP1  GLP-1 (pmol/L)
    4: GE    gastric-emptying state (placeholder, dGE/dt = 0)
    5: FFA   free fatty acids (mmol/L)

Equations (parity with reference `models/ode_core.py:122-153`):
    Pi      = 1 + rho * GLP1
    dI/dt   = Pi * a_GI * (G - G_b) - k_I * (I - I_b)
    dGlu/dt = -E_max * GLP1 / (EC_50 + GLP1) * (Glu - Glu_b)
    dGLP1/dt= V_max * G / (K_m + G) - k_L * GLP1
    k_GE    = k_GE0 * (1 - GD^g / (IGD_50^g + GD^g))
    dFFA/dt = -p_7 * FFA - p_8 * I * FFA + p_9 * G * FFA
    dG/dt   = meal - 0.01 * (I - I_b) + 0.005 * (Glu - Glu_b) - k_GE * G
    dGE/dt  = 0
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp

# Default physiological parameter values (reference `models/ode_core.py:44-71`,
# also Table I of the manuscript / configs/default.yaml `ode_params`).
DEFAULT_ODE_PARAMS: Dict[str, float] = {
    # Insulin dynamics
    "a_GI": 0.0104,   # glucose-insulin sensitivity (1/min)
    "k_I": 0.025,     # insulin clearance rate (1/min)
    "rho": 0.003,     # GLP-1 potentiation factor
    "G_b": 5.0,       # basal glucose (mmol/L)
    "I_b": 60.0,      # basal insulin (pmol/L)
    # Glucagon dynamics
    "E_max": 0.1,     # max GLP-1 suppression effect
    "EC_50": 50.0,    # GLP-1 conc. at half-max effect (pmol/L)
    "Glu_b": 80.0,    # basal glucagon (pmol/L)
    # GLP-1 dynamics
    "V_max": 9.0,     # max GLP-1 secretion rate (pmol/L/min)
    "K_m": 7.0,       # Michaelis constant for glucose (mmol/L)
    "k_L": 0.02,      # GLP-1 degradation rate (1/min)
    # Gastric emptying
    "k_GE0": 0.01,    # basal gastric emptying rate (1/min)
    "IGD_50": 1000.0, # gastric distension at half-max suppression
    "g": 2.0,         # Hill coefficient for GE suppression
    # FFA dynamics
    "p_7": 0.05,      # FFA clearance rate (1/min)
    "p_8": 0.001,     # insulin suppression factor
    "p_9": 0.01,      # glucose-driven lipolysis factor
}

#: Parameters given variational/Bayesian treatment (reference
#: `models/hybrid_ode_nn.py:83`).
BAYES_ODE_PARAM_NAMES = ("a_GI", "k_I", "rho", "E_max", "EC_50", "V_max", "K_m", "k_L")


def make_ode_params(
    overrides: Optional[Mapping[str, float]] = None, dtype=jnp.float32
) -> Dict[str, jnp.ndarray]:
    """Build the parameter pytree, merging user overrides onto defaults."""
    params = dict(DEFAULT_ODE_PARAMS)
    if overrides:
        params.update({k: float(v) for k, v in overrides.items()})
    return {k: jnp.asarray(v, dtype=dtype) for k, v in params.items()}


def _safe_pow(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """x**p for x >= 0 with well-defined value *and gradient* at x == 0.

    A bare `x**p` with float exponent lowers to exp(p*log(x)), whose gradient
    is NaN at x=0 (GD is frequently exactly 0). Double-where keeps both the
    primal and the cotangent finite.
    """
    safe_x = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, safe_x**p, jnp.zeros_like(x))


def mechanistic_field(
    t: jnp.ndarray,
    y: jnp.ndarray,
    params: Mapping[str, jnp.ndarray],
    inputs: Optional[Mapping[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Evaluate the mechanistic vector field.

    Args:
        t: time (unused by the autonomous core; kept for solver interface).
        y: state, shape (..., 6). Any leading broadcast/batch dims work —
           there is no batch special-casing (the reference's dim-juggling at
           `models/ode_core.py:97-100` is unnecessary in a pure function).
        params: dict of scalar parameters (see DEFAULT_ODE_PARAMS).
        inputs: optional dict with 'meal', 'tVNS', 'GD' (broadcast to y[..., 0]).

    Returns:
        dy/dt with the same shape as y.
    """
    del t  # autonomous; external forcing enters via `inputs`
    G = y[..., 0]
    I = y[..., 1]
    Glu = y[..., 2]
    GLP1 = y[..., 3]
    FFA = y[..., 5]

    zeros = jnp.zeros_like(G)
    inputs = inputs or {}
    meal = inputs.get("meal", zeros)
    GD = inputs.get("GD", zeros)
    # 'tVNS' does not enter the mechanistic equations (parity: reference only
    # threads it into the NN residual, `models/hybrid_ode_nn.py:126-129`).

    p = params
    # Insulin with GLP-1 potentiation
    Pi = 1.0 + p["rho"] * GLP1
    dI = Pi * p["a_GI"] * (G - p["G_b"]) - p["k_I"] * (I - p["I_b"])
    if "k_ex" in p:
        # Exogenous insulin appearance (IV infusion): known causal route into
        # the insulin compartment, learnable gain k_ex absorbing the unit
        # conversion of the O(1) rate signal. Identified directly from the
        # OBSERVED insulin channel, which is what breaks the closed-loop
        # confounding measured in benchmarks/intervention.py. DEVIATION: the
        # reference has no exogenous-insulin pathway anywhere (its controls
        # reach only the NN residual, `models/hybrid_ode_nn.py:126-129`).
        dI = dI + p["k_ex"] * inputs.get("I_ex", zeros)
    # Glucagon suppression by GLP-1 (Hill with n=1)
    glp1_effect = p["E_max"] * GLP1 / (p["EC_50"] + GLP1)
    dGlu = -glp1_effect * (Glu - p["Glu_b"])
    # GLP-1 secretion (Michaelis–Menten in glucose) and degradation
    dGLP1 = p["V_max"] * G / (p["K_m"] + G) - p["k_L"] * GLP1
    # Gastric emptying rate with distension suppression
    GD_pow = _safe_pow(GD, p["g"])
    k_GE = p["k_GE0"] * (1.0 - GD_pow / (_safe_pow(p["IGD_50"], p["g"]) + GD_pow))
    # FFA kinetics
    dFFA = -p["p_7"] * FFA - p["p_8"] * I * FFA + p["p_9"] * G * FFA
    # Glucose balance. Insulin sensitivity: fixed 0.01 (reference parity,
    # `models/ode_core.py` glucose balance) unless a trainable "S_I" is
    # present — then |S_I| so the insulin->glucose coupling is SIGN-DEFINITE
    # (physiology: insulin never raises glucose). This matters causally: on
    # ICU cohorts insulin is dosed in proportion to glucose (closed loop),
    # so an unconstrained learner flips the association positive (measured,
    # RESULTS.md round-5 causal-routing study); the magnitude of a monotone
    # structural term, by contrast, is identified from randomized protocol
    # variation. Used by HybridConfig.exog_insulin='mech_blind'.
    s_i = p.get("S_I")
    si_eff = 0.01 if s_i is None else jnp.abs(s_i)
    dG = meal - si_eff * (I - p["I_b"]) + 0.005 * (Glu - p["Glu_b"]) - k_GE * G
    # GE placeholder
    dGE = jnp.zeros_like(G)

    return jnp.stack([dG, dI, dGlu, dGLP1, dGE, dFFA], axis=-1)


def steady_state(params: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    """Approximate no-input steady state (parity: `models/ode_core.py:168-187`)."""
    return jnp.stack(
        [
            jnp.asarray(params["G_b"], jnp.float32),
            jnp.asarray(params["I_b"], jnp.float32),
            jnp.asarray(params["Glu_b"], jnp.float32),
            jnp.asarray(0.0, jnp.float32),  # GLP1
            jnp.asarray(0.0, jnp.float32),  # GE
            jnp.asarray(1.0, jnp.float32),  # FFA (normalized)
        ]
    )


def check_mass_balance(y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Physiological range checks (parity: `models/ode_core.py:189-210`)."""
    G = y[..., 0]
    I = y[..., 1]
    return {
        "non_negative": jnp.all(y >= 0, axis=-1),
        "glucose_range": (G >= 2.0) & (G <= 30.0),
        "insulin_range": (I >= 0.0) & (I <= 1000.0),
    }
