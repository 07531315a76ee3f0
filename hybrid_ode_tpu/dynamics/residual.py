"""MLP residual dynamics as pure pytree functions.

Replaces the reference's `models/nn_residual.py:15-222` torch module with a
plain parameter pytree + apply function. Rationale: the residual is evaluated
inside every RK stage of every solver step — a pure function composes cleanly
with `vmap` over (batch, MC-samples, chains, Sobol points) and with the Pallas
fused-RHS kernel in `ops/`.

Architecture (parity with reference defaults):
    input  : [t, G, I, Glu, GLP1, GE, FFA, glp1_ext, tVNS]  -> 9 features
    hidden : n_layers x hidden_dim, activation (relu default)
    output : 6 residuals, ZERO-initialised so training starts from the pure
             mechanistic ODE (reference `models/nn_residual.py:83-98`:
             zero output layer, Xavier-normal gain 0.1 hidden layers).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

Activation = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
}


def init_mlp_params(
    key: jax.Array,
    input_dim: int = 9,
    hidden_dim: int = 64,
    output_dim: int = 6,
    n_layers: int = 4,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Initialise MLP parameters.

    Layout: flat dict {'w0','b0',...,'w{n},'b{n}'} — flat keys keep the
    VI / MCMC parameter naming trivial (reference mangles torch names with
    '.'->'_' at `models/hybrid_ode_nn.py:88-91`; we just never have dots).

    Hidden layers: Xavier-normal with gain 0.1; biases zero.
    Output layer: all-zero weights and bias (hybrid starts as pure ODE).
    """
    dims = [input_dim] + [hidden_dim] * n_layers + [output_dim]
    params: Dict[str, jnp.ndarray] = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        last = i == len(dims) - 2
        if last:
            w = jnp.zeros((d_in, d_out), dtype)
        else:
            std = 0.1 * math.sqrt(2.0 / (d_in + d_out))  # xavier_normal_, gain=0.1
            w = std * jax.random.normal(keys[i], (d_in, d_out), dtype)
        params[f"w{i}"] = w
        params[f"b{i}"] = jnp.zeros((d_out,), dtype)
    return params


def mlp_num_layers(params: Dict[str, jnp.ndarray]) -> int:
    return sum(1 for k in params if k.startswith("w"))


def mlp_apply(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    activation: str = "relu",
    dropout: float = 0.0,
    key: jnp.ndarray = None,
) -> jnp.ndarray:
    """Apply the MLP to features x of shape (..., input_dim).

    dropout: optional hidden-layer dropout (parity: `nn_residual.py:40-57` —
    the reference offers it, defaulted off; randomising an ODE right-hand
    side makes the field non-smooth, so it stays a deliberately unused
    option here too). Active only when a key is given (training-mode
    semantics of torch's nn.Dropout); inverted scaling keeps expectations."""
    act = Activation[activation]
    n = mlp_num_layers(params)
    h = x
    for i in range(n - 1):
        h = act(h @ params[f"w{i}"] + params[f"b{i}"])
        if dropout > 0.0 and key is not None:
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h @ params[f"w{n-1}"] + params[f"b{n-1}"]


def residual_features(
    t: jnp.ndarray,
    y: jnp.ndarray,
    glp1: jnp.ndarray,
    tvns: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble the 9-feature input [t, y(6), glp1, tVNS].

    Parity with reference `models/nn_residual.py:136-143`: glp1 is passed
    separately from the state (it may be an external signal distinct from the
    GLP1 state); tVNS is the vagal-stimulation control.
    """
    t = jnp.broadcast_to(jnp.asarray(t, y.dtype), y.shape[:-1])
    glp1 = jnp.broadcast_to(jnp.asarray(glp1, y.dtype), y.shape[:-1])
    tvns = jnp.broadcast_to(jnp.asarray(tvns, y.dtype), y.shape[:-1])
    return jnp.concatenate(
        [t[..., None], y, glp1[..., None], tvns[..., None]], axis=-1
    )


def residual_apply(
    params: Dict[str, jnp.ndarray],
    t: jnp.ndarray,
    y: jnp.ndarray,
    glp1: jnp.ndarray,
    tvns: jnp.ndarray,
    activation: str = "relu",
    extra: jnp.ndarray = None,
) -> jnp.ndarray:
    """NN residual dynamics g_NN(t, y, glp1, tVNS[, extra]) -> (..., 6).

    extra: optional additional features (e.g. a latent subject context),
    shape (..., d) broadcastable against y's leading dims.
    """
    feats = residual_features(t, y, glp1, tvns)
    if extra is not None:
        extra = jnp.broadcast_to(extra, feats.shape[:-1] + extra.shape[-1:])
        feats = jnp.concatenate([feats, extra], axis=-1)
    return mlp_apply(params, feats, activation)


def feature_importance(
    params: Dict[str, jnp.ndarray],
    t: jnp.ndarray,
    y: jnp.ndarray,
    glp1: jnp.ndarray,
    tvns: jnp.ndarray,
    activation: str = "relu",
) -> jnp.ndarray:
    """Gradient-based feature importance (parity: `models/nn_residual.py:153-196`).

    The reference loops over the 6 outputs calling .backward(retain_graph=True);
    here a single jacobian evaluation gives |d out_j / d in_i| averaged over the
    batch and outputs.
    """
    feats = residual_features(t, y, glp1, tvns)
    feats2d = feats.reshape(-1, feats.shape[-1])

    jac_fn = jax.vmap(jax.jacobian(lambda f: mlp_apply(params, f, activation)))
    jac = jac_fn(feats2d)  # (B, out, in)
    return jnp.abs(jac).mean(axis=(0, 1))


def mlp_l2(params: Dict[str, jnp.ndarray], l2_weight: float = 1e-4) -> jnp.ndarray:
    """L2 penalty over weight matrices only (parity: `models/nn_residual.py:198-222`
    penalises nn.Linear.weight, not biases)."""
    total = 0.0
    for k, v in params.items():
        if k.startswith("w"):
            total = total + jnp.sum(v * v)
    return l2_weight * total
