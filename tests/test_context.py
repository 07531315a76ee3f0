"""Subject-conditioning (context encoder) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    encode_context,
    hybrid_loss,
    init_hybrid_params,
    with_context,
    controls_from_batch,
    batched_forward,
)

CTX = HybridConfig(solver="rk4", substeps=2, nn_hidden=16, nn_layers=2,
                   mode="scan", context_points=4, context_dim=8)
PHYS = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])


def _batch(B=4, T=9):
    key = jax.random.PRNGKey(0)
    y0 = jnp.abs(PHYS[None, :] * (1 + 0.05 * jax.random.normal(key, (B, 6))))
    return {
        "initial_state": y0,
        "observations": jnp.broadcast_to(PHYS, (B, T, 6)) * (1 + 0.01 * jax.random.normal(key, (B, T, 6))),
        "time_points": jnp.broadcast_to(jnp.linspace(0.0, 2.0, T), (B, T)),
        "external_inputs": {"meal": jnp.zeros((B, T)), "tVNS": jnp.zeros((B, T))},
        "mask": jnp.ones((B, T)),
    }


def test_context_params_and_encoding():
    params = init_hybrid_params(jax.random.PRNGKey(0), CTX)
    assert "enc" in params
    batch = _batch()
    ctx = encode_context(params["enc"], batch["observations"], batch["time_points"], 4)
    assert ctx.shape == (4, 8)
    assert np.isfinite(np.asarray(ctx)).all()
    # different observations -> different context
    obs2 = batch["observations"] * 1.2
    ctx2 = encode_context(params["enc"], obs2, batch["time_points"], 4)
    assert float(jnp.abs(ctx - ctx2).sum()) > 0


def test_conditioned_loss_and_gradients_reach_encoder():
    params = init_hybrid_params(jax.random.PRNGKey(0), CTX)
    # non-zero NN output layer so the context input actually matters
    params["nn"]["w2"] = 0.01 * jax.random.normal(jax.random.PRNGKey(1), params["nn"]["w2"].shape)
    batch = _batch()
    (loss, _), g = jax.value_and_grad(
        lambda p: hybrid_loss(p, batch, jax.random.PRNGKey(2), CTX), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    enc_gnorm = sum(float(jnp.abs(v).sum()) for v in g["enc"].values())
    assert enc_gnorm > 0  # gradients flow into the encoder through the solve


def test_unconditioned_call_sites_use_zero_context():
    """batched_forward without injected context must still work (zeros)."""
    params = init_hybrid_params(jax.random.PRNGKey(0), CTX)
    batch = _batch()
    controls = controls_from_batch(batch)
    out = batched_forward(params, batch["initial_state"], batch["time_points"], controls, CTX)
    assert out.shape == (4, 9, 6)
    # and with context injected the trajectories differ once NN is non-zero
    params["nn"]["w2"] = 0.05 * jax.random.normal(jax.random.PRNGKey(1), params["nn"]["w2"].shape)
    ctr2 = with_context(params, batch, controls, CTX)
    a = batched_forward(params, batch["initial_state"], batch["time_points"], controls, CTX)
    b = batched_forward(params, batch["initial_state"], batch["time_points"], ctr2, CTX)
    assert float(jnp.abs(a - b).max()) > 0
