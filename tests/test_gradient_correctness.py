"""Autodiff-tier tests (parity: reference tests/test_gradient_correctness.py,
including the pieces the reference skips or can't test)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hybrid_ode_tpu.models.hybrid import HybridConfig, hybrid_loss, init_hybrid_params
from hybrid_ode_tpu.train.loop import make_optimizer

FAST = HybridConfig(solver="rk4", substeps=2, nn_hidden=16, nn_layers=2, mode="scan")
PHYS = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])


def _batch(key, B=4, T=7):
    y0 = jnp.abs(PHYS[None, :] * (1 + 0.05 * jax.random.normal(key, (B, 6))))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 1.5, T), (B, T))
    return {
        "initial_state": y0,
        "observations": jnp.broadcast_to(PHYS * 1.02, (B, T, 6)),
        "time_points": ts,
        "external_inputs": {"meal": jnp.zeros((B, T)), "tVNS": jnp.zeros((B, T))},
        "mask": jnp.ones((B, T)),
    }


def test_full_loss_gradients_finite_and_nonzero():
    """Scalar finite loss; nonzero grads for all NN weight matrices
    (reference test_hybrid_model_gradients — which only gets gradients via
    its physics loss; ours flow through the integrator)."""
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    batch = _batch(jax.random.PRNGKey(1))
    (loss, comps), grads = jax.value_and_grad(
        lambda p: hybrid_loss(p, batch, jax.random.PRNGKey(2), FAST), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    # zero-init: last layer gets gradient immediately
    assert float(jnp.abs(grads["nn"]["w2"]).sum()) > 0
    for k, v in grads["nn"].items():
        assert np.all(np.isfinite(np.asarray(v))), k
    for k, v in grads["ode"].items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_gradient_accumulation_consistency():
    """Gradients of the mean loss over a combined batch equal the mean of
    per-half gradients (reference :117-169 checks accumulation norms)."""
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    key = jax.random.PRNGKey(3)
    batch = _batch(jax.random.PRNGKey(1), B=8)

    def loss_of(p, b):
        return hybrid_loss(p, b, key, FAST, lambda1=0.0, lambda2=0.0,
                           use_physics_loss=False)[0]

    def sub(b, sl):
        return {
            "initial_state": b["initial_state"][sl],
            "observations": b["observations"][sl],
            "time_points": b["time_points"][sl],
            "external_inputs": {k: v[sl] for k, v in b["external_inputs"].items()},
            "mask": b["mask"][sl],
        }

    g_full = jax.grad(loss_of)(params, batch)
    g_a = jax.grad(loss_of)(params, sub(batch, slice(0, 4)))
    g_b = jax.grad(loss_of)(params, sub(batch, slice(4, 8)))
    for k in g_full["nn"]:
        np.testing.assert_allclose(
            np.asarray(g_full["nn"][k]),
            0.5 * (np.asarray(g_a["nn"][k]) + np.asarray(g_b["nn"][k])),
            rtol=2e-3, atol=1e-6,
        )


def test_gradient_clipping_effective():
    """Global-norm clipping bounds the update norm (reference :211-256)."""
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    # huge artificial gradients
    grads = jax.tree.map(lambda x: 100.0 * jnp.ones_like(x), params)
    tx = optax.clip_by_global_norm(5.0)
    clipped, _ = tx.update(grads, tx.init(params))
    assert float(optax.global_norm(clipped)) == pytest.approx(5.0, rel=1e-4)


def test_vi_gradients_flow():
    """The test the reference SKIPS ('interface needs refactoring',
    reference tests/test_gradient_correctness.py:172-173)."""
    from hybrid_ode_tpu.inference.vi import elbo
    from hybrid_ode_tpu.models.bayes import init_variational
    from hybrid_ode_tpu.models.hybrid import params_to_flat

    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    vstate, priors = init_variational(params_to_flat(params))
    batch = _batch(jax.random.PRNGKey(1))

    g = jax.grad(
        lambda vs: -elbo(vs, priors, params, batch, jax.random.PRNGKey(2), FAST, 2)[0]
    )(vstate)
    mean_norm = sum(float(jnp.abs(v).sum()) for v in g.means.values())
    std_norm = sum(float(jnp.abs(v).sum()) for v in g.log_stds.values())
    assert np.isfinite(mean_norm) and mean_norm > 0
    assert np.isfinite(std_norm) and std_norm > 0


@pytest.mark.parametrize("solver", ["radau", "bdf"])
def test_implicit_solver_hybrid_gradients_match_fd(solver, x64):
    """FD-vs-adjoint gradient checks for the IMPLICIT solvers on the 6-state
    hybrid field (mechanistic + NN residual), f64 on CPU (VERDICT r3 #7:
    radau/bdf scan-mode grads were exercised nowhere against finite
    differences on the hybrid field)."""
    from hybrid_ode_tpu.dynamics.ode_core import make_ode_params, steady_state
    from hybrid_ode_tpu.models.hybrid import hybrid_field
    from hybrid_ode_tpu.solvers.api import odeint

    cfg = HybridConfig(solver=solver, nn_hidden=8, nn_layers=2, mode="scan")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    # non-zero output layer so NN-weight grads are informative
    params["nn"]["w2"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(2), params["nn"]["w2"].shape)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    ode64 = make_ode_params(dtype=jnp.float64)
    y0 = (steady_state(ode64) + 0.3).astype(jnp.float64)
    ts = jnp.linspace(0.0, 1.5, 4, dtype=jnp.float64)

    f = lambda t, y, p: hybrid_field(t, y, p, None, cfg)

    def loss_of(p):
        ys = odeint(f, y0, ts, p, solver=solver, rtol=1e-8, atol=1e-10,
                    mode="scan", max_steps_per_interval=64)
        return jnp.sum(ys[-1] ** 2)

    g = jax.grad(loss_of)(params)

    def fd(path_get, path_set, eps=1e-6):
        p_plus = path_set(params, path_get(params) + eps)
        p_minus = path_set(params, path_get(params) - eps)
        return (loss_of(p_plus) - loss_of(p_minus)) / (2 * eps)

    # scalar mechanistic parameter
    g_fd = fd(lambda p: p["ode"]["a_GI"],
              lambda p, v: {**p, "ode": {**p["ode"], "a_GI": v}})
    np.testing.assert_allclose(float(g["ode"]["a_GI"]), float(g_fd), rtol=1e-4)

    # one NN weight element (output layer, both grads nonzero at init)
    def set_w(p, v):
        return {**p, "nn": {**p["nn"], "w2": p["nn"]["w2"].at[0, 0].set(v)}}

    g_fd_w = fd(lambda p: p["nn"]["w2"][0, 0], set_w)
    np.testing.assert_allclose(float(g["nn"]["w2"][0, 0]), float(g_fd_w),
                               rtol=1e-4, atol=1e-10)

    # initial-state gradient
    def loss_y0(y):
        ys = odeint(f, y, ts, params, solver=solver, rtol=1e-8, atol=1e-10,
                    mode="scan", max_steps_per_interval=64)
        return jnp.sum(ys[-1] ** 2)

    gy = jax.grad(loss_y0)(y0)
    eps = 1e-6
    gy_fd = (loss_y0(y0.at[0].add(eps)) - loss_y0(y0.at[0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(gy[0]), float(gy_fd), rtol=1e-4)


def test_protocol_rollout_gradient_matches_fd():
    """The dosing optimizer's gradient through the closed-loop rollout
    (scan of solves + the sliding-scale law) matches central differences in
    (gain, target) — f64 CPU, away from the clip boundaries."""
    from hybrid_ode_tpu.models.protocol import closed_loop_rollout, glycemic_risk

    jax.config.update("jax_enable_x64", True)
    try:
        cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                           mode="scan", exog_insulin="mech")
        params = init_hybrid_params(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float64)
        params["ode"]["k_ex"] = jnp.asarray(10.0, jnp.float64)
        B, T = 2, 9
        base = jnp.array([14.0, 100.0, 90.0, 20.0, 0.0, 1.2], jnp.float64)
        batch = {
            "initial_state": jnp.broadcast_to(base, (B, 6))
            * (1 + 0.05 * jnp.arange(B, dtype=jnp.float64)[:, None]),
            "time_points": jnp.broadcast_to(
                jnp.linspace(0.0, 2.0, T, dtype=jnp.float64), (B, T)),
            "external_inputs": {"meal": jnp.zeros((B, T), jnp.float64)},
            "mask": jnp.ones((B, T), jnp.float64),
            "observations": jnp.zeros((B, T, 6), jnp.float64),
        }
        norm = (np.zeros(6), np.ones(6))

        def risk(gain, target):
            g = closed_loop_rollout(params, batch, cfg, gain, target,
                                    norm=norm, check_every=4)["glucose"]
            return glycemic_risk(g)

        gain0, target0 = jnp.asarray(200.0), jnp.asarray(6.0)
        dg, dt = jax.grad(risk, argnums=(0, 1))(gain0, target0)
        eps = 1e-4
        fd_g = (risk(gain0 + eps, target0) - risk(gain0 - eps, target0)) / (2 * eps)
        eps_t = 1e-5
        fd_t = (risk(gain0, target0 + eps_t) - risk(gain0, target0 - eps_t)) / (2 * eps_t)
        assert float(jnp.abs(dg)) > 0 and float(jnp.abs(dt)) > 0
        np.testing.assert_allclose(float(dg), float(fd_g), rtol=1e-4)
        np.testing.assert_allclose(float(dt), float(fd_t), rtol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)
