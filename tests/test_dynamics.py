"""Vector-field numerics tests (tier parity: reference tests/test_ode_jacobians.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ode_tpu.dynamics import (
    mechanistic_field,
    steady_state,
    check_mass_balance,
    fourgi_field,
    fourgi_initial_state,
)
from hybrid_ode_tpu.dynamics.ode_core import make_ode_params
from hybrid_ode_tpu.dynamics.fourgi import fourgi_params
from hybrid_ode_tpu.dynamics.residual import (
    init_mlp_params,
    mlp_apply,
    residual_apply,
    feature_importance,
    mlp_l2,
)
from hybrid_ode_tpu.dynamics.controls import make_controls, eval_controls


PHYS_STATE = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])


def _fd_jacobian(fn, y, eps=1e-4):
    """Central-difference Jacobian (reference test helper analogue,
    tests/test_ode_jacobians.py:17-55)."""
    n = y.shape[0]
    out0 = fn(y)
    J = np.zeros((out0.shape[0], n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = eps
        J[:, j] = (np.asarray(fn(y + e)) - np.asarray(fn(y - e))) / (2 * eps)
    return J


def test_ode_jacobian_matches_fd(x64):
    params = make_ode_params(dtype=jnp.float64)
    fn = lambda y: mechanistic_field(0.0, y, params, None)
    y = PHYS_STATE.astype(jnp.float64)
    J_ad = np.asarray(jax.jacobian(fn)(y))
    J_fd = _fd_jacobian(fn, np.asarray(y))
    np.testing.assert_allclose(J_ad, J_fd, rtol=1e-5, atol=1e-7)


def test_batched_field_shapes_and_no_nan():
    params = make_ode_params()
    key = jax.random.PRNGKey(0)
    y = jnp.abs(PHYS_STATE[None, :] * (1 + 0.2 * jax.random.normal(key, (7, 6))))
    dy = mechanistic_field(0.0, y, params, None)
    assert dy.shape == (7, 6)
    assert jnp.all(jnp.isfinite(dy))
    # gradient flow through batch
    g = jax.grad(lambda yy: jnp.sum(mechanistic_field(0.0, yy, params, None) ** 2))(y)
    assert jnp.all(jnp.isfinite(g))


def test_field_responds_to_inputs():
    """Outputs differ under meal vs tVNS (reference :134-170). The mechanistic
    field ignores tVNS by design; meal must shift dG/dt one-for-one."""
    params = make_ode_params()
    base = mechanistic_field(0.0, PHYS_STATE, params, None)
    with_meal = mechanistic_field(0.0, PHYS_STATE, params, {"meal": jnp.asarray(2.0)})
    assert float(with_meal[0] - base[0]) == pytest.approx(2.0, rel=1e-5)
    np.testing.assert_allclose(np.asarray(with_meal[1:]), np.asarray(base[1:]))
    # GD suppresses gastric-emptying loss of glucose
    with_gd = mechanistic_field(0.0, PHYS_STATE, params, {"GD": jnp.asarray(1000.0)})
    assert float(with_gd[0]) > float(base[0])


def test_field_stability_at_extremes():
    """No NaN/Inf in outputs and grads at extreme states (reference :173-206),
    including GD == 0 where naive pow would NaN the gradient."""
    params = make_ode_params()
    extremes = jnp.array(
        [
            [0.1, 0.0, 0.0, 0.0, 0.0, 0.0],
            [30.0, 1000.0, 500.0, 400.0, 1.0, 10.0],
            [2.0, 60.0, 80.0, 0.0, 0.0, 1.0],
        ]
    )
    for i in range(extremes.shape[0]):
        dy = mechanistic_field(0.0, extremes[i], params, {"GD": jnp.asarray(0.0)})
        assert jnp.all(jnp.isfinite(dy))
    g = jax.grad(
        lambda p: jnp.sum(
            mechanistic_field(0.0, extremes, p, {"GD": jnp.zeros(3)}) ** 2
        )
    )(params)
    for k, v in g.items():
        assert jnp.all(jnp.isfinite(v)), k


def test_steady_state_and_mass_balance():
    params = make_ode_params()
    ss = steady_state(params)
    assert ss.shape == (6,)
    checks = check_mass_balance(PHYS_STATE)
    assert bool(checks["non_negative"])
    assert bool(checks["glucose_range"])


def test_mlp_zero_init_outputs_zero():
    """Zero-initialised output layer => hybrid starts as pure ODE
    (reference models/nn_residual.py:83-98)."""
    params = init_mlp_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 9))
    out = mlp_apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # hidden layers are NOT zero
    assert float(jnp.abs(params["w0"]).sum()) > 0


def test_mlp_gradients_flow_after_perturbation():
    params = init_mlp_params(jax.random.PRNGKey(0))
    # perturb output layer so gradients are nonzero (reference
    # tests/test_gradient_correctness.py:18-62 re-initialises similarly)
    params["w4"] = 0.01 * jax.random.normal(jax.random.PRNGKey(2), params["w4"].shape)

    def loss(p):
        out = residual_apply(p, 0.5, PHYS_STATE, PHYS_STATE[3], 0.0)
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(total) and total > 0


@pytest.mark.parametrize("activation", ["relu", "tanh", "elu", "leaky_relu"])
def test_mlp_activations(activation):
    params = init_mlp_params(jax.random.PRNGKey(0))
    out = residual_apply(params, 0.0, PHYS_STATE, 1.0, 0.0, activation)
    assert out.shape == (6,)


def test_feature_importance_shape():
    params = init_mlp_params(jax.random.PRNGKey(0))
    params["w4"] = 0.01 * jax.random.normal(jax.random.PRNGKey(2), params["w4"].shape)
    imp = feature_importance(params, 0.0, PHYS_STATE[None, :], jnp.asarray([1.0]), jnp.asarray([0.0]))
    assert imp.shape == (9,)
    assert jnp.all(imp >= 0)


def test_mlp_l2_counts_weights_only():
    params = init_mlp_params(jax.random.PRNGKey(0))
    params = {k: jnp.ones_like(v) for k, v in params.items()}
    expected = sum(v.size for k, v in params.items() if k.startswith("w"))
    assert float(mlp_l2(params, 1.0)) == pytest.approx(expected)


def test_controls_interpolation():
    ts = jnp.array([0.0, 1.0, 2.0])
    ctrl = make_controls(ts, {"meal": jnp.array([0.0, 2.0, 0.0]), "tVNS": jnp.asarray(1.0)})
    vals = eval_controls(ctrl, jnp.asarray(0.5))
    assert float(vals["meal"]) == pytest.approx(1.0)
    assert float(vals["tVNS"]) == pytest.approx(1.0)
    # clamping beyond the grid
    assert float(eval_controls(ctrl, jnp.asarray(5.0))["meal"]) == pytest.approx(0.0)


def test_fourgi_field_finite_and_baseline_stationaryish(x64):
    """At baseline amounts with no meal the 4GI system should be near
    stationary (production rates were solved for that)."""
    p = fourgi_params("T2DM", dtype=jnp.float64)
    y0 = fourgi_initial_state(p)
    dy = fourgi_field(0.0, y0, p, None)
    assert jnp.all(jnp.isfinite(dy))
    rel = jnp.abs(dy) / (jnp.abs(y0) + 1.0)
    # GLP-1 (index 2) is NOT stationary at baseline in the reference model:
    # its KINglp carries an extra VCglp factor (amount/concentration mix-up,
    # reference generate4GI.py:112). Reproduced verbatim for data parity.
    rel = rel.at[2].set(0.0)
    assert float(jnp.max(rel)) < 0.05

    # meal perturbs glucose and incretins
    dy_meal = fourgi_field(0.0, y0, p, {"meal_rate": jnp.asarray(75.0)})
    assert float(dy_meal[0]) > float(dy[0])
    assert float(dy_meal[2]) > float(dy[2])  # GLP-1 secretion up
