"""Solver verification against analytic solutions and the SciPy oracle.

Tier the reference lacks entirely (SURVEY.md §4): the reference trusts
scipy; we ARE the solver, so we gate against (a) closed-form solutions,
(b) scipy solve_ivp in float64, (c) vmap consistency, (d) gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from hybrid_ode_tpu.solvers import odeint
from hybrid_ode_tpu.dynamics import mechanistic_field, steady_state
from hybrid_ode_tpu.dynamics.ode_core import make_ode_params


def _linear_field(t, y, args):
    lam = args["lam"]
    return lam * y


def _stiff_field(t, y, args):
    # classic stiff test: y' = -50 (y - cos t)
    return -50.0 * (y - jnp.cos(t))


ADAPTIVE = ["dopri5", "dop853", "bosh3", "radau", "bdf", "bdf2"]
ALL = ADAPTIVE + ["rk4"]


@pytest.mark.parametrize("solver", ALL)
def test_exponential_decay_exact(solver, x64):
    """dy/dt = -y has y(t) = e^{-t}; every solver must nail it."""
    y0 = jnp.ones(4, jnp.float64)
    ts = jnp.linspace(0.0, 3.0, 13, dtype=jnp.float64)
    args = {"lam": jnp.asarray(-1.0, jnp.float64)}
    # BDF2 is order 2: meeting rtol=1e-8 over unit intervals takes ~70 steps
    # per interval; give it a realistic tolerance instead of a huge budget.
    rtol, atol = (1e-8, 1e-10) if solver != "bdf2" else (1e-6, 1e-8)
    ys = odeint(_linear_field, y0, ts, args, solver=solver, rtol=rtol, atol=atol,
                substeps=64, max_steps_per_interval=128)
    expected = np.exp(-np.asarray(ts))[:, None] * np.ones(4)
    tol = 1e-6 if solver not in ("bdf2",) else 1e-4
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=tol, atol=tol)


@pytest.mark.parametrize("solver,scipy_method", [
    ("dopri5", "RK45"),
    ("dop853", "DOP853"),
    ("radau", "Radau"),
    ("bdf", "BDF"),
])
def test_mechanistic_vs_scipy_oracle(solver, scipy_method, x64):
    """Integrate the real 6-state field and compare against solve_ivp."""
    params = make_ode_params(dtype=jnp.float64)
    y0 = np.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    ts = np.linspace(0.0, 5.0, 61)

    def f_np(t, y):
        return np.asarray(mechanistic_field(t, jnp.asarray(y), params, None))

    sol = solve_ivp(f_np, (ts[0], ts[-1]), y0, t_eval=ts, method=scipy_method,
                    rtol=1e-9, atol=1e-11)
    assert sol.success

    ys = odeint(
        lambda t, y, a: mechanistic_field(t, y, a, None),
        jnp.asarray(y0), jnp.asarray(ts), params,
        solver=solver, rtol=1e-8, atol=1e-10, max_steps_per_interval=64,
    )
    np.testing.assert_allclose(np.asarray(ys), sol.y.T, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("solver,rtol,atol,steps,tol", [
    ("radau", 1e-7, 1e-9, 256, 1e-5),
    # variable-order BDF(1-5): scipy-BDF-class accuracy at strict tolerance
    ("bdf", 1e-7, 1e-9, 256, 1e-5),
    # order-2 BDF needs ~(tol)^(1/3) steps through the fast transient;
    # test it at a tolerance appropriate to its order
    ("bdf2", 1e-4, 1e-6, 512, 2e-3),
])
def test_stiff_problem(solver, rtol, atol, steps, tol, x64):
    """Implicit solvers must handle a stiff linear problem accurately."""
    y0 = jnp.array([0.0], jnp.float64)
    ts = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float64)
    ys, stats = odeint(_stiff_field, y0, ts, None, solver=solver, rtol=rtol, atol=atol,
                       max_steps_per_interval=steps, return_stats=True)
    assert bool(stats.success)
    # exact solution of y' = -50(y - cos t), y(0)=0
    t = np.asarray(ts)
    lam = 50.0
    exact = (lam**2 / (lam**2 + 1)) * (np.cos(t) + np.sin(t) / lam - np.exp(-lam * t))
    np.testing.assert_allclose(np.asarray(ys)[:, 0], exact, rtol=tol, atol=tol)


def test_while_matches_scan():
    """Fast inference path must agree with the differentiable path."""
    params = make_ode_params()
    y0 = steady_state(params) + 0.5
    ts = jnp.linspace(0.0, 5.0, 21)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)
    ys_scan = odeint(f, y0, ts, params, solver="dopri5", rtol=1e-5, atol=1e-7, mode="scan")
    ys_while = odeint(f, y0, ts, params, solver="dopri5", rtol=1e-5, atol=1e-7, mode="while")
    np.testing.assert_allclose(np.asarray(ys_scan), np.asarray(ys_while), rtol=1e-5, atol=1e-5)


def test_vmap_consistency():
    """vmapped batch solve == per-element solve (the reference's serial loop
    `models/hybrid_ode_nn.py:184` becomes this single vmap)."""
    params = make_ode_params()
    key = jax.random.PRNGKey(0)
    y0s = steady_state(params)[None, :] * (1.0 + 0.1 * jax.random.normal(key, (5, 6)))
    y0s = jnp.abs(y0s)
    ts = jnp.linspace(0.0, 5.0, 13)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    batched = jax.vmap(lambda y0: odeint(f, y0, ts, params, solver="dopri5"))(y0s)
    single = jnp.stack([odeint(f, y0s[i], ts, params, solver="dopri5") for i in range(5)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("solver", ["dopri5", "rk4", "radau", "bdf"])
def test_gradients_flow(solver):
    """Gradients flow through the integrator — the reference's central flaw
    (no_grad integration) fixed by construction."""
    params = make_ode_params()
    ts = jnp.linspace(0.0, 2.0, 7)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    def loss(p, y0):
        ys = odeint(f, y0, ts, p, solver=solver, rtol=1e-4, atol=1e-6,
                    max_steps_per_interval=12)
        return jnp.sum(ys[-1] ** 2)

    y0 = steady_state(params) + 0.3
    g_params, g_y0 = jax.grad(loss, argnums=(0, 1))(params, y0)
    assert jnp.all(jnp.isfinite(g_y0))
    # a_GI influences insulin which influences glucose: must be nonzero
    assert jnp.isfinite(g_params["a_GI"]) and g_params["a_GI"] != 0.0
    assert jnp.all(jnp.isfinite(jnp.asarray(list(g_params.values()))))


def test_gradient_matches_finite_difference(x64):
    """Discrete-adjoint gradient vs central finite differences on a scalar param."""
    params = make_ode_params(dtype=jnp.float64)
    ts = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float64)
    y0 = (steady_state(params) + 0.3).astype(jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    def loss_of(aGI):
        p = dict(params, a_GI=aGI)
        ys = odeint(f, y0, ts, p, solver="dopri5", rtol=1e-9, atol=1e-11,
                    max_steps_per_interval=64)
        return jnp.sum(ys[-1] ** 2)

    a0 = jnp.asarray(0.0104, jnp.float64)
    g_ad = jax.grad(loss_of)(a0)
    eps = 1e-6
    g_fd = (loss_of(a0 + eps) - loss_of(a0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_ad), float(g_fd), rtol=1e-4)


def test_backsolve_adjoint_close_to_discrete(x64):
    """Continuous adjoint ~ discrete adjoint on a smooth problem."""
    params = make_ode_params(dtype=jnp.float64)
    ts = jnp.linspace(0.0, 1.5, 4, dtype=jnp.float64)
    y0 = (steady_state(params) + 0.2).astype(jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    def loss(p, adjoint):
        ys = odeint(f, y0, ts, p, solver="dopri5", rtol=1e-9, atol=1e-11,
                    max_steps_per_interval=64, adjoint=adjoint)
        return jnp.sum(ys**2)

    g_disc = jax.grad(lambda p: loss(p, "discrete"))(params)
    g_back = jax.grad(lambda p: loss(p, "backsolve"))(params)
    for k in g_disc:
        np.testing.assert_allclose(
            float(g_disc[k]), float(g_back[k]), rtol=1e-3, atol=1e-8,
            err_msg=f"param {k}",
        )


def test_solver_stats():
    params = make_ode_params()
    y0 = steady_state(params)
    ts = jnp.linspace(0.0, 5.0, 11)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)
    ys, stats = odeint(f, y0, ts, params, solver="dopri5", return_stats=True)
    assert bool(stats.success)
    assert int(stats.n_accepted) >= 10


def test_dense_output_dopri5(x64):
    """mode='dense': free-running steps + CONTD5 interpolation. Far fewer
    field evals than the grid-driven path on smooth dynamics, interior
    accuracy at the interpolant's order, gradients flow."""
    params = make_ode_params(dtype=jnp.float64)
    y0 = jnp.asarray(steady_state(params), jnp.float64) + 0.3
    ts = jnp.linspace(0.0, 5.0, 61, dtype=jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    ys_d, st_d = odeint(f, y0, ts, params, solver="dopri5", mode="dense",
                        rtol=1e-7, atol=1e-9, return_stats=True)
    ys_i = odeint(f, y0, ts, params, solver="dopri5", mode="scan",
                  rtol=1e-9, atol=1e-11, max_steps_per_interval=64)
    assert bool(st_d.success)
    # dynamics-limited stepping: the grid-driven path needs >= 60 steps
    assert int(st_d.n_accepted) < 20
    np.testing.assert_allclose(np.asarray(ys_d), np.asarray(ys_i),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda p: jnp.sum(odeint(f, y0, ts, p, solver="dopri5",
                                          mode="dense", rtol=1e-6,
                                          atol=1e-8)[-1] ** 2))(params)
    assert np.isfinite(float(g["a_GI"])) and float(g["a_GI"]) != 0.0

def test_dense_output_dop853(x64):
    """mode='dense' for dop853: 8th-order free-running steps + 7th-order
    continuous extension (round 3; parity: scipy dense `t_eval`,
    reference models/hybrid_ode_nn.py:240-241). Fewer steps than dense
    dopri5 at equal tolerance; gradients flow."""
    params = make_ode_params(dtype=jnp.float64)
    y0 = jnp.asarray(steady_state(params), jnp.float64) + 0.3
    ts = jnp.linspace(0.0, 5.0, 61, dtype=jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    ys_d, st_d = odeint(f, y0, ts, params, solver="dop853", mode="dense",
                        rtol=1e-7, atol=1e-9, return_stats=True)
    ys_i = odeint(f, y0, ts, params, solver="dopri5", mode="scan",
                  rtol=1e-9, atol=1e-11, max_steps_per_interval=64)
    assert bool(st_d.success)
    _, st_5 = odeint(f, y0, ts, params, solver="dopri5", mode="dense",
                     rtol=1e-7, atol=1e-9, return_stats=True)
    assert int(st_d.n_accepted) <= int(st_5.n_accepted)
    np.testing.assert_allclose(np.asarray(ys_d), np.asarray(ys_i),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda p: jnp.sum(odeint(f, y0, ts, p, solver="dop853",
                                          mode="dense", rtol=1e-6,
                                          atol=1e-8)[-1] ** 2))(params)
    assert np.isfinite(float(g["a_GI"])) and float(g["a_GI"]) != 0.0


def test_dense_output_radau(x64):
    """mode='dense' for radau: free-running stiff steps + the collocation
    polynomial (RADAU5 CONTR5) as the continuous extension (round 3; closes
    the radau half of VERDICT r2 missing #5). On a stiff problem with a
    sparse output grid the grid-driven path restarts its step ramp every
    interval; the dense path crosses the transient once."""
    y0 = jnp.array([0.0], jnp.float64)
    ts = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float64)
    ys_d, st_d = odeint(_stiff_field, y0, ts, None, solver="radau",
                        mode="dense", rtol=1e-7, atol=1e-9,
                        max_steps_per_interval=64, return_stats=True)
    assert bool(st_d.success)
    t = np.asarray(ts)
    lam = 50.0
    exact = (lam**2 / (lam**2 + 1)) * (np.cos(t) + np.sin(t) / lam - np.exp(-lam * t))
    np.testing.assert_allclose(np.asarray(ys_d)[:, 0], exact, rtol=1e-5, atol=1e-5)

    # interior accuracy of the collocation interpolant on the smooth hybrid
    # field, vs a tight grid-driven reference
    params = make_ode_params(dtype=jnp.float64)
    y0h = jnp.asarray(steady_state(params), jnp.float64) + 0.3
    tsh = jnp.linspace(0.0, 5.0, 61, dtype=jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)
    ys_r, st_r = odeint(f, y0h, tsh, params, solver="radau", mode="dense",
                        rtol=1e-7, atol=1e-9, return_stats=True)
    ys_i = odeint(f, y0h, tsh, params, solver="dopri5", mode="scan",
                  rtol=1e-9, atol=1e-11, max_steps_per_interval=64)
    assert bool(st_r.success)
    # dynamics-limited stepping, not grid-limited (61 points)
    assert int(st_r.n_accepted) < 40
    np.testing.assert_allclose(np.asarray(ys_r), np.asarray(ys_i),
                               rtol=5e-5, atol=5e-5)

    g = jax.grad(lambda p: jnp.sum(odeint(f, y0h, tsh, p, solver="radau",
                                          mode="dense", rtol=1e-5,
                                          atol=1e-7)[-1] ** 2))(params)
    assert np.isfinite(float(g["a_GI"])) and float(g["a_GI"]) != 0.0


def test_dense_output_bdf(x64):
    """mode='dense' for variable-order BDF: the difference array already IS
    the interpolating polynomial (scipy BdfDenseOutput backward-difference
    form) — dense reporting costs no field evaluations. Completes dense
    output across the adaptive suite (VERDICT r2 missing #5)."""
    y0 = jnp.array([0.0], jnp.float64)
    ts = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float64)
    ys_d, st_d = odeint(_stiff_field, y0, ts, None, solver="bdf",
                        mode="dense", rtol=1e-7, atol=1e-9,
                        max_steps_per_interval=128, return_stats=True)
    assert bool(st_d.success)
    t = np.asarray(ts)
    lam = 50.0
    exact = (lam**2 / (lam**2 + 1)) * (np.cos(t) + np.sin(t) / lam - np.exp(-lam * t))
    np.testing.assert_allclose(np.asarray(ys_d)[:, 0], exact, rtol=2e-5, atol=2e-5)

    # smooth-field interpolant accuracy vs tight grid-driven reference
    params = make_ode_params(dtype=jnp.float64)
    y0h = jnp.asarray(steady_state(params), jnp.float64) + 0.3
    tsh = jnp.linspace(0.0, 5.0, 61, dtype=jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)
    ys_b, st_b = odeint(f, y0h, tsh, params, solver="bdf", mode="dense",
                        rtol=1e-7, atol=1e-9, return_stats=True)
    ys_i = odeint(f, y0h, tsh, params, solver="dopri5", mode="scan",
                  rtol=1e-9, atol=1e-11, max_steps_per_interval=64)
    assert bool(st_b.success)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_i),
                               rtol=5e-5, atol=5e-5)

    g = jax.grad(lambda p: jnp.sum(odeint(f, y0h, tsh, p, solver="bdf",
                                          mode="dense", rtol=1e-5,
                                          atol=1e-7)[-1] ** 2))(params)
    assert np.isfinite(float(g["a_GI"])) and float(g["a_GI"]) != 0.0


def test_seminorm_excludes_passive_components(x64):
    """norm_weights seminorm (Kidger et al. 2021): zero-weighted components
    don't drive step control. A fast passive integral (never feeding back)
    forces many steps under the full norm; the seminorm ignores it with no
    accuracy loss on the controlled component."""
    def f(t, y, args):
        # y0: slow decay (the 'real' state); y1: integral of cos(80 t)
        return jnp.stack([-y[0], jnp.cos(80.0 * t)])

    y0 = jnp.array([1.0, 0.0], jnp.float64)
    ts = jnp.linspace(0.0, 2.0, 3, dtype=jnp.float64)
    kw = dict(solver="dopri5", rtol=1e-8, atol=1e-10,
              max_steps_per_interval=512, mode="while", return_stats=True)
    ys_full, st_full = odeint(f, y0, ts, None, **kw)
    ys_semi, st_semi = odeint(f, y0, ts, None,
                              norm_weights=jnp.array([1.0, 0.0]), **kw)
    assert bool(st_full.success) and bool(st_semi.success)
    # controlled component stays accurate under the seminorm
    np.testing.assert_allclose(
        np.asarray(ys_semi[:, 0]), np.exp(-np.asarray(ts)), rtol=1e-6)
    # and the fast passive component no longer drives step count
    assert int(st_semi.n_accepted) < int(st_full.n_accepted) // 2, (
        int(st_semi.n_accepted), int(st_full.n_accepted))


def test_backsolve_seminorm_matches_full_norm_grads(x64):
    """The backsolve adjoint's default seminorm changes step control only —
    gradients match the full-norm backward solve."""
    from hybrid_ode_tpu.solvers.adjoint import odeint_backsolve

    params = make_ode_params(dtype=jnp.float64)
    ts = jnp.linspace(0.0, 1.5, 4, dtype=jnp.float64)
    y0 = (steady_state(params) + 0.2).astype(jnp.float64)
    f = lambda t, y, a: mechanistic_field(t, y, a, None)

    def loss(p, seminorm):
        ys = odeint_backsolve(f, y0, ts, p, solver="dopri5",
                              rtol=1e-9, atol=1e-11,
                              max_steps_per_interval=64, seminorm=seminorm)
        return jnp.sum(ys**2)

    g_semi = jax.grad(lambda p: loss(p, True))(params)
    g_full = jax.grad(lambda p: loss(p, False))(params)
    for k in g_full:
        np.testing.assert_allclose(
            float(g_semi[k]), float(g_full[k]), rtol=1e-4, atol=1e-10,
            err_msg=f"param {k}")


# --------------------------------------------------------------------------
# Batch-synchronized adaptive stepping (solvers/sync.py, round 5)
# --------------------------------------------------------------------------

def _batched_forced_decay(t, y, a):
    return -a * y + jnp.sin(3.0 * t)


@pytest.mark.parametrize("solver", ["dopri5", "bosh3", "dop853"])
def test_sync_matches_per_sample_adaptive(solver, x64):
    """Shared-controller solve must agree with the tight per-sample scan
    solve on per-sample output grids and batched args."""
    from hybrid_ode_tpu.solvers.explicit import odeint_erk
    from hybrid_ode_tpu.solvers.sync import odeint_erk_sync
    from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

    tab = TABLEAUS[solver]
    # bosh3's order-2 error estimate needs ~100 steps/interval at 1e-7 —
    # run the low-order method at a tolerance it is meant for
    rtol, atol = (1e-5, 1e-7) if solver == "bosh3" else (1e-7, 1e-9)
    B, n, T = 6, 3, 11
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.uniform(0.3, 2.0, (B, n)))
    y0 = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 4.0, T), (B, T)) * jnp.asarray(
        rng.uniform(0.8, 1.2, (B, 1)))  # per-sample clocks

    ys, stats = odeint_erk_sync(_batched_forced_decay, y0, ts, lam, tab,
                                rtol=rtol, atol=atol, args_axes=0,
                                max_steps_per_interval=64,
                                total_step_budget=64 * (T - 1),
                                return_stats=True)
    assert bool(stats.success)
    # scipy is the oracle (a per-sample scan reference at very tight rtol
    # silently exhausts max_steps_per_interval and integrates short)
    ys_ref = np.empty((B, T, n))
    for i in range(B):
        for d in range(n):
            sol = solve_ivp(
                lambda t, y, a=float(lam[i, d]): -a * y + np.sin(3.0 * t),
                (float(ts[i, 0]), float(ts[i, -1])), [float(y0[i, d])],
                t_eval=np.asarray(ts[i]), rtol=1e-10, atol=1e-12)
            ys_ref[i, :, d] = sol.y[0]
    tol = 30.0 * rtol
    np.testing.assert_allclose(np.asarray(ys), ys_ref, rtol=tol,
                               atol=tol / 100)


def test_sync_gradients_match_finite_differences(x64):
    """Two-pass gradients (differentiable re-integration on the accepted
    mesh) against central finite differences, for y0 and batched args."""
    from hybrid_ode_tpu.solvers.sync import odeint_erk_sync
    from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

    tab = TABLEAUS["dopri5"]
    B, n, T = 4, 2, 7
    rng = np.random.default_rng(1)
    lam = jnp.asarray(rng.uniform(0.3, 1.5, (B, n)))
    y0 = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 2.0, T), (B, T))

    def loss(y0_, lam_):
        ys = odeint_erk_sync(_batched_forced_decay, y0_, ts, lam_, tab,
                             rtol=1e-8, atol=1e-10, args_axes=0,
                             total_step_budget=32 * (T - 1))
        return jnp.sum(ys[:, -1] ** 2)

    g_y0, g_lam = jax.grad(loss, argnums=(0, 1))(y0, lam)
    eps = 1e-5
    for (arr, g, i, j) in ((y0, g_y0, 2, 1), (lam, g_lam, 1, 0)):
        if arr is y0:
            fd = (loss(y0.at[i, j].add(eps), lam)
                  - loss(y0.at[i, j].add(-eps), lam)) / (2 * eps)
        else:
            fd = (loss(y0, lam.at[i, j].add(eps))
                  - loss(y0, lam.at[i, j].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=1e-4,
                                   atol=1e-10)


def test_sync_global_kink_stops_resolve_gridded_impulse(x64):
    """span='global' (free-running CONTD5 dense output) must take FEWER
    shared steps than the T-1 the interval driver is forced to, while
    still integrating a gridded control impulse exactly: the impulse's
    grid points become forced step boundaries via stop_signals
    (solvers/sync.py _control_kink_stops), so no quadrature stage can
    straddle it unsampled."""
    from hybrid_ode_tpu.solvers.sync import _control_kink_stops, odeint_erk_sync
    from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

    B, n, T = 4, 2, 41
    rng = np.random.default_rng(3)
    lam = jnp.asarray(rng.uniform(0.3, 1.0, (B, n)))
    y0 = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 4.0, T), (B, T))
    u = np.zeros((B, T))
    u[:, 13] = 5.0  # gridded impulse, linearly interpolated by the field
    u_j = jnp.asarray(u)

    def f(t, y, a):
        lam_i, u_i, ts_i = a
        return -lam_i * y + jnp.interp(t, ts_i, u_i)

    args = (lam, u_j, ts)
    kw = dict(rtol=1e-7, atol=1e-9, args_axes=(0, 0, 0), return_stats=True)
    tab = TABLEAUS["dopri5"]

    stops = _control_kink_stops([u_j], T, jnp.float64)
    assert float(stops[13]) == 13.0 and float(stops[12]) == 12.0
    assert float(stops[20]) > T  # smooth point: no forced boundary

    ys_ref, st_ref = odeint_erk_sync(f, y0, ts, args, tab,
                                     span="interval", **kw)
    assert bool(st_ref.success)
    ys_g, st_g = odeint_erk_sync(f, y0, ts, args, tab, span="global",
                                 stop_signals=[u_j], **kw)
    assert bool(st_g.success)
    assert int(st_g.n_accepted) < T - 1  # strictly fewer shared steps
    np.testing.assert_allclose(np.asarray(ys_g), np.asarray(ys_ref),
                               rtol=3e-6, atol=3e-8)


def test_sync_budget_overflow_flags_failure():
    """Dropping accepted steps past total_step_budget must clear
    StepStats.success (the static-shape contract in the module docstring)."""
    from hybrid_ode_tpu.solvers.sync import odeint_erk_sync
    from hybrid_ode_tpu.solvers.tableaus import TABLEAUS

    B, n, T = 3, 2, 9
    y0 = jnp.ones((B, n), jnp.float32)
    ts = jnp.broadcast_to(jnp.linspace(0.0, 3.0, T), (B, T))
    lam = jnp.full((B, n), 1.0, jnp.float32)
    _, stats = odeint_erk_sync(_batched_forced_decay, y0, ts, lam,
                               TABLEAUS["dopri5"], rtol=1e-6, atol=1e-8,
                               args_axes=0, total_step_budget=2,
                               return_stats=True)
    assert not bool(stats.success)
