"""Hybrid-model unit tests: composition, functional param substitution,
multiple shooting, loss component semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ode_tpu.dynamics.controls import Controls
from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    batched_forward,
    flat_to_params,
    forward,
    forward_with_params,
    hybrid_field,
    hybrid_loss,
    init_hybrid_params,
    params_to_flat,
    segment_batch,
)

FAST = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2, mode="scan")
PHYS = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])


def _batch(B=4, T=9):
    key = jax.random.PRNGKey(0)
    y0 = jnp.abs(PHYS[None, :] * (1 + 0.05 * jax.random.normal(key, (B, 6))))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 2.0, T), (B, T))
    return {
        "initial_state": y0,
        "observations": jnp.broadcast_to(PHYS, (B, T, 6)) * 1.01,
        "time_points": ts,
        "external_inputs": {"meal": jnp.zeros((B, T)).at[:, 2].set(1.0), "tVNS": jnp.zeros((B, T))},
        "mask": jnp.ones((B, T)),
    }


def test_hybrid_field_is_sum_of_parts():
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    params["nn"]["w2"] = 0.01 * jax.random.normal(jax.random.PRNGKey(1), params["nn"]["w2"].shape)
    from hybrid_ode_tpu.dynamics.ode_core import mechanistic_field
    from hybrid_ode_tpu.dynamics.residual import residual_apply

    t = jnp.asarray(0.5)
    mech = mechanistic_field(t, PHYS, params["ode"], {})
    res = residual_apply(params["nn"], t, PHYS, PHYS[3], jnp.asarray(0.0))
    total = hybrid_field(t, PHYS, params, None, FAST)
    np.testing.assert_allclose(np.asarray(total), np.asarray(mech + res), rtol=1e-6)

    # use_nn=False drops the residual (ablation parity)
    cfg_no_nn = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2, use_nn=False)
    total_no_nn = hybrid_field(t, PHYS, params, None, cfg_no_nn)
    np.testing.assert_allclose(np.asarray(total_no_nn), np.asarray(mech), rtol=1e-6)


def test_flat_params_roundtrip_and_forward_with_params():
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    flat = params_to_flat(params)
    assert "ode_a_GI" in flat and "nn_w0" in flat
    rebuilt = flat_to_params(flat, params)
    for grp in ("ode", "nn"):
        for k in params[grp]:
            np.testing.assert_array_equal(np.asarray(params[grp][k]), np.asarray(rebuilt[grp][k]))

    # substituting a parameter changes the forward output
    ts = jnp.linspace(0.0, 2.0, 5)
    base_traj = forward(params, PHYS, ts, None, FAST)
    new_traj = forward_with_params({"ode_k_I": jnp.asarray(0.5)}, params, PHYS, ts, None, FAST)
    assert float(jnp.max(jnp.abs(base_traj - new_traj))) > 1e-4
    # and the template is untouched (no mutation — unlike the reference's
    # buffer swap at hybrid_ode_nn.py:381-438)
    assert float(params["ode"]["k_I"]) == pytest.approx(0.025)

    with pytest.raises(KeyError):
        flat_to_params({"bogus_x": jnp.asarray(1.0)}, params)


def test_segment_batch_shapes_and_edges():
    batch = _batch(B=3, T=9)
    seg = segment_batch(batch, 4)  # (9-1)/4 = 2 intervals per segment
    assert seg["observations"].shape == (12, 3, 6)
    assert seg["time_points"].shape == (12, 3)
    # left edges are the observed states
    np.testing.assert_array_equal(
        np.asarray(seg["initial_state"]), np.asarray(seg["observations"][:, 0])
    )
    # segment time grids are contiguous slices
    np.testing.assert_allclose(np.asarray(seg["time_points"][0]), [0.0, 0.25, 0.5])
    np.testing.assert_allclose(np.asarray(seg["time_points"][1]), [0.5, 0.75, 1.0])

    with pytest.raises(ValueError):
        segment_batch(batch, 3)  # 8 % 3 != 0


def test_segment_batch_mask_kills_unobserved_left_edges():
    batch = dict(_batch(B=2, T=9))
    mask = np.ones((2, 9), np.float32)
    mask[0, 4] = 0.0  # left edge of segment 2 (k=2 -> edges at 0 and 4)
    batch["mask"] = jnp.asarray(mask)
    seg = segment_batch(batch, 2)
    m = np.asarray(seg["mask"]).reshape(2, 2, 5)  # (B, k, L+1)
    assert m[0, 1].sum() == 0.0  # whole segment zeroed
    # point 4 is shared: it is also the (unobserved) right edge of segment 1
    assert m[0, 0].sum() == 4.0
    assert m[1].sum() == 10.0


def test_shooting_loss_runs_and_differs():
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    batch = _batch(B=4, T=9)
    key = jax.random.PRNGKey(1)
    cfg_shoot = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                             mode="scan", shooting_segments=4)
    l1, _ = hybrid_loss(params, batch, key, FAST)
    l2, _ = hybrid_loss(params, batch, key, cfg_shoot)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    g = jax.grad(lambda p: hybrid_loss(p, batch, key, cfg_shoot)[0])(params)
    assert np.isfinite(float(jnp.abs(g["nn"]["w2"]).sum()))


def test_physics_loss_midpoint_consistency():
    """On a solver-generated trajectory the midpoint physics residual must be
    tiny (O(h^2) consistency of FD vs midpoint RHS)."""
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    batch = _batch(B=2, T=9)
    # observations = actual model trajectory => physics term ~ discretisation only
    controls = Controls(ts=batch["time_points"],
                        signals={k: v for k, v in batch["external_inputs"].items()})
    traj = batched_forward(params, batch["initial_state"], batch["time_points"], controls, FAST)
    batch["observations"] = traj
    _, comps = hybrid_loss(params, batch, jax.random.PRNGKey(0), FAST, lambda1=1.0)
    # normalized by state scale ~100s; physics mse should be small vs data scale
    assert float(comps["physics"]) < 1.0


def test_loss_mask_excludes_points():
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    batch = dict(_batch(B=2, T=9))
    # corrupt one masked-out observation; loss must not change
    key = jax.random.PRNGKey(0)
    mask = np.ones((2, 9), np.float32)
    mask[0, 3] = 0.0
    batch["mask"] = jnp.asarray(mask)
    l1, _ = hybrid_loss(params, batch, key, FAST, use_physics_loss=False)
    obs = np.asarray(batch["observations"]).copy()
    obs[0, 3] = 1e6
    batch["observations"] = jnp.asarray(obs)
    l2, _ = hybrid_loss(params, batch, key, FAST, use_physics_loss=False)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_hybrid_loss_dense_mode():
    """mode='dense' (free-running dopri5 + interpolation) composes with
    vmap + grad in the training path; solver health flows to metrics."""
    cfg = HybridConfig(solver="dopri5", mode="dense", nn_hidden=16, nn_layers=2,
                       rtol=1e-5, atol=1e-7, max_steps_per_interval=16)
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    B, T = 3, 9
    obs = jnp.abs(jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])[None, None, :]
                  * (1 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 6))))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 2.0, T), (B, T))
    batch = {"initial_state": obs[:, 0], "observations": obs, "time_points": ts,
             "external_inputs": {"meal": jnp.zeros((B, T)).at[:, 3].set(2.0),
                                 "tVNS": jnp.zeros((B, T))}}
    (l, comps), g = jax.value_and_grad(
        lambda p: hybrid_loss(p, batch, jax.random.PRNGKey(2), cfg,
                              lambda1=1.0, lambda2=0.01), has_aux=True)(params)
    assert np.isfinite(float(l))
    assert float(comps["solver_success"]) == 1.0
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_exog_insulin_mechanistic_routing():
    """Round-4 causal routing: with exog_insulin='mech' the tVNS channel (IV
    insulin rate) drives the mechanistic insulin compartment via the
    learnable gain k_ex, the NN is blinded to the raw rate, and the induced
    glucose response has the causal sign (insulin up -> glucose down)."""
    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    assert "k_ex" in params["ode"]
    params["ode"]["k_ex"] = jnp.asarray(20.0)

    B, T = 3, 13
    y0 = jnp.broadcast_to(PHYS, (B, 6))
    ts = jnp.broadcast_to(jnp.linspace(0.0, 3.0, T), (B, T))
    dosed = Controls(ts=ts, signals={"tVNS": jnp.ones((B, T))})
    undosed = Controls(ts=ts, signals={"tVNS": jnp.zeros((B, T))})

    tr_dose = batched_forward(params, y0, ts, dosed, cfg)
    tr_none = batched_forward(params, y0, ts, undosed, cfg)
    # insulin (state 1) rises under infusion; glucose (state 0) ends lower
    assert float(tr_dose[:, -1, 1].mean()) > float(tr_none[:, -1, 1].mean())
    assert float(tr_dose[:, -1, 0].mean()) < float(tr_none[:, -1, 0].mean())

    # NN blinding: with k_ex zeroed, 'mech' mode is invariant to the rate
    p0 = dict(params, ode=dict(params["ode"], k_ex=jnp.asarray(0.0)))
    np.testing.assert_allclose(
        np.asarray(batched_forward(p0, y0, ts, dosed, cfg)),
        np.asarray(batched_forward(p0, y0, ts, undosed, cfg)), atol=1e-6)
    # ...whereas 'both' mode still feeds the NN the raw rate
    cfg_both = HybridConfig(solver="rk4", substeps=2, nn_hidden=8,
                            nn_layers=2, mode="scan", exog_insulin="both")
    pb = dict(p0)
    pb["nn"] = dict(pb["nn"],
                    w0=pb["nn"]["w0"] + 0.01,
                    w2=0.01 * jnp.ones_like(pb["nn"]["w2"]))
    d = batched_forward(pb, y0, ts, dosed, cfg_both)
    u = batched_forward(pb, y0, ts, undosed, cfg_both)
    assert float(jnp.abs(d - u).max()) > 1e-5

    # reference-parity default: no k_ex in the pytree, rate is NN-only
    p_ref = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    assert "k_ex" not in p_ref["ode"]


def test_exog_insulin_k_ex_gradient_flows():
    """k_ex is identified through the loss: gradient is nonzero when the
    insulin channel is observed under a nonzero rate signal."""
    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    batch["external_inputs"]["tVNS"] = jnp.ones_like(batch["time_points"])

    def loss(p):
        return hybrid_loss(p, batch, jax.random.PRNGKey(1), cfg,
                           lambda1=0.0, lambda2=0.0)[0]

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["ode"]["k_ex"])) > 1e-8


def _protocol_batch(B=3, hours=2, steps_per_h=4):
    T = hours * steps_per_h + 1
    ts = jnp.broadcast_to(jnp.linspace(0.0, float(hours), T), (B, T))
    y0 = jnp.broadcast_to(PHYS, (B, 6)) * (1 + 0.1 * jnp.arange(B)[:, None])
    return {
        "initial_state": y0,
        "observations": jnp.broadcast_to(y0[:, None], (B, T, 6)),
        "time_points": ts,
        "external_inputs": {"meal": jnp.zeros((B, T)).at[:, 1].set(0.5)},
        "mask": jnp.ones((B, T)),
    }


def test_closed_loop_rollout_protocol_law():
    """The rollout's rate sequence obeys the sliding-scale law on the
    model's own predicted glucose, and dosing responds causally."""
    from hybrid_ode_tpu.models.protocol import closed_loop_rollout

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["ode"]["k_ex"] = jnp.asarray(10.0)
    batch = _protocol_batch()
    norm = (np.zeros(6), np.ones(6))  # physical == z here

    out = closed_loop_rollout(params, batch, cfg, gain=900.0, target=7.0,
                              norm=norm, check_every=4)
    B, T = batch["time_points"].shape
    assert out["trajectory"].shape == (B, T, 6)
    assert out["rates"].shape == (B, 2)
    # protocol law at t=0: rate = clip(900*(G0-7), 0, 7000)
    expect0 = np.clip(900.0 * (np.asarray(batch["initial_state"][:, 0]) - 7.0),
                      0.0, 7000.0)
    np.testing.assert_allclose(np.asarray(out["rates"][:, 0]), expect0,
                               rtol=1e-5)
    # rate at the second check comes from the model's predicted glucose
    g_check = np.asarray(out["glucose"][:, 4])
    expect1 = np.clip(900.0 * (g_check - 7.0), 0.0, 7000.0)
    np.testing.assert_allclose(np.asarray(out["rates"][:, 1]), expect1,
                               rtol=1e-5)
    # a higher target withholds insulin (causal direction through k_ex)
    out_hi = closed_loop_rollout(params, batch, cfg, gain=900.0, target=20.0,
                                 norm=norm, check_every=4)
    assert float(out_hi["insulin_total"].sum()) == 0.0
    assert (float(out_hi["glucose"][:, -1].mean())
            > float(out["glucose"][:, -1].mean()))


def test_closed_loop_rollout_glucose_offset_anchoring():
    """In-loop bias anchoring (round-5 dosing fix): `glucose_offset` shifts
    the glucose the PROTOCOL LAW reads (deployment fidelity — a real
    sliding scale reacts to measured glucose, not to the model's belief)
    without touching the reported trajectory semantics. With a large
    positive offset the law sees hyperglycemia and doses at t=0 even when
    the model's predicted glucose sits at target."""
    from hybrid_ode_tpu.models.protocol import closed_loop_rollout

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["ode"]["k_ex"] = jnp.asarray(10.0)
    batch = _protocol_batch()
    batch["initial_state"] = batch["initial_state"].at[:, 0].set(7.0)
    norm = (np.zeros(6), np.ones(6))
    B, T = batch["time_points"].shape

    base = closed_loop_rollout(params, batch, cfg, gain=900.0, target=7.0,
                               norm=norm, check_every=4)
    # at-target initial glucose -> zero dose at the first check
    assert float(base["rates"][:, 0].max()) == 0.0

    off = jnp.full((B, T), 4.0)
    anch = closed_loop_rollout(params, batch, cfg, gain=900.0, target=7.0,
                               norm=norm, check_every=4, glucose_offset=off)
    # law reads 7 + 4 = 11 mmol/L -> rate = clip(900*(11-7), 0, 7000)
    np.testing.assert_allclose(np.asarray(anch["rates"][:, 0]),
                               np.clip(900.0 * 4.0, 0.0, 7000.0), rtol=1e-5)
    # the extra insulin feeds back into the model state (causal k_ex path)
    assert (float(anch["glucose"][:, -1].mean())
            < float(base["glucose"][:, -1].mean()))
    # zero offset is exactly the un-anchored rollout
    zero = closed_loop_rollout(params, batch, cfg, gain=900.0, target=7.0,
                               norm=norm, check_every=4,
                               glucose_offset=jnp.zeros((B, T)))
    np.testing.assert_allclose(np.asarray(zero["trajectory"]),
                               np.asarray(base["trajectory"]), rtol=1e-6)


def test_calibrate_dose_response_recovers_known_attenuation():
    """calibrate_dose_response identifies a known k_ex attenuation from
    randomized practice variation: observations are generated by the SAME
    hybrid model with k_ex_true under per-window varied protocols; the
    ensemble under test carries k_ex_true/4. The regression of observed
    glucose on model-predicted protocol effects must locate scale ~4 and
    the calibrated pytree must carry the rescaled k_ex."""
    import jax.tree_util as jtu

    from hybrid_ode_tpu.models.protocol import (
        calibrate_dose_response,
        closed_loop_rollout,
    )

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech_blind")
    params_true = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    k_true = 12.0
    params_true["ode"]["k_ex"] = jnp.asarray(k_true)
    norm = (np.zeros(6), np.ones(6))

    B, hours, sph = 12, 4, 4
    T = hours * sph + 1
    ts = jnp.broadcast_to(jnp.linspace(0.0, float(hours), T), (B, T))
    rng = np.random.default_rng(3)
    y0 = jnp.asarray(
        np.stack([PHYS * (1 + 0.15 * rng.standard_normal(6)) for _ in range(B)])
    ).at[:, 0].add(4.0)  # hyperglycemic: protocols actually dose
    batch = {
        "initial_state": y0,
        "observations": jnp.broadcast_to(y0[:, None], (B, T, 6)),
        "time_points": ts,
        "external_inputs": {"meal": jnp.zeros((B, T))},
        "mask": jnp.ones((B, T)),
    }
    # randomized practice variation: per-window (gain, target)
    gain_w = jnp.asarray(900.0 * rng.uniform(0.25, 3.0, B))
    target_w = jnp.asarray(rng.uniform(5.0, 9.0, B))
    basal_w = jnp.zeros(B)

    # "observed" = truth-model closed loop under each window's OWN protocol
    obs = closed_loop_rollout(params_true, batch, cfg, gain_w, target_w,
                              norm=norm, check_every=sph, basal=basal_w,
                              rate_cap=20000.0)["glucose"]

    stacked = jtu.tree_map(
        lambda a: jnp.broadcast_to(a, (2,) + jnp.shape(a)), params_true)
    stacked["ode"] = dict(stacked["ode"])
    stacked["ode"]["k_ex"] = jnp.full((2,), k_true / 4.0)

    res = calibrate_dose_response(
        stacked, batch, cfg, norm, gain_w, target_w, basal_w,
        observed_glucose=obs, observed_mask=jnp.ones((B, T)),
        subject_idx=np.arange(B), scales=(1.0, 2.0, 4.0, 8.0),
        rate_cap=20000.0, check_every=sph)
    assert 2.5 < res["scale"] < 6.5, res["slopes"]
    # slope at the true scale is ~1, and attenuation shows slope > 1 at s=1
    assert res["slopes"][1.0]["slope"] > 1.2
    np.testing.assert_allclose(
        np.asarray(res["stacked_calibrated"]["ode"]["k_ex"]),
        (k_true / 4.0) * res["scale"], rtol=1e-6)


def test_optimize_protocol_descends_and_is_differentiable():
    """optimize_protocol reduces the glycemic risk through the rollout and
    respects the target box."""
    from hybrid_ode_tpu.models.protocol import (
        closed_loop_rollout,
        glycemic_risk,
        optimize_protocol,
        time_in_range,
    )

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["ode"]["k_ex"] = jnp.asarray(10.0)
    batch = _protocol_batch()
    # start hyperglycemic so there is risk to remove
    batch["initial_state"] = batch["initial_state"].at[:, 0].add(6.0)
    norm = (np.zeros(6), np.ones(6))

    def rollout(gain, target):
        return closed_loop_rollout(params, batch, cfg, gain, target,
                                   norm=norm, check_every=4)["glucose"]

    res = optimize_protocol(rollout, init_gain=100.0, init_target=8.5,
                            steps=30, lr=0.1)
    assert res["final_risk"] < res["init_risk"]
    assert 4.5 <= res["target"] <= 9.0
    assert res["gain"] > 0.0
    # sanity: the metric helpers
    g = rollout(res["gain"], res["target"])
    assert 0.0 <= float(time_in_range(g)) <= 1.0
    assert float(glycemic_risk(jnp.full((4, 5), 6.0))) == 0.0


def test_optimize_protocol_gain_bounds_and_delta_correction():
    """Round-4 dosing-study fixes: gain_bounds boxes the gain inside the
    clinically admissible range (the unbounded log-gain measurably ran away
    to 35k, RESULTS.md), and counterfactual_delta_correction anchors the
    corrected trajectory to the observation at the factual protocol."""
    from hybrid_ode_tpu.models.protocol import (
        closed_loop_rollout,
        counterfactual_delta_correction,
        optimize_protocol,
    )

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan", exog_insulin="mech")
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    params["ode"]["k_ex"] = jnp.asarray(10.0)
    batch = _protocol_batch()
    batch["initial_state"] = batch["initial_state"].at[:, 0].add(6.0)
    norm = (np.zeros(6), np.ones(6))

    def rollout(gain, target):
        return closed_loop_rollout(params, batch, cfg, gain, target,
                                   norm=norm, check_every=4)["glucose"]

    res = optimize_protocol(rollout, init_gain=900.0, init_target=7.0,
                            steps=20, lr=0.3, gain_bounds=(0.0, 3600.0))
    assert 0.0 <= res["gain"] <= 3600.0
    assert res["final_risk"] <= res["init_risk"] + 1e-9
    # vector (per-patient) parameters respect the box too
    res_pp = optimize_protocol(
        lambda g, t: rollout(g, t),
        init_gain=np.full(3, 900.0, np.float32),
        init_target=np.full(3, 7.0, np.float32),
        steps=5, lr=0.3, gain_bounds=(0.0, 3600.0))
    assert np.all(res_pp["gain"] >= 0.0) and np.all(res_pp["gain"] <= 3600.0)

    # delta correction: equals the observation exactly at the factual arm,
    # and shifts it by exactly the model's predicted delta elsewhere
    g_fact_model = rollout(900.0, 7.0)
    obs = g_fact_model + 0.37  # synthetic "observed" factual trajectory
    corr_fact = counterfactual_delta_correction(g_fact_model, g_fact_model,
                                                obs)
    np.testing.assert_allclose(np.asarray(corr_fact), np.asarray(obs),
                               rtol=1e-6)
    g_arm = rollout(1800.0, 5.5)
    corr_arm = counterfactual_delta_correction(g_arm, g_fact_model, obs)
    np.testing.assert_allclose(np.asarray(corr_arm - obs),
                               np.asarray(g_arm - g_fact_model), atol=1e-5)


def test_robust_delta_risk_worst_case_properties():
    """robust_delta_risk upper-bounds the plain corrected risk, reduces to
    it when the delta is zero, and is differentiable (the dosing study's
    attenuation-robust objective)."""
    from hybrid_ode_tpu.models.protocol import (
        counterfactual_delta_correction,
        glycemic_risk,
        robust_delta_risk,
    )

    key = jax.random.PRNGKey(3)
    obs = 6.0 + 1.5 * jax.random.normal(key, (4, 12))          # (N, T)
    fact = obs + 0.3 * jax.random.normal(jax.random.PRNGKey(4), (4, 12))
    arm = fact - 0.8                                            # dosing arm
    plain = float(glycemic_risk(
        counterfactual_delta_correction(arm, fact, obs)))
    robust = float(robust_delta_risk(arm, fact, obs))
    assert robust >= plain - 1e-7   # worst case dominates lambda=1
    # zero delta: every lambda gives the observed trajectory's risk
    np.testing.assert_allclose(
        float(robust_delta_risk(fact, fact, obs)),
        float(glycemic_risk(obs)), rtol=1e-6)
    grad = jax.grad(lambda a: robust_delta_risk(a, fact, obs))(arm)
    assert float(jnp.abs(grad).sum()) > 0


def test_cvar_risk_upper_bounds_mean_risk():
    """CVaR of per-member risks >= mean risk, equals it at alpha=1, and is
    differentiable (the risk-averse dosing objective)."""
    from hybrid_ode_tpu.models.protocol import cvar_glycemic_risk, glycemic_risk

    key = jax.random.PRNGKey(0)
    g = 7.0 + 3.0 * jax.random.normal(key, (8, 4, 10))  # (K, B, T)
    mean_risk = float(jnp.mean(jax.vmap(glycemic_risk)(g)))
    cvar25 = float(cvar_glycemic_risk(g, alpha=0.25))
    cvar_all = float(cvar_glycemic_risk(g, alpha=1.0))
    assert cvar25 >= mean_risk - 1e-6
    np.testing.assert_allclose(cvar_all, mean_risk, rtol=1e-6)
    grad = jax.grad(lambda x: cvar_glycemic_risk(x, alpha=0.25))(g)
    assert float(jnp.abs(grad).sum()) > 0


def test_batched_forward_sync_mode_matches_scan():
    """mode='sync' (batch-synchronized adaptive stepping, solvers/sync.py)
    must reproduce the per-sample scan trajectories within tolerance and
    feed hybrid_loss identical-to-4-decimals losses and aligned gradients."""
    from hybrid_ode_tpu.models.hybrid import (
        batched_forward,
        controls_from_batch,
        hybrid_loss,
    )

    B, T = 6, 9
    rng = np.random.default_rng(0)
    base = np.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    batch = {
        "initial_state": np.abs(
            base[None] * (1 + 0.05 * rng.standard_normal((B, 6)))
        ).astype(np.float32),
        "observations": np.abs(
            base[None, None] * (1 + 0.08 * rng.standard_normal((B, T, 6)))
        ).astype(np.float32),
        "time_points": np.broadcast_to(
            np.linspace(0, 1.0, T, dtype=np.float32), (B, T)).copy(),
        "external_inputs": {"meal": np.zeros((B, T), np.float32),
                            "tVNS": np.zeros((B, T), np.float32)},
        "mask": np.ones((B, T), np.float32),
    }
    batch["external_inputs"]["meal"][:, 3] = 2.0
    cfg_scan = HybridConfig(solver="dopri5", rtol=1e-5, atol=1e-7,
                            mode="scan", nn_hidden=8, nn_layers=2)
    cfg_sync = HybridConfig(solver="dopri5", rtol=1e-5, atol=1e-7,
                            mode="sync", nn_hidden=8, nn_layers=2)
    params = init_hybrid_params(jax.random.PRNGKey(1), cfg_scan)
    ctrl = controls_from_batch(batch)
    y0 = jnp.asarray(batch["initial_state"])
    ts = jnp.asarray(batch["time_points"])
    p_scan = batched_forward(params, y0, ts, ctrl, cfg_scan)
    p_sync = batched_forward(params, y0, ts, ctrl, cfg_sync)
    np.testing.assert_allclose(np.asarray(p_sync), np.asarray(p_scan),
                               rtol=2e-4, atol=2e-4)

    key = jax.random.PRNGKey(0)
    l_scan, _ = hybrid_loss(params, batch, key, cfg_scan)
    l_sync, m = hybrid_loss(params, batch, key, cfg_sync)
    assert float(m["solver_success"]) == 1.0
    np.testing.assert_allclose(float(l_sync), float(l_scan), rtol=1e-4)

    g_scan = jax.grad(lambda p: hybrid_loss(p, batch, key, cfg_scan)[0])(params)
    g_sync = jax.grad(lambda p: hybrid_loss(p, batch, key, cfg_sync)[0])(params)
    for grp in ("ode", "nn"):
        a = jnp.concatenate([x.ravel()
                             for x in jax.tree_util.tree_leaves(g_scan[grp])])
        b = jnp.concatenate([x.ravel()
                             for x in jax.tree_util.tree_leaves(g_sync[grp])])
        cos = float(a @ b) / (float(jnp.linalg.norm(a))
                              * float(jnp.linalg.norm(b)) + 1e-30)
        assert cos > 0.999, grp


def test_mech_blind_causal_masking():
    """exog_insulin='mech_blind' (round 5): the NN neither reads the insulin
    state nor writes the insulin derivative; insulin dynamics are purely
    mechanistic (k_ex route), and the glucose-insulin coupling |S_I| is
    sign-definite — the full causal mask behind the dosing study."""
    from hybrid_ode_tpu.models.hybrid import hybrid_field

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       exog_insulin="mech_blind")
    p = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    assert "S_I" in p["ode"] and "k_ex" in p["ode"]
    p = jax.tree_util.tree_map(lambda x: x + 0.05 if x.ndim >= 1 else x, p)

    y = jnp.array([8.0, 100.0, 90.0, 20.0, 0.0, 1.2])
    y2 = y.at[1].set(250.0)
    cfg_m = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                         exog_insulin="mech_blind", use_nn=False)
    # NN contribution invariant to the insulin state
    d_full = hybrid_field(0.0, y2, p, None, cfg) - hybrid_field(0.0, y, p, None, cfg)
    d_mech = hybrid_field(0.0, y2, p, None, cfg_m) - hybrid_field(0.0, y, p, None, cfg_m)
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_mech),
                               rtol=1e-5, atol=1e-6)
    # NN writes nothing to dI: full-field dI == mech-only dI pointwise
    f_full = hybrid_field(0.0, y, p, None, cfg)
    f_mech = hybrid_field(0.0, y, p, None, cfg_m)
    np.testing.assert_allclose(float(f_full[1]), float(f_mech[1]), rtol=1e-6)
    # ...while other channels DO carry NN residual (perturbed weights)
    assert float(jnp.abs(f_full - f_mech)[jnp.array([0, 2, 3, 5])].max()) > 1e-4
    # sign-definite insulin sensitivity: higher insulin can only lower dG
    for s in (0.02, -0.02):
        p2 = {**p, "ode": {**p["ode"], "S_I": jnp.asarray(s)}}
        assert (hybrid_field(0.0, y2, p2, None, cfg_m)[0]
                < hybrid_field(0.0, y, p2, None, cfg_m)[0])
    # exogenous rate enters ONLY the mechanistic insulin compartment
    from hybrid_ode_tpu.dynamics.controls import Controls
    ts = jnp.array([0.0, 1.0])
    c = Controls(ts=ts, signals={"tVNS": jnp.array([5.0, 5.0]),
                                 "meal": jnp.zeros(2)})
    c0 = Controls(ts=ts, signals={"tVNS": jnp.zeros(2), "meal": jnp.zeros(2)})
    d_dose = hybrid_field(0.5, y, p, c, cfg) - hybrid_field(0.5, y, p, c0, cfg)
    expected = 5.0 * float(p["ode"]["k_ex"])
    np.testing.assert_allclose(float(d_dose[1]), expected, rtol=1e-5)
    assert float(jnp.abs(d_dose).sum()) == pytest.approx(abs(expected), rel=1e-5)
