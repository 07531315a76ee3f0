"""Robustness sweeps + online adaptation (manuscript features with no
reference code — SURVEY.md §6 parity targets)."""

import numpy as np
import jax
import pytest

from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
from hybrid_ode_tpu.models.hybrid import HybridConfig, init_hybrid_params
from hybrid_ode_tpu.evals.robustness import missing_data_sweep, noise_sweep, robustness_report
from hybrid_ode_tpu.train.online import adapt_subject, online_adaptation_eval
from tests.test_training import make_test_csv

FAST = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2, mode="scan")


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    path = make_test_csv(tmp_path_factory.mktemp("rob") / "d.csv", n_subjects=2, n_points=41)
    return create_data_arrays(str(path), sequence_length=21, stride=20)


def test_missing_data_sweep_corrupts_conditioning(ds):
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    res = missing_data_sweep(params, ds, FAST, fractions=(0.0, 0.5))
    assert set(res) == {0.0, 0.5}
    assert all(np.isfinite(v) and v > 0 for v in res.values())
    # with 50% of conditioning data gone (incl. possibly the initial state),
    # the rollout must CHANGE — the old scoring-mask-only protocol couldn't
    assert res[0.5] != res[0.0]


def test_noise_sweep_monotone_tendency(ds):
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    res = noise_sweep(params, ds, FAST, noise_multipliers=(1.0, 4.0))
    assert np.isfinite(res[1.0]) and np.isfinite(res[4.0])
    assert res[4.0] >= res[1.0] * 0.5  # heavy noise should not *improve* much


def test_robustness_report(tmp_path, ds):
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    rep = robustness_report(params, ds, FAST, str(tmp_path / "rob.json"))
    assert "missing_data" in rep and "conditioning_noise" in rep
    assert (tmp_path / "rob.json").exists()


def test_adapt_subject_reduces_fit_loss(ds):
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    window = {
        "observations": ds.observations[0],
        "time_points": ds.time_points[0],
        "external_inputs": {"meal": ds.meal[0], "tVNS": ds.tvns[0]},
        "mask": ds.mask[0],
    }
    adapted = adapt_subject(params, window, FAST, reveal_points=10, adapt_steps=20,
                            learning_rate=1e-2)
    # NN params moved, ODE frozen
    assert float(np.abs(np.asarray(adapted["nn"]["w2"]) - np.asarray(params["nn"]["w2"])).sum()) > 0
    np.testing.assert_array_equal(np.asarray(adapted["ode"]["a_GI"]), np.asarray(params["ode"]["a_GI"]))


@pytest.mark.slow
def test_online_adaptation_eval(ds):
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    res = online_adaptation_eval(params, ds, FAST, horizons_hours=(1.0,),
                                 adapt_steps=5)
    assert 1.0 in res and np.isfinite(res[1.0])


def test_guarded_adaptation_rejects_noise(ds):
    """The shrinkage guard must fall back to the population model when the
    revealed window is pure measurement noise (nothing subject-specific to
    learn — adapting on it can only hurt the forecast)."""
    from hybrid_ode_tpu.train.online import adapt_subject_guarded

    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    rng = np.random.default_rng(3)
    obs = ds.observations[0].copy()
    obs = rng.normal(size=obs.shape).astype(np.float32)  # iid noise stream
    window = {
        "observations": obs,
        "time_points": ds.time_points[0],
        "external_inputs": {"meal": ds.meal[0], "tVNS": ds.tvns[0]},
        "mask": ds.mask[0],
    }
    out = adapt_subject_guarded(params, window, FAST, reveal_points=14,
                                adapt_steps=10, learning_rate=1e-2,
                                ucb_k=2.0)
    # an iid-noise reveal gives the adapted model no edge on the holdout
    # tail that survives the UCB variance penalty -> the guard returns the
    # population params
    for k in params["nn"]:
        np.testing.assert_array_equal(np.asarray(out["nn"][k]),
                                      np.asarray(params["nn"][k]))


def test_select_guard_policy_wellformed(ds):
    """The per-horizon meta-policy selector returns a policy consumable by
    online_adaptation_eval and a measurement table with paired t-stats;
    with a random-init model (nothing subject-specific learnable) it must
    not enable adaptation at t_min=2."""
    from hybrid_ode_tpu.train.online import select_guard_policy

    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    policy, table = select_guard_policy(
        params, ds, FAST, horizons_hours=(1.0,), window_indices=[0, 1],
        adapt_steps=3, learning_rate=1e-3)
    assert set(policy) == {1.0}
    sel = table["1.0"]["selected"]
    assert set(sel) == {"enabled", "ucb_k", "t"}
    for cand in table["1.0"]["candidates"].values():
        assert np.isfinite(cand["t"]) and np.isfinite(cand["val_rmse"])
    if not sel["enabled"]:
        assert policy[1.0] == {"adapt_steps": 0}
    else:  # enabled only on a statistically solid win
        assert sel["t"] >= 2.0 and policy[1.0]["guard"]
