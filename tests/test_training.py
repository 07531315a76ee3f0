"""End-to-end training-tier tests (parity: reference tests/test_training.py).

Uses the fast fixed-grid solver + tiny models so the whole tier compiles and
runs in seconds on the CPU mesh.
"""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from hybrid_ode_tpu.data.dataset import (
    create_data_arrays,
    split_dataset,
    batch_iterator,
    pad_batch,
)
from hybrid_ode_tpu.models.hybrid import HybridConfig, hybrid_loss, init_hybrid_params
from hybrid_ode_tpu.train.loop import TrainState, make_optimizer, make_train_step, train_model
from hybrid_ode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hybrid_ode_tpu.utils.config import default_config


def make_test_csv(path, n_subjects=3, n_points=61):
    """Synthetic sinusoidal multi-subject records (reference
    tests/test_training.py:22-58 analogue)."""
    rows = []
    rng = np.random.default_rng(0)
    for sid in range(n_subjects):
        t = np.arange(n_points) * 5.0  # minutes
        th = t / 60.0
        rows.append(
            pd.DataFrame(
                {
                    "subject_id": sid,
                    "time_minutes": t,
                    "glucose_mmol_L": 6 + 2 * np.sin(th * 2) + 0.1 * rng.standard_normal(n_points),
                    "insulin_pmol_L": 60 + 30 * np.sin(th * 2 + 0.5) + rng.standard_normal(n_points),
                    "glucagon_pmol_L": 80 + 10 * np.cos(th) + rng.standard_normal(n_points),
                    "glp1_pmol_L": 20 + 10 * np.sin(th * 3) + rng.standard_normal(n_points),
                    "meal_indicator": (np.arange(n_points) % 24 == 12).astype(float),
                }
            )
        )
    pd.concat(rows, ignore_index=True).to_csv(path, index=False)
    return path


FAST = HybridConfig(solver="rk4", substeps=2, nn_hidden=16, nn_layers=2, mode="scan")


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return make_test_csv(tmp_path_factory.mktemp("data") / "test.csv")


@pytest.fixture(scope="module")
def dataset(csv_path):
    return create_data_arrays(str(csv_path), sequence_length=20, stride=10)


def test_dataset_shapes(dataset):
    """Windowing/shape contract (reference test_dataset_creation)."""
    assert dataset.observations.shape[1:] == (20, 6)
    assert dataset.initial_state.shape == (len(dataset), 6)
    assert dataset.time_points.shape == (len(dataset), 20)
    # 61 points, window 20, stride 10 -> 5 windows/subject x 3 subjects
    assert len(dataset) == 15
    # normalization: observed entries ~ zero mean/unit variance
    assert abs(float(dataset.observations.mean())) < 0.5
    np.testing.assert_array_equal(dataset.initial_state, dataset.observations[:, 0])


def test_dataset_nan_masking(tmp_path):
    path = make_test_csv(tmp_path / "nan.csv", n_subjects=1)
    df = pd.read_csv(path)
    df.loc[5, "glucose_mmol_L"] = np.nan
    df.to_csv(path, index=False)
    ds = create_data_arrays(str(path), sequence_length=20, stride=10)
    assert ds.mask[0, 5] == 0.0
    assert np.isfinite(ds.observations).all()


def test_split_fractions(dataset):
    tr, va, te = split_dataset(dataset, seed=42)
    assert len(tr) + len(va) + len(te) == len(dataset)
    assert len(tr) == int(0.7 * len(dataset))
    # deterministic
    tr2, _, _ = split_dataset(dataset, seed=42)
    np.testing.assert_array_equal(tr.subject_ids, tr2.subject_ids)


def test_mini_training_decreases_loss(dataset):
    """One mini-epoch trains, loss finite, parameters actually change
    (reference test_mini_training)."""
    tr, va, _ = split_dataset(dataset, seed=42)
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    opt = make_optimizer(1e-3, 10, 2, 5.0)
    step = make_train_step(opt, FAST, 1.0, 0.01, True)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))

    w4_before = np.asarray(params["nn"]["w2"]).copy()  # last layer of 2-layer MLP... n_layers=2 -> w0,w1,w2
    losses = []
    key = jax.random.PRNGKey(1)
    for epoch in range(3):
        for batch in batch_iterator(tr, 8, shuffle=True, seed=epoch):
            batch, _ = pad_batch(batch, 8)
            key, sk = jax.random.split(key)
            state, m = step(state, batch, sk)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # no explosion
    w_after = np.asarray(state.params["nn"]["w2"])
    assert np.abs(w_after - w4_before).sum() > 0  # parameters moved
    # ODE params frozen (parity)
    assert float(state.params["ode"]["a_GI"]) == pytest.approx(0.0104)


def test_validation_loss_finite(dataset):
    tr, va, _ = split_dataset(dataset, seed=42)
    params = init_hybrid_params(jax.random.PRNGKey(0), FAST)
    key = jax.random.PRNGKey(0)
    batch = next(batch_iterator(va, 4, shuffle=False))
    batch, _ = pad_batch(batch, 4)
    loss, comps = hybrid_loss(params, batch, key, FAST)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("no_nn,no_physics", [(True, False), (False, True), (True, True)])
def test_ablation_modes(dataset, no_nn, no_physics):
    """All ablation modes produce finite losses (reference test_ablation_modes)."""
    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=16, nn_layers=2, use_nn=not no_nn)
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    batch = next(batch_iterator(dataset, 4, shuffle=False))
    batch, _ = pad_batch(batch, 4)
    loss, comps = hybrid_loss(
        params, batch, jax.random.PRNGKey(0), cfg, use_physics_loss=not no_physics
    )
    assert np.isfinite(float(loss))
    if no_physics:
        assert float(comps["physics"]) == 0.0


def test_checkpoint_roundtrip(tmp_path, dataset):
    """Checkpoint save/load parameter equality (reference
    test_checkpoint_saving_loading)."""
    params = init_hybrid_params(jax.random.PRNGKey(3), FAST)
    meta = {"epoch": 7, "val_loss": 0.5, "config": default_config()}
    save_checkpoint(tmp_path / "ckpt", {"params": params}, meta)
    state, meta2 = load_checkpoint(tmp_path / "ckpt")
    assert meta2["epoch"] == 7
    for grp in ("ode", "nn"):
        for k in params[grp]:
            np.testing.assert_array_equal(
                np.asarray(params[grp][k]), np.asarray(state["params"][grp][k])
            )


def test_train_model_end_to_end(tmp_path, csv_path):
    """Full train_model: early stopping machinery, best checkpoint on disk."""
    cfg = default_config()
    cfg["data"]["path"] = str(csv_path)
    cfg["data"]["sequence_length"] = 20
    cfg["data"]["stride"] = 10
    cfg["model"].update(nn_hidden=16, nn_layers=2, solver="rk4", substeps=2)
    cfg["training"].update(epochs=2, batch_size=8)
    ds = create_data_arrays(str(csv_path), 20, 10)
    tr, va, _ = split_dataset(ds, seed=42)
    result = train_model(cfg, tr, va, str(tmp_path / "ckpts"), str(tmp_path / "runs"))
    assert np.isfinite(result.best_val_loss)
    assert (tmp_path / "ckpts" / "best_model" / "leaves.npz").exists()
    assert (tmp_path / "runs" / "metrics.jsonl").exists()
    # checkpoint reloads and evaluates
    from hybrid_ode_tpu.evals.evaluate import evaluate_checkpoint

    metrics = evaluate_checkpoint(str(tmp_path / "ckpts" / "best_model"), va)
    assert np.isfinite(metrics["rmse"])
    # without a val split the reference's 0.1 placeholder applies and the
    # calibration columns are suppressed (they would be meaningless)
    assert "ece" not in metrics


def test_point_eval_moment_matched_noise(tmp_path, csv_path):
    """Point-checkpoint eval with a val split reports moment-matched
    per-state noise and meaningful calibration columns (VERDICT r3 item 6;
    DEVIATION from reference evaluate.py:247's fixed sigma=0.1)."""
    from hybrid_ode_tpu.evals.evaluate import evaluate_model, fit_observation_noise
    from hybrid_ode_tpu.models.hybrid import HybridConfig, init_hybrid_params

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2,
                       mode="scan")
    ds = create_data_arrays(str(csv_path), 20, 10)
    tr, va, te = split_dataset(ds, seed=42)
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)

    sigma = fit_observation_noise(params, va, cfg, batch_size=8)
    assert sigma.shape == (6,)
    assert np.all(sigma > 0) and np.all(np.isfinite(sigma))

    m = evaluate_model(params, te, cfg, batch_size=8, val_ds=va)
    for k in ("ece", "coverage_95", "nll", "crps", "noise_sigma_glucose"):
        assert k in m and np.isfinite(m[k]), k
    # the fitted sigma is the val RMS residual — an untrained model's
    # residuals are O(1) in normalized units, nowhere near the 0.1
    # placeholder; sanity-check the value actually reached the metrics
    assert m["noise_sigma_glucose"] == pytest.approx(float(sigma[0]))


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path, csv_path):
    """Mid-training resume restores params + optimizer state and continues."""
    cfg = default_config()
    cfg["data"]["path"] = str(csv_path)
    cfg["model"].update(nn_hidden=16, nn_layers=2, solver="rk4", substeps=2)
    cfg["training"].update(epochs=4, batch_size=8)
    ds = create_data_arrays(str(csv_path), 20, 10)
    tr, va, _ = split_dataset(ds, seed=42)
    r1 = train_model(cfg, tr, va, str(tmp_path / "c1"), None, max_epochs=2)
    r2 = train_model(cfg, tr, va, str(tmp_path / "c2"), None,
                     resume_from=str(tmp_path / "c1" / "final_model"))
    assert r2.epochs_run <= 4
    assert np.isfinite(r2.best_val_loss)


def test_profiling_utils():
    from hybrid_ode_tpu.utils.profiling import Throughput, debug_mode

    tp = Throughput("ode_steps")
    tp.tick(100)
    assert tp.per_sec > 0
    assert "ode_steps" in tp.report()

    import jax
    with debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans is False


def test_context_checkpoint_roundtrips_all_clis(dataset, tmp_path):
    """A context-conditioned + multiple-shooting checkpoint rebuilds its exact
    HybridConfig through every consumer of config_from_dict (train loop,
    evaluate_checkpoint, figures CLI) — regression for the old per-CLI config
    copies that silently dropped context/shooting keys."""
    from hybrid_ode_tpu.evals.evaluate import evaluate_checkpoint
    from hybrid_ode_tpu.models.hybrid import config_from_dict

    tr, va, _ = split_dataset(dataset, seed=42)
    cfg = default_config()
    cfg["model"].update(
        solver="rk4", substeps=2, nn_hidden=16, nn_layers=2,
        context_points=4, context_dim=3,
    )
    cfg["training"].update(epochs=1, batch_size=8, learning_rate=1e-3)
    result = train_model(cfg, tr, va, str(tmp_path / "ckpt"))
    assert "enc" in result.params  # context encoder was actually built

    # evaluate_checkpoint must reconstruct the SAME config from the embedded
    # dict (mismatched context width would crash the MLP input concat)
    metrics = evaluate_checkpoint(str(tmp_path / "ckpt" / "best_model"), va)
    assert np.isfinite(metrics["rmse"])

    state, meta = load_checkpoint(str(tmp_path / "ckpt" / "best_model"))
    rebuilt = config_from_dict(meta["config"])
    assert rebuilt.context_points == 4
    assert rebuilt.context_dim == 3
    # shooting_segments carried from a raw config dict too
    assert config_from_dict({"model": {"shooting_segments": 3}}).shooting_segments == 3


def test_selective_ode_param_training():
    """make_optimizer with a list of ODE names trains exactly those."""
    import optax
    from hybrid_ode_tpu.train.loop import make_optimizer

    cfg = HybridConfig(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2)
    params = init_hybrid_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-2, 10, 1, train_ode_params=["V_max", "k_L"])
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["ode"]["V_max"])) > 0
    assert float(jnp.abs(updates["ode"]["k_L"])) > 0
    assert float(jnp.abs(updates["ode"]["a_GI"])) == 0.0
    assert float(jnp.abs(updates["nn"]["w0"]).sum()) > 0


def test_cli_ensemble_trains_and_checkpoints(tmp_path, monkeypatch):
    """--ensemble K trains a K-member deep ensemble in one vmapped program
    and saves a stacked-params checkpoint (leading member axis)."""
    csv8 = make_test_csv(tmp_path / "ens.csv", n_subjects=8)
    monkeypatch.chdir(tmp_path)
    import yaml

    cfg = default_config()
    cfg["data"]["path"] = str(csv8)
    cfg["model"].update(solver="rk4", substeps=2, nn_hidden=8, nn_layers=2)
    cfg["training"].update(epochs=2, batch_size=4, learning_rate=1e-3)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from hybrid_ode_tpu.train.cli import main as cli_main

    cli_main(["--config", str(cfg_path), "--ensemble", "3",
              "--experiment-name", "ens_test"])
    ckpt = str(tmp_path / "checkpoints" / "ens_test" / "ensemble_model")
    stacked, meta = load_checkpoint(ckpt)
    assert meta["n_members"] == 3
    assert np.isfinite(meta["val_rmse_ensemble"])
    w0 = np.asarray(stacked["nn"]["w0"])
    assert w0.shape[0] == 3
    assert not np.allclose(w0[0], w0[1])  # members genuinely differ

    # evaluate CLI consumes ensemble checkpoints (mean + spread + calibration)
    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.evals.evaluate import evaluate_checkpoint

    ds = create_data_arrays(str(csv8))
    _, _, test_ds = split_dataset(ds, seed=42)
    m = evaluate_checkpoint(ckpt, test_ds)
    assert np.isfinite(m["rmse"]) and "ece" in m and np.isfinite(m["ece"])
