"""Robustness evaluation: CGM missingness and measurement-noise sweeps.

Parity target: the manuscript's robustness table (manuscript.tex:396-410 —
RMSE under 10/30/50% missing CGM and under inflated noise), which the
reference repo has NO code for. Observation masks are native to this
framework, so missingness is literally the mask; noise inflation perturbs
observed initial states and targets.

Protocol: for each corruption level, corrupt the TEST windows, re-evaluate
the trained model's full-horizon predictions against the UNCORRUPTED
observations (the model must be robust to corrupted initial states /
evaluation still measures true fit).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np

from hybrid_ode_tpu.data.dataset import GlucoseDataset
from hybrid_ode_tpu.evals.metrics import compute_rmse
from hybrid_ode_tpu.models.hybrid import HybridConfig, batched_forward
from hybrid_ode_tpu.dynamics.controls import Controls

logger = logging.getLogger("hybrid_ode_tpu.robustness")


def _predict(params, ds: GlucoseDataset, config: HybridConfig, init_states=None):
    controls = Controls(
        ts=jnp.asarray(ds.time_points),
        signals={"meal": jnp.asarray(ds.meal), "tVNS": jnp.asarray(ds.tvns)},
    )
    y0 = jnp.asarray(init_states if init_states is not None else ds.initial_state)
    return np.asarray(
        batched_forward(params, y0, jnp.asarray(ds.time_points), controls, config)
    )


def missing_data_sweep(
    params: Any,
    ds: GlucoseDataset,
    config: HybridConfig,
    fractions: Sequence[float] = (0.1, 0.3, 0.5),
    seed: int = 0,
    state_index: int = 0,
) -> Dict[float, float]:
    """RMSE of glucose predictions when a fraction of observations is dropped.

    Missingness affects which points are scored (mask), emulating sparse CGM;
    predictions always roll the full horizon from the window's initial state.
    """
    rng = np.random.default_rng(seed)
    preds = _predict(params, ds, config)
    out = {}
    for frac in fractions:
        keep = (rng.uniform(size=ds.mask.shape) >= frac) & (ds.mask > 0)
        rmse = compute_rmse(
            preds[..., state_index : state_index + 1],
            ds.observations[..., state_index : state_index + 1],
            mask=keep.astype(np.float32),
        )
        denom = float(ds.state_std[state_index])
        out[frac] = rmse * denom  # physical units
        logger.info("missing %.0f%%: glucose RMSE %.3f", frac * 100, out[frac])
    return out


def noise_sweep(
    params: Any,
    ds: GlucoseDataset,
    config: HybridConfig,
    noise_multipliers: Sequence[float] = (1.0, 2.0),
    base_sigma: float = 0.1,
    seed: int = 0,
    state_index: int = 0,
) -> Dict[float, float]:
    """RMSE when initial states are corrupted with k-sigma noise.

    Tests sensitivity of the rollout to perturbed initial conditions — the
    mechanism behind the manuscript's 2-sigma robustness row (where the pure
    mechanistic model wins: it contracts to baseline, the NN may amplify).
    """
    rng = np.random.default_rng(seed)
    out = {}
    for k in noise_multipliers:
        y0 = ds.initial_state + (k * base_sigma) * rng.standard_normal(
            ds.initial_state.shape
        ).astype(np.float32)
        preds = _predict(params, ds, config, init_states=y0)
        rmse = compute_rmse(
            preds[..., state_index : state_index + 1],
            ds.observations[..., state_index : state_index + 1],
            mask=ds.mask,
        )
        out[k] = rmse * float(ds.state_std[state_index])
        logger.info("noise %gx: glucose RMSE %.3f", k, out[k])
    return out


def robustness_report(
    params: Any, ds: GlucoseDataset, config: HybridConfig, out_path: str = None
) -> Dict[str, Dict[float, float]]:
    report = {
        "missing_data": missing_data_sweep(params, ds, config),
        "initial_noise": noise_sweep(params, ds, config),
    }
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump({k: {str(kk): vv for kk, vv in v.items()} for k, v in report.items()}, f, indent=2)
    return report
