"""Per-subject probe for the online-adaptation guard (round 3 diagnostic).

The guarded adaptation still lost at 6 h (1.374 vs 1.240 no-adaptation,
results/online_adaptation.json): the 1.5 h reveal-tail holdout accepts
harmful adaptations too often. Instead of iterating guard rules blind
(each guarded benchmark row costs ~6 min TPU), this probe collects — for
every test subject x horizon x shrinkage alpha — the holdout per-point
squared errors (everything a deployable guard may look at) AND the true
remaining-horizon RMSE (what the guard is trying to predict). Candidate
guard rules are then evaluated OFFLINE from the saved npz in seconds.

Usage: python benchmarks/guard_probe.py   (reuses checkpoints/online_population)
Writes results/guard_probe.npz.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.online_adapt import HORIZONS, MEALS, POP_CFG, STREAM_HOURS

ALPHAS = (0.25, 0.5, 1.0)


def main(half="test"):
    import copy
    import types

    import jax.numpy as jnp

    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import (batched_forward,
                                              config_from_dict, with_context)
    from hybrid_ode_tpu.train.online import adapt_subject
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    T = int(STREAM_HOURS * 12) + 1
    subjects, seed = 20, 123
    train_csv = REPO / "results" / "online_train_cohort.csv"
    stream_csv = REPO / "results" / "online_stream_cohort.csv"
    assert train_csv.exists() and stream_csv.exists(), \
        "run benchmarks/online_adapt.py first (generates the cohorts)"
    train_all = create_data_arrays(str(train_csv), sequence_length=T, stride=T)
    pop_mean, pop_std = train_all.state_mean, train_all.state_std

    state, _ = load_checkpoint(
        str(REPO / "checkpoints" / "online_population" / "best_model"))
    params = state["params"]
    cfg = copy.deepcopy(POP_CFG)
    config = config_from_dict(cfg)

    ds = create_data_arrays(str(stream_csv), sequence_length=T, stride=T)
    obs_phys = ds.observations * ds.state_std + ds.state_mean
    init_phys = ds.initial_state * ds.state_std + ds.state_mean
    ds = dataclasses.replace(
        ds,
        observations=((obs_phys - pop_mean) / pop_std).astype(np.float32),
        initial_state=((init_phys - pop_mean) / pop_std).astype(np.float32),
        state_mean=pop_mean, state_std=pop_std,
    )
    n = len(ds)
    test_idx = (list(range(n // 2, n)) if half == "test"
                else list(range(0, n // 2)))
    state_index = 0

    import jax

    def blend(base, adapted, alpha):
        out = dict(base)
        out["nn"] = jax.tree.map(
            lambda p0, p1: p0 + alpha * (p1 - p0), base["nn"], adapted["nn"])
        return out

    def forecast_err(p, w, start, stop, window):
        """Per-point glucose error of a forecast re-anchored at `start`-1."""
        r0 = start - 1
        ts = jnp.asarray(ds.time_points[w: w + 1, r0:stop])
        y0 = jnp.asarray(ds.observations[w: w + 1, r0])
        ctrls = Controls(
            ts=ts,
            signals={"meal": jnp.asarray(ds.meal[w: w + 1, r0:stop]),
                     "tVNS": jnp.asarray(ds.tvns[w: w + 1, r0:stop])},
        )
        k = max(start, config.context_points)
        obs_r = np.asarray(ds.observations[w, :start])
        tp_r = np.asarray(ds.time_points[w, :start])
        if k > start:
            obs_r = np.concatenate([obs_r, np.repeat(obs_r[-1:], k - start, 0)])
            tp_r = np.concatenate([tp_r, np.repeat(tp_r[-1:], k - start, 0)])
        ctx = {"observations": jnp.asarray(obs_r[None]),
               "time_points": jnp.asarray(tp_r[None])}
        ctrls = with_context(p, ctx, ctrls, config)
        pred = np.asarray(batched_forward(p, y0, ts, ctrls, config))[0]
        err = pred[1:, state_index] - ds.observations[w, start:stop, state_index]
        m = ds.mask[w, start:stop] > 0
        return err, m

    rows = []          # dict per (w, h)
    hold_errs = {}     # (w, h, tag) -> per-point squared holdout errors
    t_start = time.time()
    for w in test_idx:
        window = {
            "observations": ds.observations[w],
            "time_points": ds.time_points[w],
            "external_inputs": {"meal": ds.meal[w], "tVNS": ds.tvns[w]},
            "mask": ds.mask[w],
        }
        t0 = float(ds.time_points[w, 0])
        for h in HORIZONS:
            R = int(np.searchsorted(ds.time_points[w], t0 + h))
            R = int(np.clip(R, 4, T - 4))
            n_hold = max(int(round(0.25 * R)), 3)
            fit = max(R - n_hold, 4)
            adapted_fit = adapt_subject(
                params, window, config, fit, 50, 1e-3,
                anchor_weight=1.0, adapt_scope="nn")
            adapted_full = adapt_subject(
                params, window, config, R, 50, 1e-3,
                anchor_weight=1.0, adapt_scope="nn")
            row = {"w": w, "h": h, "R": R, "fit": fit, "n_hold": n_hold}
            # holdout (reveal tail) per-point squared errors
            e, m = forecast_err(params, w, fit, R, window)
            hold_errs[(w, h, "base")] = (e[m] ** 2).astype(np.float64)
            # remaining-horizon true RMSE (the deployment target)
            e, m = forecast_err(params, w, R, T, window)
            row["rem_base"] = float(np.sqrt(np.mean(e[m] ** 2)))
            for a in ALPHAS:
                pa = blend(params, adapted_fit, a)
                e, m = forecast_err(pa, w, fit, R, window)
                hold_errs[(w, h, f"a{a}")] = (e[m] ** 2).astype(np.float64)
                pf = blend(params, adapted_full, a)
                e, m = forecast_err(pf, w, R, T, window)
                row[f"rem_a{a}"] = float(np.sqrt(np.mean(e[m] ** 2)))
                # also: remaining RMSE if we deployed the FIT-adapted blend
                e, m = forecast_err(pa, w, R, T, window)
                row[f"rem_fit_a{a}"] = float(np.sqrt(np.mean(e[m] ** 2)))
            rows.append(row)
            print(f"w={w} h={h} base={row['rem_base']:.4f} "
                  + " ".join(f"a{a}={row[f'rem_a{a}']:.4f}" for a in ALPHAS),
                  flush=True)

    out = REPO / "results" / (
        "guard_probe.npz" if half == "test" else "guard_probe_val.npz")
    np.savez(
        out,
        rows=json.dumps(rows),
        glucose_std=float(ds.state_std[state_index]),
        **{f"hold_{w}_{h}_{tag}": v for (w, h, tag), v in hold_errs.items()},
    )
    print(f"wrote {out} in {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "test")
