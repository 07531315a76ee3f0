"""Sobol GSA value-parity benchmark (VERDICT r3 next-round #2).

Produces `results/sobol_gsa.json`, the measured counterpart of the last
manuscript table with no artifact: the published time-aggregated total-order
Sobol indices (`/root/reference/manuscript.tex:827-833`):

    a_GI  S-bar_T = 0.23,   rho  S-bar_T = 0.15,
    followed by V_max, k_GE0, k_I;  EC_50 and p_7 below 0.10.

Two arms, both on the fig2 simulation protocol (basal start, 75 mmol meal
bolus at t=30 min, 5 h horizon — `plots/plot_all.py:163-196` parity):

  * `manuscript`: time-resolved GSA of the GLUCOSE trajectory on the
    mechanistic model at the population (Table-I) parameters — the setting
    the manuscript's CVODE study describes (`manuscript.tex:813-817`).
    Parameter set = the reference CODE's 7-parameter problem
    (`plot_all.py:139-148` = DEFAULT_PROBLEM, +/-20%%-class bounds around
    Table-I values) — NOTE the code FIXES k_GE0 even though the manuscript
    text ranks it: sweeping it is the `extended` arm below. S-bar_T =
    time-aggregated ST, both variance-weighted (glucose-variance weights,
    the standard aggregation) and plain mean.
  * `extended`: same protocol with the manuscript's named parameters
    (a_GI, rho, V_max, k_GE0, k_I, EC_50, p_7) all swept at +/-20%%.
    Measured finding: k_GE0 then carries ~100%% of glucose variance at
    every time point — consistent with the manuscript's own absorption-
    phase remark but NOT with its aggregate ranking placing k_GE0 fourth;
    the published S-bar_T values are only reachable over the code's
    k_GE0-fixed parameter set. Documented as a reference code/manuscript
    discrepancy (cf. the unreproducible 0.0032 s/epoch claim, SURVEY §6).
  * `fig2_hybrid`: the fig2 outputs (glucose AUC, insulin peak, GLP-1
    response; 3 scalar outputs) on the TRAINED flagship hybrid checkpoint,
    S1/ST with bootstrap CIs — parity with `plot_all.py:199-215` (SALib S1
    + conf). DEVIATION from the reference's protocol: the flagship is
    trained on z-scored states, so the scenario is a validation WINDOW in
    the model's own space with outputs denormalized, and the bounds are
    RELATIVE (+/-20%%) around the TRAINED parameter values — the
    reference sweeps absolute Table-I bounds on a z-score-trained model,
    which on this checkpoint simply diverges (NaN trajectories; measured).

All n*(d+2) simulations run as vmapped batches on the TPU; bootstrap CIs
(default 200 resamples) per `plots/sobol.py:sobol_analyze`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MANUSCRIPT_TARGETS = {"a_GI": 0.23, "rho": 0.15}
#: manuscript ranking: a_GI > rho > {V_max, k_GE0, k_I} > {EC_50, p_7} < 0.10
MANUSCRIPT_PARAMS = ("a_GI", "rho", "V_max", "k_GE0", "k_I", "EC_50", "p_7")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default=str(REPO / "checkpoints/accuracy_benchmark/best_model"))
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--boot", type=int, default=200)
    ap.add_argument("--out", default=str(REPO / "results/sobol_gsa.json"))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np

    from hybrid_ode_tpu.dynamics.ode_core import DEFAULT_ODE_PARAMS
    from hybrid_ode_tpu.models.hybrid import (
        HybridConfig, config_from_dict, init_hybrid_params)
    from hybrid_ode_tpu.plots.figures import make_fig2_simulator
    from hybrid_ode_tpu.plots.sobol import (
        DEFAULT_PROBLEM, sobol_sensitivity)
    from hybrid_ode_tpu.utils.checkpoint import load_checkpoint

    results = {"n": args.n, "n_boot": args.boot,
               "manuscript_targets_ST": MANUSCRIPT_TARGETS}

    import jax.numpy as jnp

    from hybrid_ode_tpu.plots.sobol import saltelli_sample

    mech_cfg = HybridConfig(solver="rk4", substeps=6, mode="scan", use_nn=False)
    mech_params = init_hybrid_params(jax.random.PRNGKey(0), mech_cfg)
    sim_t = make_fig2_simulator(mech_params, mech_cfg, outputs="glucose_t")

    def time_resolved_arm(problem):
        """Time-resolved glucose GSA + both time aggregations of ST."""
        names = list(problem)
        t0 = time.time()
        res = sobol_sensitivity(sim_t, problem, n=args.n, seed=0,
                                n_boot=args.boot)
        # variance weights: per-time-point glucose variance share of the
        # Saltelli base sweep (one extra A+B pass; each point's ST is
        # normalized by its own variance, so aggregation needs the weights)
        A, B, _ = saltelli_sample([problem[k] for k in names], args.n, seed=0)
        rows = np.concatenate([A, B], axis=0)

        def sim_row(row):
            return sim_t({name: row[i] for i, name in enumerate(names)})

        YA = np.asarray(jax.jit(jax.vmap(sim_row))(
            jnp.asarray(rows, jnp.float32)))
        var_t = YA.var(axis=0)
        w = var_t / max(var_t.sum(), 1e-12)

        ST_t = res["ST"]  # (d, 61)
        st_weighted = (ST_t * w[None, :]).sum(axis=1)
        st_mean = ST_t.mean(axis=1)
        stc_weighted = (res["ST_conf"] * w[None, :]).sum(axis=1)
        order = np.argsort(-st_weighted)
        return {
            "model": "mechanistic-only, population (Table-I) parameters",
            "output": "glucose trajectory, 61 points",
            "params": names,
            "bounds": {k: list(map(float, v)) for k, v in problem.items()},
            "ST_bar_weighted": {n: round(float(v), 4)
                                for n, v in zip(names, st_weighted)},
            "ST_bar_weighted_conf95": {n: round(float(v), 4)
                                       for n, v in zip(names, stc_weighted)},
            "ST_bar_plain_mean": {n: round(float(v), 4)
                                  for n, v in zip(names, st_mean)},
            "ranking_by_ST_bar": [names[i] for i in order],
            "wall_s": round(time.time() - t0, 2),
            "n_sims": int(args.n * (len(names) + 2) + 2 * args.n),
        }

    # ---- arm 1: manuscript values over the CODE's parameter set ----
    results["manuscript_arm"] = time_resolved_arm(dict(DEFAULT_PROBLEM))
    results["manuscript_arm"]["manuscript_ranking_head"] = ["a_GI", "rho"]

    # ---- arm 1b: manuscript's own named parameter set (k_GE0 swept) ----
    problem_ext = {
        name: (0.8 * DEFAULT_ODE_PARAMS[name], 1.2 * DEFAULT_ODE_PARAMS[name])
        for name in MANUSCRIPT_PARAMS
    }
    results["extended_arm"] = time_resolved_arm(problem_ext)
    results["extended_arm"]["note"] = (
        "k_GE0, fixed by the reference's fig2 code but ranked 4th by the "
        "manuscript, carries ~all glucose variance when actually swept — "
        "the published S-bar_T values are only reachable over the code's "
        "k_GE0-fixed parameter set (documented code/manuscript discrepancy)")
    ranking = results["manuscript_arm"]["ranking_by_ST_bar"]

    # ---- arm 2: fig2 outputs on the trained flagship hybrid (z-space) ----
    from hybrid_ode_tpu.data.dataset import create_data_arrays, split_dataset
    from hybrid_ode_tpu.dynamics.controls import Controls
    from hybrid_ode_tpu.models.hybrid import forward

    state, meta = load_checkpoint(args.checkpoint)
    params = state["params"]
    config = config_from_dict(meta.get("config", {}))
    ds = create_data_arrays(str(REPO / "data/4gi_dataset.csv"), 61, 30)
    _, va, _ = split_dataset(ds, seed=42)
    w0 = 0  # one representative validation window as the GSA scenario
    y0_z = jnp.asarray(va.initial_state[w0])
    ts_w = jnp.asarray(va.time_points[w0])
    controls_w = Controls(ts=ts_w, signals={
        "meal": jnp.asarray(va.meal[w0]), "tVNS": jnp.asarray(va.tvns[w0])})
    mean6 = jnp.asarray(va.state_mean)
    std6 = jnp.asarray(va.state_std)
    dt_h = float(va.time_points[w0][1] - va.time_points[w0][0])

    problem_h = {}
    for name in DEFAULT_PROBLEM:
        v = float(np.asarray(params["ode"][name]))
        problem_h[name] = tuple(sorted((0.8 * v, 1.2 * v)))

    def sim_h(overrides):
        p = dict(params)
        p["ode"] = dict(params["ode"])
        for k, v in overrides.items():
            p["ode"][k] = v
        traj = forward(p, y0_z, ts_w, controls_w, config) * std6 + mean6
        auc = jnp.trapezoid(traj[:, 0], dx=dt_h)
        ipeak = jnp.max(traj[:, 1])
        glp1_resp = jnp.mean(traj[6:, 3])
        return jnp.stack([auc, ipeak, glp1_resp])

    t0 = time.time()
    res_h = sobol_sensitivity(sim_h, problem_h, n=args.n, seed=0,
                              n_boot=args.boot)
    names_h = res_h["names"]
    outputs = ["glucose_auc", "insulin_peak", "glp1_response"]
    results["fig2_hybrid_arm"] = {
        "checkpoint": args.checkpoint,
        "protocol": "z-space val window, relative +/-20% bounds around trained values (see module docstring DEVIATION)",
        "bounds": {k: [round(float(b), 6) for b in v] for k, v in problem_h.items()},
        "params": names_h,
        "outputs": outputs,
        "S1": {o: {n: round(float(res_h["S1"][i, j]), 4)
                   for i, n in enumerate(names_h)}
               for j, o in enumerate(outputs)},
        "S1_conf95": {o: {n: round(float(res_h["S1_conf"][i, j]), 4)
                          for i, n in enumerate(names_h)}
                      for j, o in enumerate(outputs)},
        "ST": {o: {n: round(float(res_h["ST"][i, j]), 4)
                   for i, n in enumerate(names_h)}
               for j, o in enumerate(outputs)},
        "ST_conf95": {o: {n: round(float(res_h["ST_conf"][i, j]), 4)
                          for i, n in enumerate(names_h)}
                      for j, o in enumerate(outputs)},
        "wall_s": round(time.time() - t0, 2),
    }

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({
        "ST_bar_weighted": results["manuscript_arm"]["ST_bar_weighted"],
        "ranking": ranking,
    }))


if __name__ == "__main__":
    main()
