"""4GI synthetic cohort generation — whole cohorts in one vmapped solve.

Redesign of the reference `data/generate4GI.py:159-268`, which integrates one
subject at a time with `scipy.odeint` inside a Python loop over 5-minute
windows. Here the meal schedule becomes a control signal, the solver is the
framework's own adaptive RK, and the subject axis is a `vmap` axis — a 10k-
subject cohort is one XLA program.

Fidelity notes:
  * Meal handling parity: the reference distributes each meal bolus over the
    single 5-minute interval containing the meal time (`generate4GI.py:190-194`),
    i.e. a rectangular pulse of height size/interval. We build exactly that
    rectangular pulse as a zero-order-hold control evaluated inside the RHS.
  * Per-subject variability parity deviation (documented): the reference
    *accumulates* baseline perturbations across subjects because it mutates
    then resets AFTER simulating (`generate4GI.py:230-235` vs `:266`) — the
    reset puts back class-level baselines so each subject IS independent;
    we sample independent log-kept perturbations per subject directly.
  * Measurement noise: multiplicative Gaussian with per-channel CVs
    (glucose 1.0x, insulin/glp1 1.5x, glucagon 1.2x, gip 1.3x of `noise_cv`)
    matching `generate4GI.py:242-247`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_ode_tpu.dynamics.fourgi import (
    fourgi_field,
    fourgi_initial_state,
    fourgi_params,
)
from hybrid_ode_tpu.solvers.api import odeint


def _meal_rate_on_grid(
    t_hours: np.ndarray, meal_times: Sequence[float], meal_sizes: Sequence[float]
) -> np.ndarray:
    """Rectangular meal-rate pulses (mmol/h) on the sampling grid.

    Piecewise-constant: rate[i] applies on [t[i], t[i+1]). A meal at time m
    with size S contributes S/dt over the interval containing m.
    """
    rate = np.zeros_like(t_hours)
    for m, s in zip(meal_times, meal_sizes):
        for i in range(len(t_hours) - 1):
            if t_hours[i] <= m < t_hours[i + 1]:
                rate[i] = s / (t_hours[i + 1] - t_hours[i])
    return rate


def simulate_cohort(
    key: jax.Array,
    n_subjects: int = 10,
    patient_type: str = "T2DM",
    duration_hours: float = 5.0,
    sampling_interval_min: float = 5.0,
    meal_times: Sequence[float] = (1.0, 3.0),
    meal_sizes: Sequence[float] = (75.0, 50.0),
    solver: str = "dopri5",
    rtol: float = 1e-6,
    atol: float = 1e-8,
):
    """Simulate a cohort; returns (t_hours (T,), concentrations dict of (N, T))."""
    p = fourgi_params(patient_type)
    t_hours = np.arange(
        0.0, duration_hours + sampling_interval_min / 60.0, sampling_interval_min / 60.0
    )
    ts = jnp.asarray(t_hours, jnp.float32)
    meal_grid = jnp.asarray(_meal_rate_on_grid(t_hours, meal_times, meal_sizes), jnp.float32)

    # Per-subject baseline variability (reference draws N(1, cv) multipliers,
    # `generate4GI.py:230-235`).
    cvs = {"BSLglc": 0.10, "BSLins": 0.15, "BSLglp": 0.15, "BSLglg": 0.15, "BSLgip": 0.15}
    keys = jax.random.split(key, len(cvs))
    mults = {
        name: 1.0 + cv * jax.random.normal(k, (n_subjects,))
        for (name, cv), k in zip(cvs.items(), keys)
    }

    def field(t, y, args):
        params, meal = args
        # zero-order hold: rate of the interval containing t
        idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, len(t_hours) - 2)
        return fourgi_field(t, y, params, {"meal_rate": meal[idx]})

    def one_subject(mult_leaf):
        params_i = dict(p)
        for name in cvs:
            params_i[name] = p[name] * mult_leaf[name]
        y0 = fourgi_initial_state(params_i)
        return odeint(
            field, y0, ts, (params_i, meal_grid),
            solver=solver, rtol=rtol, atol=atol, mode="while",
            max_steps_per_interval=64, checkpoint_intervals=False,
        )

    trajs = jax.jit(jax.vmap(one_subject))(mults)  # (N, T, 8)

    conc = {
        "glucose": trajs[..., 0] / p["VCglc"],
        "insulin": trajs[..., 1] / p["VCins"],
        "glp1": trajs[..., 2] / p["VCglp"],
        "glucagon": trajs[..., 3] / p["VCglg"],
        "gip": trajs[..., 4] / p["VCgip"],
    }
    return t_hours, conc


def generate_4gi_dataset(
    path: Optional[str] = None,
    seed: int = 0,
    n_subjects: int = 10,
    patient_type: str = "T2DM",
    duration_hours: float = 5.0,
    sampling_interval_min: float = 5.0,
    meal_times: Sequence[float] = (1.0, 3.0),
    meal_sizes: Sequence[float] = (75.0, 50.0),
    noise_cv: float = 0.1,
):
    """Generate the 4GI CSV (schema parity: `generate4GI.py:250-261`).

    Columns: subject_id, time_hours, time_minutes, glucose_mmol_L,
    insulin_pmol_L, glp1_pmol_L, glucagon_pmol_L, gip_pmol_L, meal_indicator.
    """
    import pandas as pd

    key = jax.random.PRNGKey(seed)
    sim_key, noise_key = jax.random.split(key)
    t_hours, conc = simulate_cohort(
        sim_key, n_subjects, patient_type, duration_hours,
        sampling_interval_min, meal_times, meal_sizes,
    )

    # Multiplicative measurement noise, per-channel CV scaling.
    cv_scale = {"glucose": 1.0, "insulin": 1.5, "glp1": 1.5, "glucagon": 1.2, "gip": 1.3}
    noisy = {}
    nkeys = jax.random.split(noise_key, len(conc))
    for (name, values), k in zip(conc.items(), nkeys):
        eps = jax.random.normal(k, values.shape)
        noisy[name] = values + noise_cv * cv_scale[name] * jnp.abs(values) * eps

    meal_indicator = np.array(
        [1 if any(abs(t - m) < 0.01 for m in meal_times) else 0 for t in t_hours]
    )

    frames = []
    for sid in range(n_subjects):
        frames.append(
            pd.DataFrame(
                {
                    "subject_id": sid,
                    "time_hours": t_hours,
                    "time_minutes": t_hours * 60.0,
                    "glucose_mmol_L": np.asarray(noisy["glucose"][sid]),
                    "insulin_pmol_L": np.asarray(noisy["insulin"][sid]),
                    "glp1_pmol_L": np.asarray(noisy["glp1"][sid]),
                    "glucagon_pmol_L": np.asarray(noisy["glucagon"][sid]),
                    "gip_pmol_L": np.asarray(noisy["gip"][sid]),
                    "meal_indicator": meal_indicator,
                    # noiseless simulator truth (extra columns the reference
                    # lacks; ignored by the dataset loader, used by
                    # truth-referenced evaluation — the measurement-noise
                    # floor at noise_cv=0.1 is ~0.65 mmol/L glucose, so
                    # sub-noise RMSE claims are only checkable against truth)
                    "glucose_true_mmol_L": np.asarray(conc["glucose"][sid]),
                    "insulin_true_pmol_L": np.asarray(conc["insulin"][sid]),
                    "glp1_true_pmol_L": np.asarray(conc["glp1"][sid]),
                    "glucagon_true_pmol_L": np.asarray(conc["glucagon"][sid]),
                    "gip_true_pmol_L": np.asarray(conc["gip"][sid]),
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)
    if path is not None:
        df.to_csv(path, index=False)
    return df


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Generate the 4GI synthetic dataset")
    ap.add_argument("--out", default="data/4gi_dataset.csv")
    ap.add_argument("--subjects", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--patient-type", default="T2DM", choices=["T2DM", "HV"])
    ap.add_argument("--plot", action="store_true",
                    help="save an example plot of subject 0 (parity with the "
                         "reference's 4gi_simulation_example.png)")
    a = ap.parse_args()
    df = generate_4gi_dataset(a.out, seed=a.seed, n_subjects=a.subjects, patient_type=a.patient_type)
    print(f"wrote {a.out}: {df.shape[0]} rows, {df['subject_id'].nunique()} subjects")
    if a.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sub0 = df[df["subject_id"] == 0]
        cols = ["glucose_mmol_L", "insulin_pmol_L", "glp1_pmol_L", "glucagon_pmol_L", "gip_pmol_L"]
        titles = ["Glucose (mmol/L)", "Insulin (pmol/L)", "GLP-1 (pmol/L)",
                  "Glucagon (pmol/L)", "GIP (pmol/L)"]
        fig, axes = plt.subplots(5, 1, figsize=(10, 12), sharex=True)
        for ax, c, t in zip(axes, cols, titles):
            ax.plot(sub0["time_hours"], sub0[c], "b-", lw=2)
            ax.set_ylabel(t)
            ax.grid(True, alpha=0.3)
            for mt in sub0.loc[sub0["meal_indicator"] == 1, "time_hours"]:
                ax.axvline(mt, color="r", ls="--", alpha=0.5)
        axes[-1].set_xlabel("Time (hours)")
        fig.suptitle("4GI Model Simulation - Subject 0")
        fig.tight_layout()
        out_png = str(a.out).rsplit(".", 1)[0] + "_example.png"
        fig.savefig(out_png, dpi=150)
        print(f"example plot: {out_png}")
