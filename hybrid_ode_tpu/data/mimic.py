"""MIMIC-IV glucose/insulin pipeline (synthetic placeholder, parquet output).

Equivalent of the reference `data/download_mimic.py:29-287`: PhysioNet
credentialed download is stubbed (zero-egress environments; the reference's
"download" also just synthesises data, `download_mimic.py:86-137`), so this
module generates MIMIC-like irregular clinical records, grids them, and
writes Parquet with embedded metadata.

Clinical-preprocessing upgrades actually consumed by the framework (the
reference declares a `clinical:` config section it never reads — SURVEY.md
§2.6): outlier removal at a z-score threshold, completeness filtering, and
mask-don't-interpolate missingness (NaNs survive to the dataset layer, which
converts them to observation masks — `modification_report.md:60-64`).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("hybrid_ode_tpu.mimic")


class MIMICDownloader:
    """API parity with the reference class (check_credentials/download_tables/
    interpolate_to_grid/save_to_parquet/run)."""

    def __init__(self, username: Optional[str] = None, password: Optional[str] = None,
                 output_dir: str = "data"):
        self.username = username
        self.password = password
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

    def check_credentials(self) -> bool:
        """Credential check stub (reference `download_mimic.py:52-66` is also
        a stub). Real PhysioNet access requires credentialed approval."""
        if not self.username:
            logger.warning("no PhysioNet credentials; generating synthetic MIMIC-like data")
        return True

    def download_tables(self, n_patients: int = 100, points_per_patient: int = 50,
                        seed: int = 0):
        """Generate synthetic MIMIC-like records (parity with the reference
        generator `download_mimic.py:86-137`: ~30% diabetic patients with
        higher baselines, meal-hour glucose excursions, irregular sampling)."""
        import pandas as pd

        rng = np.random.default_rng(seed)
        rows = []
        for pid in range(n_patients):
            diabetic = rng.uniform() < 0.3
            base_glu = rng.normal(9.5, 1.5) if diabetic else rng.normal(5.5, 0.7)
            base_ins = rng.normal(90, 20) if diabetic else rng.normal(55, 12)
            # irregular charting: exponential gaps, mean ~20 min
            gaps = rng.exponential(20.0, points_per_patient)
            t_min = np.cumsum(gaps)
            hours_of_day = (t_min / 60.0) % 24
            meal_effect = 1.5 * np.exp(
                -0.5 * np.minimum.reduce([
                    (hours_of_day - 7.5) ** 2, (hours_of_day - 12.5) ** 2,
                    (hours_of_day - 18.5) ** 2,
                ])
            )
            glucose = base_glu + meal_effect + rng.normal(0, 0.6, points_per_patient)
            insulin = base_ins + 8.0 * meal_effect + rng.normal(0, 8, points_per_patient)
            # sparse labs: glucagon/GLP-1 mostly missing in real EHR
            glucagon = np.where(rng.uniform(size=points_per_patient) < 0.2,
                                rng.normal(80, 12, points_per_patient), np.nan)
            glp1 = np.where(rng.uniform(size=points_per_patient) < 0.1,
                            rng.normal(20, 6, points_per_patient), np.nan)
            rows.append(pd.DataFrame({
                "subject_id": pid,
                "time_minutes": t_min,
                "glucose_mmol_L": np.maximum(glucose, 2.0),
                "insulin_pmol_L": np.maximum(insulin, 5.0),
                "glucagon_pmol_L": glucagon,
                "glp1_pmol_L": glp1,
                "diabetic": diabetic,
            }))
        return pd.concat(rows, ignore_index=True)

    def interpolate_to_grid(self, df, grid_minutes: float = 5.0,
                            interpolate: bool = False):
        """Resample each subject to a regular grid.

        interpolate=False (default): nearest-sample assignment within half a
        grid step; unobserved slots stay NaN -> downstream observation masks
        (mask-don't-interpolate). interpolate=True reproduces the reference's
        linear interpolation (`download_mimic.py:141-192`).
        """
        import pandas as pd

        out = []
        value_cols = ["glucose_mmol_L", "insulin_pmol_L", "glucagon_pmol_L", "glp1_pmol_L"]
        for pid, sub in df.groupby("subject_id"):
            sub = sub.sort_values("time_minutes")
            t = sub["time_minutes"].to_numpy()
            grid = np.arange(0.0, t[-1] + grid_minutes, grid_minutes)
            rec: Dict[str, np.ndarray] = {"subject_id": pid, "time_minutes": grid}
            for col in value_cols:
                v = sub[col].to_numpy()
                ok = np.isfinite(v)
                if interpolate and ok.sum() >= 2:
                    rec[col] = np.interp(grid, t[ok], v[ok])
                else:
                    filled = np.full_like(grid, np.nan)
                    if ok.any():
                        idx = np.searchsorted(t[ok], grid)
                        idx = np.clip(idx, 0, ok.sum() - 1)
                        near_t = t[ok][idx]
                        close = np.abs(near_t - grid) <= grid_minutes / 2
                        filled[close] = v[ok][idx[close]]
                    rec[col] = filled
            rec["diabetic"] = np.full(len(grid), bool(sub["diabetic"].iloc[0]))
            out.append(pd.DataFrame(rec))
        return pd.concat(out, ignore_index=True)

    def clean(self, df, outlier_threshold: float = 5.0,
              min_sequence_completeness: float = 0.0):
        """Clinical cleaning consumed from the `clinical:` config section."""
        value_cols = ["glucose_mmol_L", "insulin_pmol_L"]
        for col in value_cols:
            v = df[col]
            z = (v - v.mean()) / (v.std() + 1e-9)
            df.loc[np.abs(z) > outlier_threshold, col] = np.nan
        if min_sequence_completeness > 0:
            keep = []
            for pid, sub in df.groupby("subject_id"):
                completeness = np.isfinite(sub["glucose_mmol_L"]).mean()
                if completeness >= min_sequence_completeness:
                    keep.append(pid)
            df = df[df["subject_id"].isin(keep)]
        return df

    def save_to_parquet(self, df, filename: str = "mimic_glucose_insulin.parquet",
                        metadata: Optional[Dict] = None):
        """Parquet with embedded metadata (parity `download_mimic.py:194-225`)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pandas(df)
        meta = {k: str(v) for k, v in (metadata or {}).items()}
        meta["generator"] = "hybrid_ode_tpu.data.mimic (synthetic)"
        existing = table.schema.metadata or {}
        table = table.replace_schema_metadata(
            {**existing, **{k.encode(): v.encode() for k, v in meta.items()}}
        )
        path = self.output_dir / filename
        pq.write_table(table, path)
        logger.info("wrote %s (%d rows)", path, len(df))
        return path

    def run(self, n_patients: int = 100, grid_minutes: float = 5.0,
            interpolate: bool = False, outlier_threshold: float = 5.0,
            min_completeness: float = 0.0, seed: int = 0):
        self.check_credentials()
        raw = self.download_tables(n_patients=n_patients, seed=seed)
        gridded = self.interpolate_to_grid(raw, grid_minutes, interpolate)
        cleaned = self.clean(gridded, outlier_threshold, min_completeness)
        return self.save_to_parquet(
            cleaned,
            metadata={"n_patients": n_patients, "grid_minutes": grid_minutes,
                      "interpolated": interpolate, "seed": seed},
        )


# ---------------------------------------------------------------------------
# Physiologically-grounded ICU cohort (round 3)
# ---------------------------------------------------------------------------


def generate_icu_cohort(
    path: Optional[str] = None,
    n_patients: int = 80,
    hours: float = 72.0,
    grid_minutes: float = 5.0,
    seed: int = 0,
    obs_gap_min: float = 40.0,
    t2dm_fraction: float = 0.7,
    output_dir: str = "data",
    per_channel_charting: bool = False,
    dose_scale=1.0,            # float or (n_patients,) protocol-gain multiplier
    protocol_gain=900.0,       # float or (n_patients,) per-patient gains
    protocol_target=7.0,       # float or (n_patients,) per-patient targets
    protocol_basal=0.0,        # float or (n_patients,) basal infusion, pmol/h
    protocol_max_rate=7000.0,  # infusion-rate cap, pmol/h
    secretion_scale=1.0,       # float or (n_patients,) beta-cell failure factor
    carb_scale=1.0,            # float or (n_patients,) enteral-feed multiplier
    param_scales=None,         # {param: float|(n_patients,)} 4GI multipliers
):
    """Synthetic ICU glucose-management cohort with REAL dynamics.

    The reference's synthetic "MIMIC" generator draws glucose as baseline +
    meal-hour Gaussian bumps + iid noise (`download_mimic.py:86-137`) — it
    has NO differential structure, so a mechanistic glucose-insulin prior
    cannot be informative on it and the hybrid's central claimed advantage
    (manuscript.tex:753-768: mech 1.10 / NN 0.85 / hybrid 0.72 mmol/L)
    is unreachable by construction (measured in round 2: hybrid 0.950 vs
    NN-only 0.921). This generator closes that gap the defensible way:
    each patient is simulated from the 8-state 4GI physiology
    (`dynamics/fourgi.py` — a RICHER model family than the 6-state
    mechanistic core the trained models use, so the hybrid cannot win "by
    construction") under ICU-style exogenous drivers:

      * enteral nutrition: randomized continuous carb-infusion blocks
        (4-8 h on, 2-4 h off) + occasional IV dextrose boluses;
      * exogenous IV insulin under a sliding-scale protocol: the infusion
        rate is recomputed at hourly "nurse checks" from the currently
        charted glucose — a closed feedback loop, simulated in hourly
        chunks exactly as an ICU runs it. `dose_scale` multiplies the
        protocol gain (0 = withhold insulin), enabling paired
        counterfactual cohorts at a fixed seed for in-silico
        intervention studies (benchmarks/intervention.py);
      * UNMODELED physiology both model families must learn from data:
        circadian modulation of endogenous glucose production and random
        stress (cortisol-like) excursion episodes;
      * per-patient parameter heterogeneity (insulin sensitivity/clearance
        log-normal jitter) on top of the T2DM / healthy split.

    Observations are sparse and irregular: charting events with exponential
    gaps (mean `obs_gap_min`), all channels assayed at an event (the
    dataset layer masks whole rows), multiplicative assay noise. The carb
    and insulin infusion rates are exported as the `meal_indicator` and
    `tvns` control columns (scaled to O(1)), so trained models condition
    on what the care team actually did — the mechanistic core sees the
    carb input in its dG term; the insulin input's routing is set by
    HybridConfig.exog_insulin ('nn' = NN feature only, measured to be
    confounded under this closed loop; 'mech' = causal mechanistic
    routing via k_ex).

    Noiseless truth columns ride along for truth-referenced evaluation.
    """
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from hybrid_ode_tpu.dynamics.fourgi import (
        fourgi_field,
        fourgi_initial_state,
        fourgi_params,
    )
    from hybrid_ode_tpu.solvers.api import odeint

    rng = np.random.default_rng(seed)
    N = n_patients
    dt_h = grid_minutes / 60.0
    T = int(round(hours / dt_h)) + 1
    t_grid = np.arange(T) * dt_h                      # (T,) hours
    steps_per_hour = int(round(1.0 / dt_h))

    # --- per-patient physiology ------------------------------------------
    diabetic = rng.uniform(size=N) < t2dm_fraction
    p_t2 = fourgi_params("T2DM")
    p_hv = fourgi_params("HV")
    jitter_cv = {"CLglc": 0.25, "CLglci": 0.30, "CLins": 0.20,
                 "BSLglc": 0.12, "BSLins": 0.20, "BSLglp": 0.15, "BSLglg": 0.15}
    params = {}
    for name in p_t2:
        base = np.where(diabetic, float(p_t2[name]), float(p_hv[name]))
        if name in jitter_cv:
            base = base * np.exp(jitter_cv[name] * rng.standard_normal(N)
                                 - 0.5 * jitter_cv[name] ** 2)
        params[name] = jnp.asarray(base, jnp.float32)   # (N,)
    # Severity knobs — all rng-FREE (no extra draws), so dysglycemic cohorts
    # at a fixed seed stay exactly rng-paired with the standard cohort and
    # with every protocol counterfactual (the dosing-study contract below).
    # `param_scales` multiplies named 4GI parameters per patient (e.g. a
    # wide CLglci spread creates insulin-sensitive, hypo-prone patients);
    # `secretion_scale` < 1 is progressive beta-cell failure (the production
    # term in `fourgi_field` — these patients NEED exogenous insulin).
    for name, sc in (param_scales or {}).items():
        sc = np.broadcast_to(np.asarray(sc, np.float64), (N,))
        params[name] = params[name] * jnp.asarray(sc, jnp.float32)
    params["secretion_scale"] = jnp.asarray(
        np.broadcast_to(np.asarray(secretion_scale, np.float64), (N,)),
        jnp.float32)

    # --- exogenous carb schedule (enteral blocks + dextrose boluses) ------
    carb = np.zeros((N, T), np.float64)                 # mmol glucose / h
    for i in range(N):
        t = 0.0
        while t < hours:
            on = rng.uniform(4.0, 8.0)
            rate = rng.uniform(10.0, 35.0)
            i0, i1 = int(t / dt_h), min(int((t + on) / dt_h), T)
            carb[i, i0:i1] += rate
            t += on + rng.uniform(2.0, 4.0)             # off-block
        for _ in range(rng.poisson(2.0)):               # IV dextrose boluses
            tb = rng.uniform(0, hours - 0.25)
            i0 = int(tb / dt_h)
            carb[i, i0: i0 + 3] += 25.0 / 0.25          # 25 mmol over 15 min
    # rng-free severity multiplier (heavier enteral feeding) — see above
    carb *= np.broadcast_to(np.asarray(carb_scale, np.float64), (N,))[:, None]

    # --- unmodeled physiology: circadian + stress episodes ----------------
    circ_amp = rng.uniform(0.08, 0.20, N)
    circ_phase = rng.uniform(0, 24, N)
    circ = circ_amp[:, None] * np.sin(
        2 * np.pi * (t_grid[None, :] - circ_phase[:, None]) / 24.0
    )
    stress = np.zeros((N, T), np.float64)
    for i in range(N):
        for _ in range(rng.poisson(2.5)):
            t0s = rng.uniform(0, hours - 1.0)
            dur = rng.uniform(1.0, 3.0)
            amp = rng.uniform(0.15, 0.45)
            i0, i1 = int(t0s / dt_h), min(int((t0s + dur) / dt_h), T)
            stress[i, i0:i1] += amp
    # fractional modulation of endogenous glucose production
    prod_mod = jnp.asarray(1.0 + circ + stress, jnp.float32)     # (N, T)
    carb_j = jnp.asarray(carb, jnp.float32)
    ts_j = jnp.asarray(t_grid, jnp.float32)

    def icu_field(t, y, args):
        p, carb_row, mod_row, ins_rate = args
        idx = jnp.clip(
            jnp.searchsorted(ts_j, t, side="right") - 1, 0, T - 2
        )
        dy = fourgi_field(t, y, p, {"meal_rate": carb_row[idx],
                                    "secretion_scale": p["secretion_scale"]})
        KINglc = p["BSLglc"] * (p["CLglc"] + p["CLglci"] * p["BSLins"])
        dy = dy.at[0].add(KINglc * (mod_row[idx] - 1.0))  # circadian+stress
        dy = dy.at[1].add(ins_rate)                       # IV insulin, pmol/h
        return dy

    # --- closed-loop simulation in hourly chunks (sliding scale) ----------
    n_chunks = int(round(hours))

    @jax.jit
    def sim_chunk(y0, chunk_ts, ins_rate):
        def one(y0_i, carb_i, mod_i, rate_i, leaves):
            p_i = dict(zip(sorted(params), leaves))
            return odeint(
                icu_field, y0_i, chunk_ts, (p_i, carb_i, mod_i, rate_i),
                solver="dopri5", rtol=1e-5, atol=1e-7, mode="while",
                max_steps_per_interval=32, checkpoint_intervals=False,
            )
        leaves = [params[k] for k in sorted(params)]
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
            y0, carb_j, prod_mod, ins_rate, leaves
        )

    y0 = jax.vmap(lambda *leaves: fourgi_initial_state(
        dict(zip(sorted(params), leaves))))(*[params[k] for k in sorted(params)])
    # start T2DM patients hyperglycaemic (ICU admission state)
    admit = 1.0 + rng.uniform(0.0, 0.6, N) * diabetic
    y0 = y0.at[:, 0].mul(jnp.asarray(admit, jnp.float32))
    y0 = y0.at[:, 5].mul(jnp.asarray(admit, jnp.float32))

    ins_rate = jnp.zeros((N,), jnp.float32)
    traj = np.zeros((N, T, 8), np.float32)
    traj[:, 0] = np.asarray(y0)
    ins_rate_grid = np.zeros((N, T), np.float32)
    # sliding-scale protocol parameters. `protocol_gain`/`protocol_target`
    # (and the `dose_scale` multiplier) change NO rng consumption, so any
    # protocol variant at a fixed seed is an exactly paired counterfactual —
    # the ground-truth validation hook for model-based protocol optimization
    # (models/protocol.py, benchmarks/dose_optimize.py). Scalars apply one
    # population protocol; (n_patients,) arrays personalize it per patient.
    protocol_gain = np.broadcast_to(np.asarray(protocol_gain, np.float64), (N,))
    glucose_target = np.broadcast_to(
        np.asarray(protocol_target, np.float64), (N,))
    # Basal component: a continuous background infusion that does NOT stop
    # when charted glucose crosses the target — the classic ICU
    # over-insulinization mechanism (basal rides through enteral feed
    # interruptions), so basal-heavy protocol arms carry REAL hypoglycemia
    # risk. rate = clip(basal + gain * (G - target), 0, max_rate); the model
    # rollout mirrors this law exactly (models/protocol.py
    # `closed_loop_rollout`). Default 0 keeps every pre-existing cohort
    # byte-identical (pure proportional scale).
    protocol_basal = np.broadcast_to(
        np.asarray(protocol_basal, np.float64), (N,))
    dose_scale = np.broadcast_to(np.asarray(dose_scale, np.float64), (N,))
    for c in range(n_chunks):
        i0 = c * steps_per_hour
        i1 = min(i0 + steps_per_hour, T - 1)
        chunk_ts = ts_j[i0: i1 + 1]
        out = sim_chunk(jnp.asarray(traj[:, i0]), chunk_ts, ins_rate)
        traj[:, i0: i1 + 1] = np.asarray(out)
        ins_rate_grid[:, i0: i1 + 1] = np.asarray(ins_rate)[:, None]
        # nurse check: charted glucose (with meter noise) -> new rate
        G = traj[:, i1, 0] / np.asarray(params["VCglc"])
        G_meter = G * (1.0 + 0.03 * rng.standard_normal(N))
        # `dose_scale` multiplies the sliding-scale gain — the hook for
        # in-silico intervention studies (benchmarks/intervention.py).
        # Every rng draw is identical across dose_scale values, so cohorts
        # generated at the same seed are exactly paired counterfactuals:
        # same patients, carb schedules, stress episodes, charting events
        # and assay noise; only the insulin pathway differs.
        new_rate = np.clip(
            dose_scale * (protocol_basal
                          + protocol_gain * (G_meter - glucose_target)),
            0.0, protocol_max_rate)
        ins_rate = jnp.asarray(new_rate, jnp.float32)

    conc = {
        "glucose": traj[..., 0] / np.asarray(params["VCglc"])[:, None],
        "insulin": traj[..., 1] / np.asarray(params["VCins"])[:, None],
        "glp1": traj[..., 2] / np.asarray(params["VCglp"])[:, None],
        "glucagon": traj[..., 3] / np.asarray(params["VCglg"])[:, None],
    }

    # --- sparse irregular charting + assay noise --------------------------
    # per_channel_charting=True: each channel has its OWN event schedule
    # (glucose every check, insulin less often, glucagon/GLP-1 only at rare
    # lab draws) — the realistic EHR pattern; load with
    # `create_data_arrays(..., per_channel_mask=True)` so partially-observed
    # rows stay usable. False (default): all channels assayed at every
    # charting event (complete rows for the row-mask dataset layer).
    cv = {"glucose": 0.02, "insulin": 0.08, "glp1": 0.12, "glucagon": 0.10}
    gap_mult = {"glucose": 1.0, "insulin": 2.0, "glucagon": 8.0, "glp1": 10.0}
    frames = []
    for i in range(N):
        def event_mask(gap):
            evts = np.cumsum(rng.exponential(gap, max(int(hours * 60 / gap * 2), 4)))
            evts = evts[evts < hours * 60.0]
            idx = np.unique(np.clip(np.round(evts / grid_minutes).astype(int), 0, T - 1))
            m = np.zeros(T, bool)
            m[idx] = True
            m[0] = True
            return m

        shared = event_mask(obs_gap_min)
        cols: Dict[str, np.ndarray] = {
            "subject_id": np.full(T, i),
            "time_minutes": t_grid * 60.0,
        }
        for name, unit in (("glucose", "mmol_L"), ("insulin", "pmol_L"),
                           ("glucagon", "pmol_L"), ("glp1", "pmol_L")):
            obs_mask = (event_mask(obs_gap_min * gap_mult[name])
                        if per_channel_charting else shared)
            v = conc[name][i] * (1.0 + cv[name] * rng.standard_normal(T))
            v = np.where(obs_mask, np.maximum(v, 0.1), np.nan)
            cols[f"{name}_{unit}"] = v
            cols[f"{name}_true_{unit}"] = conc[name][i]
        cols["meal_indicator"] = carb[i] / 20.0          # O(1) carb rate
        cols["tvns"] = ins_rate_grid[i] / 2000.0         # O(1) insulin rate
        cols["diabetic"] = np.full(T, bool(diabetic[i]))
        frames.append(pd.DataFrame(cols))
    df = pd.concat(frames, ignore_index=True)

    if path is None:
        path = str(Path(output_dir) / "icu_cohort.parquet")
    MIMICDownloader(output_dir=str(Path(path).parent)).save_to_parquet(
        df, Path(path).name,
        metadata={"generator": "hybrid_ode_tpu ICU cohort (4GI + exogenous "
                  "insulin + circadian/stress)", "n_patients": N,
                  "hours": hours, "seed": seed, "obs_gap_min": obs_gap_min,
                  "dose_scale": np.asarray(dose_scale).tolist(),
                  "protocol_gain": np.asarray(protocol_gain).tolist(),
                  "protocol_target": np.asarray(glucose_target).tolist(),
                  "protocol_basal": np.asarray(protocol_basal).tolist(),
                  "protocol_max_rate": float(protocol_max_rate),
                  "secretion_scale":
                      np.asarray(params["secretion_scale"]).tolist()},
    )
    return df


if __name__ == "__main__":
    import argparse
    import getpass

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description="MIMIC glucose/insulin pipeline (synthetic)")
    ap.add_argument("--username", default=None)
    ap.add_argument("--password-prompt", action="store_true")
    ap.add_argument("--output-dir", default="data")
    ap.add_argument("--patients", type=int, default=100)
    ap.add_argument("--grid-minutes", type=float, default=5.0)
    ap.add_argument("--interpolate", action="store_true",
                    help="linear interpolation (reference behavior) instead of masking")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    pw = getpass.getpass("PhysioNet password: ") if a.password_prompt else None
    MIMICDownloader(a.username, pw, a.output_dir).run(
        n_patients=a.patients, grid_minutes=a.grid_minutes,
        interpolate=a.interpolate, seed=a.seed,
    )


def generate_icu_cohort_varied(
    path: Optional[str] = None,
    n_patients: int = 80,
    hours: float = 72.0,
    seed: int = 0,
    **kw,
):
    """ICU cohort with per-patient PROTOCOL VARIATION — the
    identification-friendly training regime.

    Measured motivation (RESULTS.md causal-routing study): under the single
    factual protocol (gain 900, target 7) these ~5.6-6.1 mmol/L patients are
    almost never dosed (mean 45 pmol/h), so the exogenous-insulin gain k_ex
    is under-identified and the learned dose response is ~6x attenuated even
    with causal routing. Real ICUs vary sliding scales across units and
    physicians; sampling per-patient targets U(5, 9) and gains
    900 x U(0.25, 3) reproduces that practice variation, generates actual
    dosing in the training data, and de-confounds the insulin channel the
    standard observational-causal way (policy variation).

    The protocol draws use an rng stream derived from (but independent of)
    `seed`, so the physiology/charting randomness stays paired with the
    factual cohort at the same seed.
    """
    prng = np.random.default_rng(seed + 10_000)
    gains = 900.0 * prng.uniform(0.25, 3.0, n_patients)
    targets = prng.uniform(5.0, 9.0, n_patients)
    return generate_icu_cohort(path=path, n_patients=n_patients, hours=hours,
                               seed=seed, protocol_gain=gains,
                               protocol_target=targets, **kw)


def dysglycemic_severity(n_patients: int, seed: int = 0):
    """Per-patient severity draws for the dysglycemic ICU subpopulation.

    Drawn from an rng stream derived from (but independent of) `seed`, so
    the physiology/charting randomness of `generate_icu_cohort` stays
    exactly paired across severity settings and protocol counterfactuals.

    Returns (secretion_scale, param_scales, carb_scale):
      * secretion_scale ~ U(0.05, 0.30): progressive beta-cell failure —
        these patients re-equilibrate hyperglycaemic without exogenous
        insulin (withhold arms have REAL hyper risk);
      * param_scales['CLglci'] ~ logN(0, 0.55): a wide insulin-sensitivity
        spread — the sensitive tail is hypo-prone under aggressive sliding
        scales (low-target/high-gain arms have REAL hypo risk);
      * carb_scale ~ U(1.0, 1.6): heavier enteral feeding.
    """
    srng = np.random.default_rng(seed + 20_000)
    secretion = srng.uniform(0.05, 0.30, n_patients)
    sens = np.exp(0.55 * srng.standard_normal(n_patients))
    carb = srng.uniform(1.0, 1.6, n_patients)
    return secretion, {"CLglci": sens}, carb


def generate_icu_cohort_dysglycemic(
    path: Optional[str] = None,
    n_patients: int = 80,
    hours: float = 72.0,
    seed: int = 0,
    varied_protocol: bool = False,
    **kw,
):
    """ICU cohort of DYSGLYCEMIC patients — the protocol-evaluation regime.

    Measured motivation (round-4 dosing study, results/dose_optimization.json
    r4): on the standard cohort the patients' intact endogenous secretion
    closed-loop compensates every sliding scale — true risk across a
    12-protocol grid was flat to ~4 significant figures (0.0314 +- 0.00002),
    so protocol ranking was statistically meaningless. This subpopulation
    (all-T2DM admissions with beta-cell failure, a wide insulin-sensitivity
    spread and heavy feeding — `dysglycemic_severity`) genuinely NEEDS
    exogenous insulin: withholding lets hyperglycemia ride, aggressive
    low-target scales drive the insulin-sensitive tail hypoglycemic, and the
    true risk over a protocol grid spans an order of magnitude (the spread
    precondition `benchmarks/dose_optimize.py` gates on).

    `varied_protocol=True` additionally samples per-patient sliding scales
    (as `generate_icu_cohort_varied`) — the identification-friendly TRAINING
    regime; leave False for evaluation cohorts where one candidate protocol
    is applied to everyone.
    """
    secretion, pscales, carb = dysglycemic_severity(n_patients, seed)
    if path is None:
        # never default into the STANDARD cohort's filename (a pathless
        # dysglycemic call must not clobber data/icu_cohort.parquet)
        path = "data/icu_cohort_dysglycemic.parquet"
    kw.setdefault("protocol_max_rate", 20000.0)
    if varied_protocol:
        # per-patient (gain, target, basal) spread covering the whole
        # protocol design space, INCLUDING the basal axis — the dose
        # response must be identified over the insulin range the
        # counterfactual arms will use (0..max_rate), not just around one
        # deployed scale (measured: factual-cohort training leaves the
        # response ~6x attenuated, RESULTS.md causal-routing study)
        prng = np.random.default_rng(seed + 10_000)
        kw.setdefault("protocol_gain", 900.0 * prng.uniform(0.25, 3.0, n_patients))
        kw.setdefault("protocol_target", prng.uniform(5.0, 9.0, n_patients))
        kw.setdefault("protocol_basal", prng.uniform(0.0, 12000.0, n_patients))
    return generate_icu_cohort(
        path=path, n_patients=n_patients, hours=hours, seed=seed,
        t2dm_fraction=1.0, secretion_scale=secretion, param_scales=pscales,
        carb_scale=carb, **kw)
