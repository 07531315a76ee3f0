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
