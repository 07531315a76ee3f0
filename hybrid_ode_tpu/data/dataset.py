"""Windowed glucose datasets as stacked device arrays.

Redesign of the reference `GlucoseDataset` + `create_data_loaders`
(`train/train_hybrid.py:43-222`): instead of a torch Dataset yielding python
dicts per index, windows are built once with pandas/numpy and stacked into
fixed-shape arrays — the natural shape for jit/vmap/sharded training. An
epoch is a shuffled permutation over the leading axis.

Parity details kept:
  * state columns [glucose, insulin, glucagon, glp1] + placeholder ge=0.0,
    ffa=1.0 when absent (`train_hybrid.py:72-81`)
  * z-score normalisation computed over ALL windows (`:123-130`)
  * time from time_minutes/60, time_hours, or an assumed 5-min grid (`:94-100`)
  * sliding windows per subject: sequence_length 61, stride 30 (`:112-121`)
  * 70/15/15 random split with a fixed seed (default 42, `:185-193`)

New capability (SURVEY.md §7.4): observation masks. NaNs in state columns
become mask=0 entries instead of crashing — native irregular-sampling support
per the reference's *intended* behavior (modification_report.md:60-64).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Tuple

import numpy as np

STATE_COLS = ["glucose_mmol_L", "insulin_pmol_L", "glucagon_pmol_L", "glp1_pmol_L"]


def _loss_weights_from_stats(data_std: np.ndarray, data_mean: np.ndarray) -> np.ndarray:
    """Inverse-variance per-state weights; uninformative (constant) states get 0."""
    std = np.asarray(data_std, np.float64)
    mean = np.asarray(data_mean, np.float64)
    informative = std > (1e-4 * np.abs(mean) + 1e-6)
    w = np.where(informative, 1.0 / np.maximum(std, 1e-12) ** 2, 0.0)
    return w.astype(np.float32)


@dataclasses.dataclass
class GlucoseDataset:
    """Stacked window arrays (numpy, moved to device per batch).

    Attributes (N = number of windows, T = sequence_length):
        initial_state: (N, 6)
        observations:  (N, T, 6)
        time_points:   (N, T)   hours
        meal:          (N, T)
        tvns:          (N, T)
        mask:          (N, T)   1.0 where observed
        mask_channels: (N, T, 6) optional per-CHANNEL observation mask
                       (round 3: clinical charting observes different
                       channels at different times — glucose every check,
                       glucagon/GLP-1 only at lab draws; None = use `mask`)
        state_mean/state_std: (6,) normalisation stats
        subject_ids:   (N,)
    """

    initial_state: np.ndarray
    observations: np.ndarray
    time_points: np.ndarray
    meal: np.ndarray
    tvns: np.ndarray
    mask: np.ndarray
    state_mean: np.ndarray
    state_std: np.ndarray
    subject_ids: np.ndarray
    #: per-state inverse-variance loss weights. With normalize=True these are
    #: ~1; with normalize=False they reproduce z-scored MSE while the
    #: DYNAMICS stay in physical units — "normalize the loss, not the state",
    #: keeping the mechanistic core physically meaningful (the reference
    #: z-scores states, making its mechanistic equations dimensionally
    #: nonsensical during training).
    loss_weights: np.ndarray = None
    mask_channels: np.ndarray = None

    def __post_init__(self):
        if self.loss_weights is None:
            self.loss_weights = _loss_weights_from_stats(self.state_std, self.state_mean)

    def __len__(self) -> int:
        return self.initial_state.shape[0]

    def select(self, idx: np.ndarray) -> "GlucoseDataset":
        return GlucoseDataset(
            initial_state=self.initial_state[idx],
            observations=self.observations[idx],
            time_points=self.time_points[idx],
            meal=self.meal[idx],
            tvns=self.tvns[idx],
            mask=self.mask[idx],
            state_mean=self.state_mean,
            state_std=self.state_std,
            subject_ids=self.subject_ids[idx],
            loss_weights=self.loss_weights,
            mask_channels=None if self.mask_channels is None
            else self.mask_channels[idx],
        )

    def batch(self, idx: np.ndarray) -> Dict:
        """Assemble a training batch dict (the `hybrid_loss` contract)."""
        return {
            "initial_state": self.initial_state[idx],
            "observations": self.observations[idx],
            "time_points": self.time_points[idx],
            "external_inputs": {"meal": self.meal[idx], "tVNS": self.tvns[idx]},
            "mask": self.mask[idx],
            "loss_weights": self.loss_weights,
            **({"mask_channels": self.mask_channels[idx]}
               if self.mask_channels is not None else {}),
        }

    def denormalize(self, states: np.ndarray) -> np.ndarray:
        return states * self.state_std + self.state_mean


def create_data_arrays(
    data_path: str,
    sequence_length: int = 61,
    stride: int = 30,
    normalize: bool = True,
    dtype=np.float32,
    use_native: bool = True,
    per_channel_mask: bool = False,
    norm_stats=None,
) -> GlucoseDataset:
    """Load CSV/Parquet and build the window arrays.

    CSV files are ingested through the native C++ engine
    (`native/fastwindow.cpp`, ~35x faster than pandas on large cohorts) when
    it is built and the file is subject-grouped (consecutive rows per
    subject — true for all cohort files this framework and the reference
    write); otherwise falls back to pandas.

    `norm_stats=(mean, std)` normalizes with EXTERNAL stats (e.g. the
    training cohort's) instead of this file's own — the deployment-time
    convention for fresh/counterfactual cohorts, so z-space predictions
    stay in the trained model's coordinates.
    """
    if norm_stats is not None and not normalize:
        raise ValueError("norm_stats requires normalize=True")
    if (use_native and not per_channel_mask and norm_stats is None
            and str(data_path).endswith(".csv")):
        try:
            return _create_data_arrays_native(
                data_path, sequence_length, stride, normalize, dtype
            )
        except (RuntimeError, KeyError, IOError):
            pass  # native lib absent or columns unexpected -> pandas path
    import pandas as pd

    if str(data_path).endswith(".csv"):
        df = pd.read_csv(data_path)
    elif str(data_path).endswith(".parquet"):
        df = pd.read_parquet(data_path)
    else:
        raise ValueError(f"unsupported file format: {data_path}")

    if "ge" not in df.columns:
        df["ge"] = 0.0
    if "ffa" not in df.columns:
        df["ffa"] = 1.0
    state_cols = STATE_COLS + ["ge", "ffa"]

    if "tvns" not in df.columns:
        df["tvns"] = 0.0
    has_meal = "meal_indicator" in df.columns

    if "time_minutes" in df.columns:
        df["time"] = df["time_minutes"] / 60.0
    elif "time_hours" in df.columns:
        df["time"] = df["time_hours"]
    else:
        df["time"] = np.arange(len(df)) * 5.0 / 60.0

    windows = []
    for sid, sub in df.groupby("subject_id"):
        states = sub[state_cols].to_numpy(dtype=np.float64)
        meal = (
            sub["meal_indicator"].to_numpy(dtype=np.float64)
            if has_meal
            else np.zeros(len(sub))
        )
        tvns = sub["tvns"].to_numpy(dtype=np.float64)
        time = sub["time"].to_numpy(dtype=np.float64)
        for start in range(0, len(sub) - sequence_length + 1, stride):
            end = start + sequence_length
            windows.append((sid, states[start:end], meal[start:end], tvns[start:end], time[start:end]))

    if not windows:
        raise ValueError(
            f"no windows: need >= {sequence_length} points per subject in {data_path}"
        )

    all_states = np.stack([w[1] for w in windows])  # (N, T, 6)
    mask_ch = np.isfinite(all_states)               # (N, T, 6)
    if per_channel_mask:
        # round 3: clinical charting observes channels independently — a
        # time point is usable when ANY channel is observed, and the loss
        # weights each (point, channel) by its own observation bit
        mask = mask_ch.any(axis=-1).astype(np.float64)
    else:
        mask = mask_ch.all(axis=-1).astype(np.float64)
    filled = np.nan_to_num(all_states, nan=0.0)

    C = filled.shape[-1]
    if per_channel_mask:
        flat = filled.reshape(-1, C)
        flat_m = mask_ch.reshape(-1, C)
        data_mean = np.array([
            flat[:, i][flat_m[:, i]].mean() if flat_m[:, i].any() else 0.0
            for i in range(C)
        ])
        data_std = np.array([
            flat[:, i][flat_m[:, i]].std() if flat_m[:, i].any() else 1.0
            for i in range(C)
        ]) + 1e-6
    else:
        flat = filled.reshape(-1, C)
        flat_mask = mask.reshape(-1) > 0
        data_mean = flat[flat_mask].mean(axis=0)
        data_std = flat[flat_mask].std(axis=0) + 1e-6
    if norm_stats is not None:
        mean = np.asarray(norm_stats[0], dtype=np.float64)
        std = np.asarray(norm_stats[1], dtype=np.float64)
    elif normalize:
        mean, std = data_mean, data_std
    else:
        mean = np.zeros(len(state_cols))
        std = np.ones(len(state_cols))

    norm_states = (filled - mean) / std
    # NaN entries were filled with zeros pre-normalisation; re-zero post-norm
    # so masked entries don't carry the -mean/std offset.
    if per_channel_mask:
        norm_states = norm_states * mask_ch
    else:
        norm_states = norm_states * mask[..., None]
    weights = _loss_weights_from_stats(data_std / std, data_mean)

    return GlucoseDataset(
        initial_state=norm_states[:, 0].astype(dtype),
        observations=norm_states.astype(dtype),
        time_points=np.stack([w[4] for w in windows]).astype(dtype),
        meal=np.stack([w[2] for w in windows]).astype(dtype),
        tvns=np.stack([w[3] for w in windows]).astype(dtype),
        mask=mask.astype(dtype),
        state_mean=mean.astype(dtype),
        state_std=std.astype(dtype),
        subject_ids=np.array([w[0] for w in windows]),
        loss_weights=weights,
        mask_channels=mask_ch.astype(dtype) if per_channel_mask else None,
    )


def _create_data_arrays_native(
    data_path: str, sequence_length: int, stride: int, normalize: bool, dtype
) -> GlucoseDataset:
    """Native (C++) one-pass CSV parse + window assembly."""
    from hybrid_ode_tpu.data.native_loader import build_windows, native_available

    if not native_available():
        raise RuntimeError("native loader not built")

    with open(data_path) as f:
        header = f.readline().strip().split(",")
    have = set(header)
    if "subject_id" not in have:
        raise KeyError("subject_id")

    cols = [c for c in STATE_COLS if c in have]
    if len(cols) != len(STATE_COLS):
        raise KeyError("missing state columns")
    opt = {
        "ge": "ge" in have,
        "ffa": "ffa" in have,
        "meal": "meal_indicator" in have,
        "tvns": "tvns" in have,
        "time_minutes": "time_minutes" in have,
        "time_hours": "time_hours" in have,
    }
    fetch = list(cols)
    for name, flag in (("ge", opt["ge"]), ("ffa", opt["ffa"]),
                       ("meal_indicator", opt["meal"]), ("tvns", opt["tvns"])):
        if flag:
            fetch.append(name)
    if opt["time_minutes"]:
        fetch.append("time_minutes")
    elif opt["time_hours"]:
        fetch.append("time_hours")

    wins, subs, _ = build_windows(
        data_path, fetch, seq_len=sequence_length, stride=stride
    )  # (N, T, n_fetch)
    N, T, _ = wins.shape
    idx = {c: i for i, c in enumerate(fetch)}

    states = np.empty((N, T, 6), np.float64)
    for i, c in enumerate(STATE_COLS):
        states[..., i] = wins[..., idx[c]]
    states[..., 4] = wins[..., idx["ge"]] if opt["ge"] else 0.0
    states[..., 5] = wins[..., idx["ffa"]] if opt["ffa"] else 1.0

    meal = wins[..., idx["meal_indicator"]].astype(np.float64) if opt["meal"] else np.zeros((N, T))
    tvns = wins[..., idx["tvns"]].astype(np.float64) if opt["tvns"] else np.zeros((N, T))
    if opt["time_minutes"]:
        time = wins[..., idx["time_minutes"]].astype(np.float64) / 60.0
    elif opt["time_hours"]:
        time = wins[..., idx["time_hours"]].astype(np.float64)
    else:
        time = np.broadcast_to(np.arange(T) * 5.0 / 60.0, (N, T)).copy()

    mask = np.isfinite(states).all(axis=-1).astype(np.float64)
    filled = np.nan_to_num(states, nan=0.0)
    flat = filled.reshape(-1, 6)
    flat_mask = mask.reshape(-1) > 0
    data_mean = flat[flat_mask].mean(axis=0)
    data_std = flat[flat_mask].std(axis=0) + 1e-6
    if normalize:
        mean, std = data_mean, data_std
    else:
        mean = np.zeros(6)
        std = np.ones(6)
    norm_states = ((filled - mean) / std) * mask[..., None]
    weights = _loss_weights_from_stats(data_std / std, data_mean)

    return GlucoseDataset(
        initial_state=norm_states[:, 0].astype(dtype),
        observations=norm_states.astype(dtype),
        time_points=time.astype(dtype),
        meal=meal.astype(dtype),
        tvns=tvns.astype(dtype),
        mask=mask.astype(dtype),
        state_mean=mean.astype(dtype),
        state_std=std.astype(dtype),
        subject_ids=subs,
        loss_weights=weights,
    )


def split_dataset(
    ds: GlucoseDataset,
    train_frac: float = 0.7,
    val_frac: float = 0.15,
    seed: int = 42,
    level: str = "window",
) -> Tuple[GlucoseDataset, GlucoseDataset, GlucoseDataset]:
    """70/15/15 random split (parity: `train_hybrid.py:185-193`, seed 42).

    level='window' reproduces the reference's behavior: windows are split
    independently, so overlapping windows of ONE subject can land in both
    train and test (subject leakage — with stride < sequence_length the
    test score is optimistic). level='subject' splits subject ids instead,
    giving honest generalisation-to-new-patients estimates (this framework's
    fresh-cohort evaluations showed the gap is real; no reference analogue).
    """
    n = len(ds)
    rng = np.random.default_rng(seed)
    if level == "subject":
        subjects = np.unique(ds.subject_ids)
        perm_s = rng.permutation(len(subjects))
        n_tr = int(train_frac * len(subjects))
        n_va = int(val_frac * len(subjects))
        groups = (
            subjects[perm_s[:n_tr]],
            subjects[perm_s[n_tr: n_tr + n_va]],
            subjects[perm_s[n_tr + n_va:]],
        )
        return tuple(
            ds.select(np.where(np.isin(ds.subject_ids, g))[0]) for g in groups
        )
    if level != "window":
        raise ValueError(f"unknown split level {level!r} (window|subject)")
    perm = rng.permutation(n)
    n_train = int(train_frac * n)
    n_val = int(val_frac * n)
    return (
        ds.select(perm[:n_train]),
        ds.select(perm[n_train : n_train + n_val]),
        ds.select(perm[n_train + n_val :]),
    )


def batch_iterator(
    ds: GlucoseDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = False,
) -> Iterator[Dict]:
    """Yield batch dicts; fixed shapes when drop_remainder (jit-cache friendly)."""
    n = len(ds)
    order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if drop_remainder and len(idx) < batch_size:
            break
        yield ds.batch(idx)


def pad_batch(batch: Dict, batch_size: int) -> Tuple[Dict, np.ndarray]:
    """Pad a ragged final batch up to batch_size (returns sample-validity mask).

    Keeps every batch the same shape so jit compiles exactly once; the weight
    mask removes padded samples from the loss.
    """
    b = batch["initial_state"].shape[0]
    if b == batch_size:
        return batch, np.ones(batch_size, np.float32)
    pad = batch_size - b

    def _pad(x):
        reps = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return reps

    padded = {
        "initial_state": _pad(batch["initial_state"]),
        "observations": _pad(batch["observations"]),
        "time_points": _pad(batch["time_points"]),
        "external_inputs": {k: _pad(v) for k, v in batch["external_inputs"].items()},
        "mask": _pad(batch["mask"]),
    }
    if "mask_channels" in batch:
        padded["mask_channels"] = _pad(batch["mask_channels"])
    if "loss_weights" in batch:
        padded["loss_weights"] = batch["loss_weights"]  # (6,), not batched
    valid = np.concatenate([np.ones(b, np.float32), np.zeros(pad, np.float32)])
    # fold sample validity into the observation mask
    padded["mask"] = padded["mask"] * valid[:, None]
    return padded, valid
