"""Evaluation metrics: accuracy + uncertainty calibration.

Parity with the reference metric suite (`eval/evaluate.py:25-181`) plus the
UQ metrics the manuscript reports but the reference never implemented
(coverage@q, NLL, CRPS — manuscript.tex:707-720). All metrics accept an
optional observation mask for irregular sampling.

Implementation notes vs the reference:
  * the reference's ECE draws 10k Monte-Carlo z-scores to find thresholds
    (`evaluate.py:137`) — we use the exact Gaussian quantile.
  * everything is numpy on flattened arrays; these run once per evaluation,
    not in the hot path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Union

import numpy as np
from scipy.special import erf, erfinv

STATE_NAMES = ("Glucose", "Insulin", "Glucagon", "GLP1", "GE", "FFA")


def _mask_flat(x: np.ndarray, mask: Optional[np.ndarray]) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if mask is None:
        return x.reshape(-1)
    m = np.asarray(mask, bool)
    if m.ndim < x.ndim:              # (B,T) time-point mask
        m = m[..., None]
    m = np.broadcast_to(m, x.shape)  # (B,T,C) per-channel mask passes through
    return x[m]


def compute_rmse(
    predictions: np.ndarray,
    targets: np.ndarray,
    per_state: bool = False,
    mask: Optional[np.ndarray] = None,
) -> Union[float, np.ndarray]:
    """RMSE overall or per state (parity: `evaluate.py:25-58`)."""
    p = np.asarray(predictions, np.float64)
    t = np.asarray(targets, np.float64)
    if per_state:
        out = np.zeros(p.shape[-1])
        for i in range(p.shape[-1]):
            mi = mask if (mask is None or np.asarray(mask).ndim < p.ndim) \
                else np.asarray(mask)[..., i : i + 1]
            pi = _mask_flat(p[..., i : i + 1], mi)
            ti = _mask_flat(t[..., i : i + 1], mi)
            out[i] = math.sqrt(np.mean((pi - ti) ** 2)) if pi.size else np.nan
        return out
    pf, tf = _mask_flat(p, mask), _mask_flat(t, mask)
    return float(math.sqrt(np.mean((pf - tf) ** 2)))


def compute_mae(
    predictions: np.ndarray,
    targets: np.ndarray,
    per_state: bool = False,
    mask: Optional[np.ndarray] = None,
) -> Union[float, np.ndarray]:
    p = np.asarray(predictions, np.float64)
    t = np.asarray(targets, np.float64)
    if per_state:
        out = np.zeros(p.shape[-1])
        for i in range(p.shape[-1]):
            mi = mask if (mask is None or np.asarray(mask).ndim < p.ndim) \
                else np.asarray(mask)[..., i : i + 1]
            pi = _mask_flat(p[..., i : i + 1], mi)
            ti = _mask_flat(t[..., i : i + 1], mi)
            out[i] = np.mean(np.abs(pi - ti)) if pi.size else np.nan
        return out
    pf, tf = _mask_flat(p, mask), _mask_flat(t, mask)
    return float(np.mean(np.abs(pf - tf)))


def compute_r2(predictions: np.ndarray, targets: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    pf, tf = _mask_flat(predictions, mask), _mask_flat(targets, mask)
    ss_res = np.sum((tf - pf) ** 2)
    ss_tot = np.sum((tf - tf.mean()) ** 2)
    return float(1.0 - ss_res / max(ss_tot, 1e-12))


def compute_calibration_error(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    n_bins: int = 10,
    mask: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """ECE + MSIS + sharpness + 95% coverage (parity: `evaluate.py:97-181`)."""
    pf = _mask_flat(predictions, mask)
    uf = _mask_flat(uncertainties, mask)
    tf = _mask_flat(targets, mask)

    errors = np.abs(pf - tf)
    normalized = errors / (uf + 1e-6)

    confs = np.linspace(0.0, 1.0, n_bins + 1)[:-1]
    expected, observed = [], []
    for conf in confs:
        # exact |z| quantile: P(|Z| <= z) = conf  =>  z = sqrt(2)*erfinv(conf)
        threshold = math.sqrt(2.0) * erfinv(conf)
        observed.append(float(np.mean(normalized <= threshold)))
        expected.append(conf)
    ece = float(np.mean(np.abs(np.array(expected) - np.array(observed))))

    alpha = 0.05
    z = 1.96
    lower, upper = pf - z * uf, pf + z * uf
    width = upper - lower
    penalty = (2.0 / alpha) * (
        (tf < lower) * (lower - tf) + (tf > upper) * (tf - upper)
    )
    msis = float(np.mean(width + penalty))
    return {
        "ece": ece,
        "msis": msis,
        "sharpness": float(np.mean(uf)),
        "coverage_95": float(np.mean((tf >= lower) & (tf <= upper))),
        "mean_normalized_error": float(np.mean(normalized)),
    }


def compute_coverage(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    level: float = 0.9,
    mask: Optional[np.ndarray] = None,
) -> float:
    """Central-interval coverage at `level` (manuscript Cov@80/Cov@90)."""
    pf = _mask_flat(predictions, mask)
    uf = _mask_flat(uncertainties, mask)
    tf = _mask_flat(targets, mask)
    z = math.sqrt(2.0) * erfinv(level)
    return float(np.mean(np.abs(tf - pf) <= z * uf))


def compute_nll(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    mask: Optional[np.ndarray] = None,
) -> float:
    """Mean Gaussian negative log-likelihood."""
    pf = _mask_flat(predictions, mask)
    uf = np.maximum(_mask_flat(uncertainties, mask), 1e-6)
    tf = _mask_flat(targets, mask)
    return float(np.mean(0.5 * np.log(2 * np.pi * uf**2) + 0.5 * ((tf - pf) / uf) ** 2))


def compute_crps(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    mask: Optional[np.ndarray] = None,
) -> float:
    """Closed-form CRPS for Gaussian predictive distributions."""
    pf = _mask_flat(predictions, mask)
    uf = np.maximum(_mask_flat(uncertainties, mask), 1e-6)
    tf = _mask_flat(targets, mask)
    z = (tf - pf) / uf
    phi = np.exp(-0.5 * z**2) / math.sqrt(2 * math.pi)
    Phi = 0.5 * (1 + erf(z / math.sqrt(2)))
    return float(np.mean(uf * (z * (2 * Phi - 1) + 2 * phi - 1 / math.sqrt(math.pi))))


def fit_uncertainty_scale(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    mask: Optional[np.ndarray] = None,
    scales: Optional[np.ndarray] = None,
) -> float:
    """Fit a scalar recalibration factor s* minimizing ECE of s*unc.

    Standard post-hoc variance (temperature) recalibration — fit on a
    VALIDATION split, apply on test (round 3; used by
    benchmarks/uq_calibration.py to close the ECE gap to the reference's
    claimed 0.08, manuscript.tex:765). A single global scale preserves the
    posterior's relative uncertainty structure; it only fixes the overall
    dispersion, which is what a guessed observation noise gets wrong.
    """
    if scales is None:
        scales = np.logspace(-1.0, 1.0, 201)
    best_s, best_e = 1.0, np.inf
    for s in scales:
        e = compute_calibration_error(predictions, s * uncertainties, targets, mask=mask)["ece"]
        if e < best_e:
            best_s, best_e = float(s), float(e)
    return best_s


def fit_per_state_recalibration(
    predictions: np.ndarray,
    uncertainties: np.ndarray,
    targets: np.ndarray,
    mask: Optional[np.ndarray] = None,
    min_coverage_95: float = 0.95,
) -> np.ndarray:
    """Per-STATE variance recalibration with a coverage floor (round 3).

    A single ECE-minimizing scale on a heavy-tailed z-distribution shrinks
    the intervals and craters coverage (measured: ECE 0.16 -> 0.10 but
    Cov95 0.90 -> 0.71). Here each state channel gets its own scale,
    chosen to minimize that channel's ECE among scales that keep its 95%
    coverage >= `min_coverage_95` — fit on VALIDATION, apply on test.
    Returns a (C,) scale vector (multiply the uncertainty array).
    """
    p = np.asarray(predictions, np.float64)
    u = np.asarray(uncertainties, np.float64)
    t = np.asarray(targets, np.float64)
    C = p.shape[-1]
    # grid reaches down to 0.03x: with per-state learned noise the placeholder
    # channels' predictive sigma is already tiny and the optimal multiplier
    # can sit well below the old 0.2 floor (measured: clipping at 0.2 cost
    # 0.018 ECE overall)
    scales = np.logspace(-1.5, 1.0, 251)
    out = np.ones(C)
    for i in range(C):
        mi = mask
        if mask is not None and np.asarray(mask).ndim == p.ndim:
            mi = np.asarray(mask)[..., i : i + 1]
        pi, ui, ti = p[..., i : i + 1], u[..., i : i + 1], t[..., i : i + 1]
        if _mask_flat(pi, mi).size == 0:
            continue
        best_s, best_e = None, np.inf
        for s in scales:
            m = compute_calibration_error(pi, s * ui, ti, mask=mi)
            if m["coverage_95"] >= min_coverage_95 and m["ece"] < best_e:
                best_s, best_e = float(s), float(m["ece"])
        if best_s is None:  # floor unreachable: take the widest candidate
            best_s = float(scales[-1])
        out[i] = best_s
    return out
