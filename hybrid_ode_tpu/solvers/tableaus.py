"""Butcher tableaus for the explicit Runge–Kutta solver family.

The reference delegates integration to SciPy's compiled solvers through a
per-micro-step Python callback (`models/hybrid_ode_nn.py:240`); this framework
owns its tableaus so the whole solve is one XLA program. Solver-name parity
with the reference's torchdiffeq->scipy map (`models/hybrid_ode_nn.py:174-181`):

    'dopri5'  -> Dormand–Prince 5(4)   (scipy maps it to DOP853; we keep the
                 honest 5th-order method and also provide real dop853)
    'rk45'    -> same Dormand–Prince 5(4) pair (scipy's RK45 IS dopri5)
    'dop853'  -> Hairer's 8(5,3) method
    'bosh3'   -> Bogacki–Shampine 3(2) (cheap low-accuracy option)
    'radau'   -> implicit Radau IIA order 5 (see solvers/implicit.py)
    'bdf'     -> fixed-order BDF2 with variable steps (see solvers/implicit.py)
    'rk4'     -> fixed-grid classic RK4 (see solvers/fixed.py)

All coefficients are standard published constants (Dormand & Prince 1980;
Bogacki & Shampine 1989; Hairer, Norsett & Wanner 1993).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from hybrid_ode_tpu.solvers import _dop853_coeffs as _d853


class ERKTableau(NamedTuple):
    """Explicit RK tableau with embedded error estimate.

    err_weights: E such that local error = h * (K^T E) with K the stage
    derivatives — for FSAL-extended tableaus E has length n_stages+1 and the
    extra row of K is f(t+h, y1).
    """

    name: str
    a: np.ndarray           # (s, s) strictly lower triangular
    b: np.ndarray           # (s,)
    c: np.ndarray           # (s,)
    err_weights: np.ndarray # (s,) or (s+1,) (E5 role)
    err_weights_low: Optional[np.ndarray]  # DOP853's E3 companion, else None
    order: int              # order of the propagated solution
    error_order: int        # order of the error estimator (controls exponent)
    fsal: bool              # last err stage is f(t+h, y1), reusable as next f0


def _dopri5() -> ERKTableau:
    c = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
    a = np.zeros((7, 7))
    a[1, 0] = 1 / 5
    a[2, :2] = [3 / 40, 9 / 40]
    a[3, :3] = [44 / 45, -56 / 15, 32 / 9]
    a[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
    a[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
    a[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
    b = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
    b_hat = np.array(
        [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
    )
    return ERKTableau(
        name="dopri5",
        a=a,
        b=b,
        c=c,
        err_weights=b - b_hat,
        err_weights_low=None,
        order=5,
        error_order=4,
        fsal=True,  # stage 7 (row a[6]) equals b, so k[6] = f(t+h, y1)
    )


def _bosh3() -> ERKTableau:
    c = np.array([0.0, 1 / 2, 3 / 4, 1.0])
    a = np.zeros((4, 4))
    a[1, 0] = 1 / 2
    a[2, :2] = [0.0, 3 / 4]
    a[3, :3] = [2 / 9, 1 / 3, 4 / 9]
    b = np.array([2 / 9, 1 / 3, 4 / 9, 0.0])
    b_hat = np.array([7 / 24, 1 / 4, 1 / 3, 1 / 8])
    return ERKTableau(
        name="bosh3",
        a=a,
        b=b,
        c=c,
        err_weights=b - b_hat,
        err_weights_low=None,
        order=3,
        error_order=2,
        fsal=True,
    )


def _dop853() -> ERKTableau:
    # 12 integration stages; error estimate uses an extra f(t+h, y1) stage
    # combined from 5th- and 3rd-order embedded estimators (Hairer's trick:
    # err = err5 * |err5| / sqrt(|err5|^2 + 0.01 |err3|^2)).
    return ERKTableau(
        name="dop853",
        a=_d853.A.copy(),
        b=_d853.B.copy(),
        c=_d853.C.copy(),
        err_weights=_d853.E5.copy(),      # length 13
        err_weights_low=_d853.E3.copy(),  # length 13
        order=8,
        error_order=7,
        fsal=True,  # the 13th K row is f(t+h, y1)
    )


TABLEAUS = {
    "dopri5": _dopri5(),
    "rk45": _dopri5(),
    "bosh3": _bosh3(),
    "dop853": _dop853(),
}
