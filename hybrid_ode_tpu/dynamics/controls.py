"""Time-varying external inputs as precomputed piecewise-linear interpolants.

The reference interpolates external inputs with a numpy `searchsorted` inside
the SciPy RHS closure, crossing the host/device boundary on every solver
micro-step (`models/hybrid_ode_nn.py:210-231`). Here controls are static
arrays carried into the jitted solve; evaluation is a single fused
`jnp.interp` per signal — no host round-trips, vmappable over batch.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp


class Controls(NamedTuple):
    """Piecewise-linear control signals on a shared time grid.

    Attributes:
        ts: time knots, shape (T,).
        signals: dict name -> values, each shape (T,) (time-varying) or ()
            (constant). Names used by the hybrid model: 'meal', 'tVNS', 'GD'.
    """

    ts: jnp.ndarray
    signals: Dict[str, jnp.ndarray]


def make_controls(
    ts: jnp.ndarray, signals: Optional[Dict[str, jnp.ndarray]] = None
) -> Controls:
    return Controls(ts=jnp.asarray(ts), signals={k: jnp.asarray(v) for k, v in (signals or {}).items()})


def eval_controls(controls: Optional[Controls], t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Evaluate all control signals at scalar time t.

    Linear interpolation with endpoint clamping — matching the reference's
    semantics at `models/hybrid_ode_nn.py:220-229` (clamp before first /
    after last knot).
    """
    if controls is None:
        return {}
    out = {}
    for name, values in controls.signals.items():
        if values.ndim == 0:
            out[name] = values
        else:
            out[name] = jnp.interp(t, controls.ts, values)
    return out
