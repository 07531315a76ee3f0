"""Profiling & numerical-debugging hooks (SURVEY.md §5 gap-fill).

The reference has no profiling beyond tqdm progress bars and no NaN tooling
outside tests. TPU equivalents:

  * `trace(log_dir)`: context manager around `jax.profiler` — produces a
    TensorBoard-loadable trace of device execution.
  * `Throughput`: simple steps/sec + ODE-steps/sec counters for training and
    simulation loops (the BASELINE.json north-star counters).
  * `debug_mode()`: enables `jax_debug_nans` + disables jit donation-related
    obfuscation for numerical debugging runs (config `logging.debug_nans`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(enable_x64: bool = False) -> Iterator[None]:
    """NaN-hunting context: any NaN produced under jit raises immediately."""
    import jax

    jax.config.update("jax_debug_nans", True)
    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        if enable_x64:
            jax.config.update("jax_enable_x64", False)


class Throughput:
    """Rolling throughput counter: items/sec over a window of ticks."""

    def __init__(self, name: str = "steps"):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self._t0 = time.time()
        self._count = 0

    def tick(self, n: int = 1) -> None:
        self._count += n

    @property
    def per_sec(self) -> float:
        dt = time.time() - self._t0
        return self._count / dt if dt > 0 else 0.0

    def report(self) -> str:
        return f"{self.name}: {self.per_sec:,.0f}/s ({self._count} in {time.time()-self._t0:.1f}s)"
