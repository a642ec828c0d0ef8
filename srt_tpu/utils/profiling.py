"""Performance instrumentation: rays/s meters and profiler hooks.

The reference prints a frame time every 60 frames (src/main.cpp:616-620);
here perf is first-class: a RaysPerSecondMeter that accounts actual traced
rays (from the integrator's per-bounce stats), wall-clock timers with
device synchronization, and ``jax.profiler`` trace capture for per-kernel
inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


class Timer:
    """Wall-clock timer that blocks on device completion."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def timed(fn, *args, sync=True, repeats=1):
    """Run fn repeatedly, blocking on the result; returns (result,
    seconds/call) for the steady state (excludes the first, compiling,
    call)."""
    result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(repeats):
        result = fn(*args)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) / max(1, repeats)


class RaysPerSecondMeter:
    """Accumulates traced-ray counts (closest-hit + shadow rays from the
    integrator's stats output) against wall time."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    def add(self, stats, seconds: float, spp: int = 1):
        """stats: [B, 2] per-bounce (trace, shadow) counts for ONE sample."""
        s = np.asarray(stats)
        self.rays += int(s.sum()) * spp
        self.seconds += seconds

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
