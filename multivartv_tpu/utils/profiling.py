"""Profiling and timing hooks.

The reference's only perf instrumentation is commented-out time.time()
probes (code/test_solvers.py:33-48).  Here: a jax.profiler trace context
(feeds TensorBoard/XProf) and a steady-state iterations/s measurement used
by bench.py and perf tests.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_iterations_per_s(run_fixed: Callable[[object, int], object],
                             state0, warmup: int = 20,
                             iters: int = 200) -> float:
    """Time a compiled fixed-iteration solver: run_fixed(state, k) must
    return a state whose .theta is blockable."""
    state = run_fixed(state0, warmup)
    jax.block_until_ready(state.theta)
    t0 = time.perf_counter()
    state = run_fixed(state, iters)
    jax.block_until_ready(state.theta)
    return iters / (time.perf_counter() - t0)


class StepTimer:
    """Host-side accumulating timer for labeled phases."""

    def __init__(self):
        self.totals = {}
        self._start = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"{k:24s} {v:8.3f}s ({100*v/total:5.1f}%)"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
