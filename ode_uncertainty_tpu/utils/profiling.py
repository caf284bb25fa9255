"""Profiling and timing harness.

The reference's only instrumentation is wall-clock around NLL evals
(SURVEY.md §5). Here: named phase timers with device synchronization, a
jax.profiler trace context for TensorBoard/XProf dumps, and a benchmark
helper that separates compile from steady-state time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (device-synchronized)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name:30s} {self.totals[name]:10.3f}s / {self.counts[name]:5d} calls "
            f"({self.totals[name] / self.counts[name] * 1e3:9.2f} ms each)"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, reps: int = 10, warmup: int = 1):
    """Returns (compile_s, steady_state_s_per_call) for a jitted callable."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps
