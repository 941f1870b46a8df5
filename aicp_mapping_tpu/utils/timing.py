"""Per-stage wall-clock timing (TimingUtils analog, src/utils/timing.cpp).

The reference uses a static tic/toc stack of CPU clocks printed to stdout
(timing.cpp:5-18). Here: a tic/toc stack over wall clock with named records
accumulated for inspection, plus optional jax.profiler trace hooks
(SURVEY.md §5.1 upgrade path).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class TimingUtils:
    def __init__(self, verbose: bool = False):
        self._stack: list[float] = []
        self._verbose = verbose
        self.records: dict[str, list[float]] = defaultdict(list)

    def tic(self) -> None:
        self._stack.append(time.perf_counter())

    def toc(self, name: str) -> float:
        dt = time.perf_counter() - self._stack.pop()
        self.records[name].append(dt)
        if self._verbose:
            print(f"[Timing] {name}: {dt * 1e3:.2f} ms")
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.tic()
        try:
            yield
        finally:
            self.toc(name)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "mean_ms": 1e3 * sum(vals) / max(len(vals), 1),
                "total_s": sum(vals),
            }
        return out


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace around a code region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
