"""Tracing / per-phase timing (SURVEY.md §5.1 — the reference has only tqdm
progress bars; this provides jax.profiler traces + structured timers)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work so the
    numbers are real."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:>24s}: {t:8.3f}s total  {t/n*1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
