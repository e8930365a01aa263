"""Profiling/tracing hooks.

The reference's observability is wall-clock timers (SURVEY.md §5); here the
same phase timers exist plus first-class `jax.profiler` integration: wrap any
phase in :func:`trace` to capture a TensorBoard-loadable device trace.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulating named phase timers (per-epoch / per-segment breakdowns)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name}: {self.totals[name]:.2f}s over {self.counts[name]} calls"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a jax.profiler device trace when a logdir is given, else no-op."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("jax profiler trace written to %s", logdir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
