"""Profiling and tracing hooks.

The reference has no profiling beyond wall-clock log lines (SURVEY.md §5.1).
Here the trainer can capture a real device trace: ``trace_steps`` wraps a
window of training in ``jax.profiler`` so the XLA execution timeline
(per-fusion timings, HBM traffic) is inspectable with TensorBoard or
Perfetto, and ``annotate`` adds named trace spans around host-side phases.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

__all__ = ["trace", "annotate", "step_timer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for everything inside the context."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class step_timer:
    """Tiny wall-clock accumulator for phase timing without a full trace."""

    def __init__(self):
        self.totals = {}
        self._start = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def summary(self):
        total = sum(self.totals.values()) or 1.0
        return {k: (v, v / total) for k, v in sorted(self.totals.items(),
                                                     key=lambda kv: -kv[1])}
