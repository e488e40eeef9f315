"""Lightweight observability: stage timers + optional JAX profiler traces.

The reference's only instrumentation is wall-clock prints (SURVEY §5);
this keeps that convention (same "Total seconds elapsed" line the
reference tooling greps) and adds structured timings plus opt-in XLA
profiler capture via SPINRELAX_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class StageTimer:
    """Collects named stage durations; prints a reference-style summary."""

    def __init__(self):
        self.durations: Dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.durations[name] = self.durations.get(name, 0.0) + time.time() - t

    def report(self):
        for name, dur in self.durations.items():
            print(f"= = stage {name}: {dur:g} s")
        print("= = Finished. Total seconds elapsed: %g" % (time.time() - self._t0))


@contextlib.contextmanager
def trace(label: str = "spinrelax", trace_dir: Optional[str] = None):
    """Capture an XLA profiler trace when SPINRELAX_TRACE_DIR (or the
    explicit argument) is set; otherwise a no-op."""
    trace_dir = trace_dir or os.environ.get("SPINRELAX_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
