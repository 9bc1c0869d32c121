"""Tracing/profiling: jax.profiler traces + per-stage host counters.

Reference parity: SURVEY.md sec 5.1 — the reference has no profiler, only
live UI counters; here both: `trace()` captures a device profile viewable in
TensorBoard/Perfetto, and StageTimer gives per-stage wall-time/throughput
counters that the dashboard and bench can report.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time + item counts per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        self.items: Dict[str, float] = collections.defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, total in self.totals.items():
            entry = {"seconds": total, "calls": self.counts[name]}
            if self.items[name]:
                entry["items_per_s"] = self.items[name] / max(total, 1e-12)
            out[name] = entry
        return out

    def report(self) -> str:
        lines = []
        for name, e in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["seconds"]):
            rate = f" {e['items_per_s']:.3g}/s" if "items_per_s" in e else ""
            lines.append(f"{name:<24} {e['seconds']:8.3f}s x{e['calls']}{rate}")
        return "\n".join(lines)
