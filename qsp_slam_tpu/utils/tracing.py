"""Structured per-stage tracing + memory telemetry.

Replaces the reference's ad-hoc chrono prints scattered through
`qsp_slam_rgbd.cc:180-308` / `src/Tracking.cc:1236-1307` (SURVEY.md §5) with
one tracer: named spans accumulate wall-clock stats, `report()` emits a
machine-readable summary, and `jax.profiler` traces can be captured around
any span for XLA-level inspection.
"""

from __future__ import annotations

import json
import resource
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Tracer:
    enabled: bool = True
    spans: dict = field(default_factory=lambda: defaultdict(list))

    @contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append((time.perf_counter() - t0) * 1e3)

    def max_rss_mb(self) -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    def report(self) -> dict:
        import numpy as np

        out = {"max_rss_mb": round(self.max_rss_mb(), 1)}
        for name, times in sorted(self.spans.items()):
            out[name] = {
                "count": len(times),
                "median_ms": round(float(np.median(times)), 2),
                "mean_ms": round(float(np.mean(times)), 2),
                "total_ms": round(float(np.sum(times)), 1),
            }
        return out

    def dump(self, path: str | None = None) -> str:
        s = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
