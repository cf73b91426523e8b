"""Per-stage timing + device tracing helpers.

The reference instruments with ad-hoc ``time.time()`` prints around its hot
calls (micloc/xylo_snn_localization.py:516-523,
paper_plots/snn_localization_benchmark.py:497-504).  These helpers give the
same per-stage wall numbers as structured data, plus an optional
``jax.profiler`` trace context for TensorBoard-level device profiles.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


class StageTimer:
    """Accumulates wall time per named stage; blocks on device results so the
    numbers reflect device execution, not async dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn: Callable) -> Callable:
        def wrapper(*args, **kwargs):
            with self.stage(name):
                out = fn(*args, **kwargs)
                jax.block_until_ready(out)
            return out

        return wrapper

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "calls": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / self.counts[k],
            }
            for k in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """``jax.profiler`` trace context (viewable in TensorBoard/Perfetto);
    no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable, *args, warmup: int = 1, iters: int = 10) -> Dict[str, float]:
    """Wall-time a jitted callable (audio-style throughput helper)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "mean_ms": dt * 1e3, "iters": iters}
