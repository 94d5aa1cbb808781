"""Tracing / profiling helpers (SURVEY.md §5: the reference has none; the
TPU build gets jax.profiler traces and a roofline checker).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

__all__ = ["trace", "roofline_report", "timeit_chained"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_chained(fn: Callable, a, b, iters: int = 64) -> float:
    """Wall time per call with a data dependency chaining iterations and an
    array-slice fetch as the only trustworthy sync (see bench.py for why:
    tunneled backends may return from block_until_ready early and hang on
    scalar fetches)."""
    import numpy as np

    out = fn(a, b)
    np.asarray(out[:1, :128] if out.ndim >= 2 else out[:1])
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = fn(x, b)
    np.asarray(x[:1, :128] if x.ndim >= 2 else x[:1])
    return (time.perf_counter() - t0) / iters


def roofline_report(fn: Callable, a, b, flops: float,
                    baseline_fn: Optional[Callable] = None,
                    iters: int = 64, ab_rounds: int = 2) -> dict:
    """Measured throughput of ``fn`` and fraction of a measured baseline
    ceiling (e.g. the raw integer matmul for a quantized GEMM).

    The two sides are measured in INTERLEAVED A/B rounds with best-of per
    side: the tunneled chip's available throughput drifts between
    congestion windows, and back-to-back loops would land that drift
    directly in ``fraction_of_roofline`` (the round-1 bench failure mode —
    see bench.py's main measurement)."""
    t = timeit_chained(fn, a, b, iters)
    tb = None
    if baseline_fn is not None:
        tb = timeit_chained(baseline_fn, a, b, iters)
        for _ in range(max(ab_rounds - 1, 0)):
            t = min(t, timeit_chained(fn, a, b, iters))
            tb = min(tb, timeit_chained(baseline_fn, a, b, iters))
    rep = {"seconds_per_call": t, "gops": flops / t / 1e9}
    if tb is not None:
        rep["baseline_gops"] = flops / tb / 1e9
        rep["fraction_of_roofline"] = tb / t
    return rep
