"""Tracing / profiling helpers (SURVEY.md §5: the reference has none; the
TPU build gets jax.profiler traces and a roofline checker).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

__all__ = ["trace", "roofline_report", "timeit_chained", "device_busy",
           "parse_trace_events"]


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


def device_busy(run: Callable[[], None], logdir: Optional[str] = None):
    """DEVICE-side timing of ``run()`` via a jax.profiler trace — the only
    honest way to time kernels through the tunneled backend (round-4
    discovery: wall-clock measurements conflate chip time with a large and
    *session-varying* tunnel overhead; a tree-GEMM iteration that wall-times
    2.25 ms is 0.39 ms of actual device time, and most of the documented
    ~5x "session throttling" lives in the tunnel, not the chip).

    Runs ``run()`` (which must itself block on its result, e.g. via an
    ``np.asarray`` slice fetch) under ``jax.profiler.trace`` and parses the
    emitted trace-viewer JSON.  Returns a dict:

    * ``busy_s``   — sum of XLA-op durations on the device ("XLA Ops" rows)
    * ``span_s``   — first-op-start to last-op-end on that thread (includes
      device-side gaps, excludes host/tunnel time)
    * ``module_s`` — duration of the LONGEST "XLA Modules" event: the
      device time of one full jit-program execution (the robust
      per-dispatch number — op rows can be unrolled/nested and fool a
      dominant-op heuristic)
    * ``ops``      — {op_name: total_seconds} breakdown (fusions, custom
      calls / Pallas kernels, loops nest under ``while``/``closed_call``
      rows — subtract children when summing)

    Returns None when no device rows appear (CPU backend) or the trace
    cannot be parsed.  Keep one trace per call: the newest session dir is
    read.
    """
    import glob
    import gzip
    import json
    import os
    import tempfile

    owned = logdir is None
    if owned:
        logdir = tempfile.mkdtemp(prefix="qublas_prof_")
    with trace(logdir):
        run()
    try:
        sessions = sorted(glob.glob(os.path.join(
            logdir, "plugins", "profile", "*")))
        if not sessions:
            return None
        files = glob.glob(os.path.join(sessions[-1], "*.trace.json.gz"))
        if not files:
            return None
        data = json.load(gzip.open(files[0]))
        return parse_trace_events(data.get("traceEvents", []))
    except (OSError, ValueError, KeyError):
        return None
    finally:
        if owned:
            import shutil

            shutil.rmtree(logdir, ignore_errors=True)


def parse_trace_events(ev):
    """Pure parser behind :func:`device_busy`: trace-viewer events ->
    {busy_s, span_s, module_s, ops} for the TPU device rows, or None when
    there are none (CPU backend).  Split out so the extraction logic is
    unit-testable without a chip (tests/test_profiling.py)."""
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    op_tids = {(e["pid"], e.get("tid")) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e.get("args", {}).get("name") == "XLA Ops"}
    mod_tids = {(e["pid"], e.get("tid")) for e in ev
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in dev_pids
                and e.get("args", {}).get("name") == "XLA Modules"}
    rows = [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in op_tids]
    mod_rows = [e for e in ev if e.get("ph") == "X"
                and (e.get("pid"), e.get("tid")) in mod_tids]
    if not rows:
        return None
    ops: dict = {}
    for e in rows:
        ops[e["name"]] = ops.get(e["name"], 0.0) + e.get("dur", 0.0) / 1e6
    ts0 = min(e["ts"] for e in rows)
    ts1 = max(e["ts"] + e.get("dur", 0.0) for e in rows)
    return {
        "busy_s": sum(e.get("dur", 0.0) for e in rows) / 1e6,
        "span_s": (ts1 - ts0) / 1e6,
        "module_s": (max((e.get("dur", 0.0) for e in mod_rows),
                         default=0.0) / 1e6) or None,
        "ops": ops,
    }


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
