"""Device-trace timing (round 4): the trace-viewer parser behind
``utils.profiling.device_busy`` — the honest timing path on the tunneled
backend (wall clock conflates device time with session-varying tunnel
overhead; CLAUDE.md).  The parser is pure, so it is pinned here against
synthetic traces shaped like the real axon emissions (device pid with
"XLA Ops"/"XLA Modules" threads, host pid with python rows).
"""

from qublas_tpu.utils.profiling import parse_trace_events


def _meta(pid, name, tid=None, kind="process_name"):
    e = {"ph": "M", "pid": pid, "name": kind, "args": {"name": name}}
    if tid is not None:
        e["tid"] = tid
    return e


def _ev(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def _device_trace():
    return [
        _meta(3, "/device:TPU:0"),
        _meta(3, "XLA Modules", tid=2, kind="thread_name"),
        _meta(3, "XLA Ops", tid=3, kind="thread_name"),
        _meta(701, "/host:CPU"),
        _meta(701, "python", tid=9, kind="thread_name"),
        # module row: one full jit-program execution (+ a tiny slice prog)
        _ev(3, 2, "jit_stream", 1000.0, 6000.0),
        _ev(3, 2, "jit_slice", 7100.0, 5.0),
        # op rows: a while covering nested per-iteration calls
        _ev(3, 3, "while.9", 1000.0, 5990.0),
        _ev(3, 3, "closed_call.8", 1010.0, 360.0),
        _ev(3, 3, "closed_call.8", 1400.0, 362.0),
        _ev(3, 3, "fusion.29", 1800.0, 5.0),
        _ev(3, 3, "copy-done", 6995.0, 4.0),
        # host rows must be ignored entirely
        _ev(701, 9, "np.asarray(jax.Array)", 0.0, 43000.0),
    ]


def test_parse_device_rows():
    p = parse_trace_events(_device_trace())
    assert p is not None
    # busy = sum of all XLA Ops rows (us -> s)
    assert abs(p["busy_s"] - (5990 + 360 + 362 + 5 + 4) / 1e6) < 1e-12
    # span = first op start .. last op end
    assert abs(p["span_s"] - (6999.0 - 1000.0) / 1e6) < 1e-12
    # module_s = LONGEST module event (the main program, not the slice)
    assert abs(p["module_s"] - 6000.0 / 1e6) < 1e-12
    # ops aggregate by name; the host asarray row is excluded
    assert abs(p["ops"]["closed_call.8"] - 722.0 / 1e6) < 1e-12
    assert "np.asarray(jax.Array)" not in p["ops"]


def test_parse_no_device_rows_returns_none():
    # CPU-only trace: no TPU process -> None (callers fall back to wall)
    ev = [
        _meta(701, "/host:CPU"),
        _meta(701, "python", tid=9, kind="thread_name"),
        _ev(701, 9, "PjitFunction(f)", 0.0, 100.0),
    ]
    assert parse_trace_events(ev) is None
    assert parse_trace_events([]) is None


def test_parse_module_missing_is_none_field():
    # op rows without a module thread: module_s None, ops still reported
    ev = [
        _meta(3, "/device:TPU:0"),
        _meta(3, "XLA Ops", tid=3, kind="thread_name"),
        _ev(3, 3, "fusion.1", 10.0, 50.0),
    ]
    p = parse_trace_events(ev)
    assert p is not None and p["module_s"] is None
    assert abs(p["busy_s"] - 50.0 / 1e6) < 1e-12


def test_bench_device_op_time_prefers_module():
    """bench._device_op_time must take the module row (an unrolled loop has
    no `while` and its biggest fusion is one iteration — the 520 Telem/s
    reduce artifact)."""
    import importlib.util
    import sys

    if "bench" in sys.modules:
        bench = sys.modules["bench"]
    else:
        spec = importlib.util.spec_from_file_location(
            "bench", __file__.rsplit("/tests/", 1)[0] + "/bench.py")
        bench = importlib.util.module_from_spec(spec)
        sys.modules["bench"] = bench
        spec.loader.exec_module(bench)

    import qublas_tpu.utils.profiling as prof

    calls = {}

    def fake_device_busy(run):
        run()
        calls["ran"] = True
        return parse_trace_events(_device_trace())

    orig = prof.device_busy
    prof.device_busy = fake_device_busy
    try:
        t = bench._device_op_time(lambda a, b: __import__("numpy")
                                  .zeros((16, 256)), None, None)
    finally:
        prof.device_busy = orig
    assert calls.get("ran")
    assert abs(t - 6000.0 / 1e6) < 1e-12  # the module row, not while.9
