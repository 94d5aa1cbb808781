"""Headline bench record schema (round-3 items 1 and 4).

The >=0.90-of-roofline bar is judged on ``vs_baseline``; that field must be
populated only by a real TPU measurement.  On CPU fallback it is null, the
CPU ratio moves to an explicitly informational field, and the most recent
successful TPU run rides along as ``last_tpu`` evidence.
"""

import importlib.util
import json
import sys


def _load_bench():
    # import bench.py as a module without running main(); module import does
    # no jax array work (backend resolution is lazy via _ensure_backend)
    if "bench" in sys.modules:
        return sys.modules["bench"]
    spec = importlib.util.spec_from_file_location(
        "bench", __file__.rsplit("/tests/", 1)[0] + "/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_tpu_record_shape():
    bench = _load_bench()
    rec = bench.finalize_headline(200000.0, 205000.0, 3, on_tpu=True)
    parsed = json.loads(json.dumps(rec))
    assert parsed["platform"] == "tpu"
    assert parsed["vs_baseline"] == round(200000.0 / 205000.0, 4)
    assert "cpu_ratio_informational" not in parsed
    assert "last_tpu" not in parsed
    assert parsed["metric"] == "int8_qgemul_gops"
    assert parsed["unit"] == "GOP/s"
    assert parsed["roofline_gops"] == 205000.0
    assert parsed["ab_pairs"] == 3


def test_fallback_record_shape_nulls_the_bar_field():
    bench = _load_bench()
    last = {"best": {"timestamp_utc": "2026-08-19T00:00:00Z",
                     "value": 231400.0, "roofline_gops": 234900.0,
                     "vs_baseline": 0.9851},
            "latest": {"vs_baseline": 0.9361}, "n_runs": 2}
    # a CPU ratio > 1.0 (the BENCH_r02 failure mode) must not be able to
    # land in vs_baseline
    rec = bench.finalize_headline(101.57, 100.0, 2, on_tpu=False,
                                  last_tpu=last)
    parsed = json.loads(json.dumps(rec))
    assert parsed["platform"] == "cpu-fallback"
    assert parsed["vs_baseline"] is None
    assert parsed["cpu_ratio_informational"] == 1.0157
    assert parsed["last_tpu"]["best"]["vs_baseline"] == 0.9851
    assert "NOT the MXU roofline bar" in parsed["note"]


def test_fallback_without_evidence_omits_last_tpu():
    bench = _load_bench()
    rec = bench.finalize_headline(50.0, 100.0, 1, on_tpu=False,
                                  last_tpu=None)
    assert rec["vs_baseline"] is None
    assert "last_tpu" not in rec


def _run(ts, ratio):
    return {"timestamp_utc": ts, "value": 100.0 * ratio,
            "roofline_gops": 100.0, "vs_baseline": ratio, "ab_pairs": 2}


def test_evidence_is_append_only(tmp_path, monkeypatch):
    """A weaker later run must never clobber a stronger record (VERDICT r3
    weak-2 / ADVICE r3): the history keeps both, and the fallback summary
    carries best AND latest."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "EVIDENCE_PATH",
                        str(tmp_path / "evidence.json"))
    assert bench.load_last_tpu() is None
    strong = _run("2026-08-19T00:00:00Z", 0.9995)
    weak = _run("2026-08-19T01:00:00Z", 0.9361)
    bench.append_tpu_run(strong)
    bench.append_tpu_run(weak)
    doc = bench.load_evidence()
    assert doc["schema"] == 2 and len(doc["runs"]) == 2
    summary = bench.load_last_tpu()
    assert summary["best"]["vs_baseline"] == 0.9995
    assert summary["latest"]["vs_baseline"] == 0.9361
    assert summary["n_runs"] == 2


def test_evidence_history_is_bounded(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "EVIDENCE_PATH",
                        str(tmp_path / "evidence.json"))
    for i in range(bench.EVIDENCE_MAX_RUNS + 5):
        bench.append_tpu_run(_run(f"2026-08-19T{i:02d}:00:00Z", 0.9))
    doc = bench.load_evidence()
    assert len(doc["runs"]) == bench.EVIDENCE_MAX_RUNS
    # the oldest runs fell off the front
    assert doc["runs"][0]["timestamp_utc"] == "2026-08-19T05:00:00Z"


def test_evidence_migrates_legacy_single_record(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "EVIDENCE_PATH",
                        str(tmp_path / "evidence.json"))
    legacy = _run("2026-08-19T00:00:00Z", 0.9361)
    (tmp_path / "evidence.json").write_text(json.dumps(legacy))
    doc = bench.load_evidence()
    assert doc["runs"] == [legacy]
    bench.append_tpu_run(_run("2026-08-19T02:00:00Z", 0.95))
    assert len(bench.load_evidence()["runs"]) == 2
    # corrupt file -> None, not a crash
    (tmp_path / "evidence.json").write_text("{not json")
    assert bench.load_last_tpu() is None
    assert bench.load_evidence() is None


def test_tpu_device_trace_record():
    """Round 4: a device-trace refinement becomes the primary
    value/vs_baseline; wall numbers move to wall_* fields (the wall ratio
    is biased toward 1.0 by shared tunnel overhead)."""
    bench = _load_bench()
    rec = bench.finalize_headline(
        200000.0, 205000.0, 3, on_tpu=True,
        device={"gops": 380000.0, "roofline_gops": 384000.0, "ab_pairs": 2})
    parsed = json.loads(json.dumps(rec))
    assert parsed["platform"] == "tpu"
    assert parsed["timing"] == "device-trace"
    assert parsed["value"] == 380000.0
    assert parsed["roofline_gops"] == 384000.0
    assert parsed["vs_baseline"] == round(380000.0 / 384000.0, 4)
    assert parsed["wall_gops"] == 200000.0
    assert parsed["wall_vs_baseline"] == round(200000.0 / 205000.0, 4)
    assert parsed["device_ab_pairs"] == 2


def test_tpu_record_without_device_keeps_wall_timing():
    bench = _load_bench()
    rec = bench.finalize_headline(200000.0, 205000.0, 3, on_tpu=True)
    parsed = json.loads(json.dumps(rec))
    assert parsed["timing"] == "wall"
    assert "wall_gops" not in parsed
