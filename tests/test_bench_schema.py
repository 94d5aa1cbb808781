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
    last = {"timestamp_utc": "2026-08-19T00:00:00Z", "value": 231400.0,
            "roofline_gops": 234900.0, "vs_baseline": 0.9851}
    # a CPU ratio > 1.0 (the BENCH_r02 failure mode) must not be able to
    # land in vs_baseline
    rec = bench.finalize_headline(101.57, 100.0, 2, on_tpu=False,
                                  last_tpu=last)
    parsed = json.loads(json.dumps(rec))
    assert parsed["platform"] == "cpu-fallback"
    assert parsed["vs_baseline"] is None
    assert parsed["cpu_ratio_informational"] == 1.0157
    assert parsed["last_tpu"]["vs_baseline"] == 0.9851
    assert "NOT the MXU roofline bar" in parsed["note"]


def test_fallback_without_evidence_omits_last_tpu():
    bench = _load_bench()
    rec = bench.finalize_headline(50.0, 100.0, 1, on_tpu=False,
                                  last_tpu=None)
    assert rec["vs_baseline"] is None
    assert "last_tpu" not in rec


def test_evidence_round_trip(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "EVIDENCE_PATH",
                        str(tmp_path / "evidence.json"))
    assert bench.load_last_tpu() is None
    rec = {"timestamp_utc": "2026-08-19T00:00:00Z", "value": 1.0,
           "vs_baseline": 0.98}
    bench.save_last_tpu(rec)
    assert bench.load_last_tpu() == rec
    # corrupt file -> None, not a crash
    (tmp_path / "evidence.json").write_text("{not json")
    assert bench.load_last_tpu() is None
