"""Auxiliary subsystems: diagnostics, checkpoint/interchange (SURVEY.md §5)."""

import numpy as np
import pytest

from qublas_tpu import checkpoint, diagnostics
from qublas_tpu.complex import complex_from_raw
from qublas_tpu.qformat import OverflowMode, qformat
from qublas_tpu.qtensor import from_raw, from_float

rng = np.random.RandomState(17)


def test_requant_stats_counts():
    src = qformat(8, 8)
    dst = qformat(2, 2, overflow_mode=OverflowMode.SAT_ZERO)
    # raws: 0 (clean), 1 (rounds), 1<<14 (saturates: 64 at frac2 > raw_max 31)
    x = from_raw([0, 1, 1 << 14, -(1 << 14)], src)
    st = diagnostics.requant_stats(x, dst)
    assert int(st.total) == 4
    assert int(st.saturated) == 2
    assert int(st.rounded) == 1
    assert int(st.max_abs) == (1 << 14) >> 6


def test_requant_stats_wide_host():
    src = qformat(40, 40)
    dst = qformat(8, 8)
    x = from_raw(np.array([1 << 70, -(1 << 70), 0], dtype=object), src)
    st = diagnostics.requant_stats(x, dst)
    assert st.total == 3 and st.saturated == 2


def test_format_range_report():
    f = qformat(4, 4)
    x = from_float([1.0, -2.0, 0.0, 0.5], f)
    rep = diagnostics.format_range_report(x)
    assert 0 < rep["range_utilization"] < 1
    assert rep["zero_fraction"] == 0.25


def test_checkpoint_roundtrip(tmp_path):
    f = qformat(6, 3)
    w = qformat(40, 40)
    t = from_raw(rng.randint(f.raw_min, f.raw_max + 1, (3, 4)), f)
    wide = from_raw(np.array([1 << 70, -(1 << 66)], dtype=object), w)
    c = complex_from_raw([1, -2], [3, -4], qformat(3, 2))
    tree = {"a": t, "wide": wide, "c": c, "meta": 42,
            "arr": np.arange(4.0), "l": [t, "s"]}
    p = tmp_path / "ckpt.npz"
    checkpoint.save(str(p), tree)
    back = checkpoint.load(str(p))
    np.testing.assert_array_equal(np.asarray(back["a"].raw()),
                                  np.asarray(t.raw()))
    assert back["a"].fmt == f
    assert [int(v) for v in back["wide"].raw()] == [1 << 70, -(1 << 66)]
    assert back["wide"].fmt == w
    np.testing.assert_array_equal(np.asarray(back["c"].imag.raw()), [3, -4])
    assert back["meta"] == 42
    np.testing.assert_array_equal(back["arr"], np.arange(4.0))
    assert back["l"][1] == "s"


def test_bits_interchange_roundtrip():
    from qublas_tpu import bitstream as bs

    f = qformat(6, 3)
    t = from_raw(rng.randint(f.raw_min, f.raw_max + 1, (2, 3)), f)
    s = checkpoint.dumps_bits(t, bs.r2l(2), bs.r2l(5))
    back = checkpoint.loads_bits(s)
    np.testing.assert_array_equal(np.asarray(back.raw()), np.asarray(t.raw()))
    assert back.fmt == f


def test_requant_stats_wrp_counts_wraps():
    """For WRP targets 'saturated' counts *wrapped* elements (documented
    semantics): the rounded value leaving the identity range means
    int_convert would wrap it."""
    from qublas_tpu.qformat import OverflowMode, qformat
    from qublas_tpu.qtensor import from_raw

    src = qformat(10, 4)
    dst = qformat(3, 4, overflow_mode=OverflowMode.WRP_TCPL)  # range ±128
    x = from_raw([0, 100, 200, -300, 127, -128], src)
    st = diagnostics.requant_stats(x, dst)
    # 200 and -300 leave [-128, 127] -> 2 wraps; no frac bits dropped
    assert int(st.saturated) == 2
    assert int(st.rounded) == 0
    assert int(st.total) == 6
    # device path agrees with the host evaluation of the same tensor
    import numpy as np

    host = from_raw(np.array([0, 100, 200, -300, 127, -128],
                             dtype=object), qformat(40, 4))
    st_h = diagnostics.requant_stats(host, dst)
    assert int(st_h.saturated) == 2 and int(st_h.rounded) == 0


def test_checkpoint_wide_wart_raws_exact(tmp_path):
    """Checkpoints must round-trip raws OUTSIDE the format's representable
    range (fill(int) wart) — the wide encoding is exact decimal, not the
    width-lossy BitStream wire format."""
    import numpy as np

    from qublas_tpu import checkpoint
    from qublas_tpu.qformat import qformat
    from qublas_tpu.qtensor import from_raw

    f = qformat(60, 40, signed=False)  # wide unsigned
    raws = np.array([-5, int(f.raw_max) + 99, 7, -(1 << 90)], dtype=object)
    t = from_raw(raws, f)
    # wart raws that still fit the 128-bit limb word stay device-resident
    assert t.is_limb
    p = str(tmp_path / "wart.npz")
    checkpoint.save(p, t)
    back = checkpoint.load(p)
    got = [int(v) for v in np.asarray(back.raw(), dtype=object).reshape(-1)]
    assert got == [int(v) for v in raws]
    assert back.fmt == f
