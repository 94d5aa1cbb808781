"""ANUS: Qpoly / Qapprox / Qtable LUTs (QuBLAS.h:4829-4897, readme.md:66-78)."""

import math

import numpy as np
import pytest

from qublas_tpu import anus, hostint, hostops
from qublas_tpu.qformat import OverflowMode, QFormat, qformat
from qublas_tpu.qtensor import from_float, from_raw, scalar

rng = np.random.RandomState(11)

F48 = qformat(4, 8)


def host_qpoly(x_pair, coeff_pairs):
    """Reference Horner recursion (QuBLAS.h:4836-4851) on the host model."""
    acc = coeff_pairs[-1]
    for a in reversed(coeff_pairs[:-1]):
        acc = hostops.qadd(a, hostops.qmul(x_pair, acc, to=a[1]), to=a[1])
    return acc


def test_qpoly_matches_host_recursion():
    coeffs = [scalar(0.5, F48), scalar(-1.25, F48), scalar(0.75, F48)]
    xs = rng.randint(F48.raw_min, F48.raw_max + 1, 16)
    x = from_raw(xs, F48)
    dev = anus.qpoly(x, coeffs)
    cpairs = [(int(c.raw()), c.fmt) for c in coeffs]
    for i, xv in enumerate(xs):
        hr, hf = host_qpoly((int(xv), F48), cpairs)
        assert int(dev.raw()[i]) == hr
        assert dev.fmt == hf


def test_qpoly_mixed_coeff_formats():
    f1, f2, f3 = qformat(4, 8), qformat(6, 6), qformat(3, 9)
    coeffs = [scalar(0.3, f1), scalar(-0.7, f2), scalar(1.1, f3)]
    xs = rng.randint(F48.raw_min, F48.raw_max + 1, 8)
    x = from_raw(xs, F48)
    dev = anus.qpoly(x, coeffs)
    cpairs = [(int(c.raw()), c.fmt) for c in coeffs]
    for i, xv in enumerate(xs):
        hr, hf = host_qpoly((int(xv), F48), cpairs)
        assert int(dev.raw()[i]) == hr


def test_qapprox_segment_selection_and_recast():
    segs = [
        anus.Segment(0.0, [scalar(1.0, F48), scalar(0.5, F48)]),
        anus.Segment(1.0, [scalar(-1.0, F48), scalar(2.0, F48)]),
    ]
    xs = np.array([-1024, -512, -1, 0, 1, 255, 256, 511, 1023])
    x = from_raw(xs, F48)
    dev = anus.qapprox(x, segs)
    assert dev.fmt == F48  # decltype(x){...} recast (QuBLAS.h:4871, 4880)
    cp0 = [(int(c.raw()), c.fmt) for c in segs[0].coeffs]
    cp1 = [(int(c.raw()), c.fmt) for c in segs[1].coeffs]
    for i, xv in enumerate(xs):
        val = hostint.raw_to_double(int(xv), F48)
        pair = host_qpoly((int(xv), F48), cp0 if val < 0.0 else cp1)
        expect = hostops.convert(pair, F48)[0]
        assert int(dev.raw()[i]) == expect, (i, xv)


def test_qapprox_breakpoint_strictly_less():
    """x.toDouble() < breakpoint selects the segment (QuBLAS.h:4870):
    the boundary raw goes to the *next* segment."""
    f = qformat(4, 2)
    segs = [anus.Segment(1.0, [scalar(1.0, f)]),
            anus.Segment(10.0, [scalar(2.0, f)])]
    x = from_raw([3, 4, 5], f)  # 0.75, 1.0, 1.25
    dev = anus.qapprox(x, segs)
    vals = dev.to_double()
    assert vals[0] == 1.0 and vals[1] == 2.0 and vals[2] == 2.0


def test_qtable_exhaustive_vs_direct():
    f_in = qformat(2, 5)  # width 8 -> 256 entries
    f_out = qformat(1, 6, overflow_mode=OverflowMode.SAT_ZERO)
    table = anus.build_table(anus.rsqrt_func, f_in, f_out)
    all_raws = np.arange(f_in.raw_min, f_in.raw_max + 1)
    x = from_raw(all_raws, f_in)
    dev = table(x)
    for i, r in enumerate(all_raws):
        val = hostint.raw_to_double(int(r), f_in)
        want = anus.rsqrt_func(val) if val != 0 else math.inf
        expect = hostint.double_to_raw(want, f_out)
        assert int(dev.raw()[i]) == expect, (r, val)


def test_qtable_predefined_functions():
    f = qformat(3, 4)
    x = from_float([4.0, 0.25, 2.25], f)
    r1 = anus.qtable(x, anus.rsqrt_func)
    np.testing.assert_allclose(r1.to_double(), [0.5, 2.0, 1.0 / 1.5],
                               atol=f.scale)
    r2 = anus.qtable(x, anus.reciprocal_func)
    np.testing.assert_allclose(r2.to_double(), [0.25, 4.0, 1 / 2.25],
                               atol=f.scale)
    r3 = anus.qtable(x, anus.sqrt_func)
    np.testing.assert_allclose(r3.to_double(), [2.0, 0.5, 1.5],
                               atol=f.scale)


def test_qtable_nonfinite_to_zero():
    f = qformat(3, 4)
    x = from_float([0.0, -1.0], f)
    r = anus.qtable(x, anus.reciprocal_func)  # 1/0 = inf -> 0
    assert int(r.raw()[0]) == 0
    r2 = anus.qtable(x, anus.sqrt_func)  # sqrt(-1) = nan -> 0
    assert int(r2.raw()[1]) == 0


def test_qtable_out_fmt_defaults_to_input():
    f = qformat(3, 4)
    x = from_float([1.0], f)
    assert anus.qtable(x, anus.sqrt_func).fmt == f


def test_qtable_unsigned_format():
    f = qformat(3, 3, signed=False)  # width 6 -> 64 entries, all >= 0
    all_raws = np.arange(0, 1 << 6)
    x = from_raw(all_raws, f)
    dev = anus.qtable(x, anus.sqrt_func)
    for i, r in enumerate(all_raws):
        val = hostint.raw_to_double(int(r), f)
        expect = hostint.double_to_raw(anus.sqrt_func(val), f)
        assert int(dev.raw()[i]) == expect


def test_qtable_width_cap():
    with pytest.raises(ValueError):
        anus.build_table(anus.sqrt_func, qformat(20, 10))


def test_qtable_signedness_collision_rejected():
    """Signed (3,4) and unsigned (4,4) share width 8 / frac 4 but interpret
    bit patterns differently (sign fold): a table built for one must reject
    the other instead of silently misreading it (round-2 VERDICT fix)."""
    signed_f = qformat(3, 4)              # width 8, frac 4, signed
    unsigned_f = qformat(4, 4, signed=False)  # width 8, frac 4, unsigned
    assert signed_f.width == unsigned_f.width
    table = anus.build_table(anus.sqrt_func, signed_f)
    x = from_raw([200], unsigned_f)  # raw 200: +12.5 unsigned, -3.5 signed
    with pytest.raises(ValueError):
        table(x)
    # other direction too
    table_u = anus.build_table(anus.sqrt_func, unsigned_f)
    with pytest.raises(ValueError):
        table_u(from_raw([-56], signed_f))


def test_qtable_mode_variants_accepted():
    """Round/overflow modes don't change bit-pattern interpretation, so a
    table built for one mode combo applies to another."""
    from qublas_tpu.qformat import OverflowMode, RoundMode

    f1 = qformat(3, 4)
    f2 = qformat(3, 4, round_mode=RoundMode.RND_CONV,
                 overflow_mode=OverflowMode.SAT_ZERO)
    table = anus.build_table(anus.sqrt_func, f1)
    x = from_float([1.0, 2.25], f2)
    y = table(x)
    ref = table(from_float([1.0, 2.25], f1))
    np.testing.assert_array_equal(np.asarray(y.raw()), np.asarray(ref.raw()))


def test_qpoly_qapprox_limb_formats():
    """Horner chains and segment selection on 65..256-bit limb-stored
    tensors (device N-limb route) vs the host recursion."""
    fw = qformat(80, 40)           # 121-bit storage -> limb
    fc = qformat(90, 30)
    xs = np.array([(int(v) << 57) + 12345 for v in
                   rng.randint(-2**40, 2**40, size=10)], dtype=object)
    x = from_raw(xs, fw)
    assert x.is_limb
    coeffs = [from_raw(np.array(3 << 29, dtype=object), fc),
              from_raw(np.array(-(5 << 27), dtype=object), fc),
              from_raw(np.array(7 << 25, dtype=object), fc)]
    dev = anus.qpoly(x, coeffs)
    cpairs = [(int(np.asarray(c.raw(), dtype=object).reshape(())), c.fmt)
              for c in coeffs]
    draw = np.asarray(dev.raw(), dtype=object).reshape(-1)
    for i, xv in enumerate(xs):
        hr, hf = host_qpoly((int(xv), fw), cpairs)
        assert int(draw[i]) == hr, i
        assert dev.fmt == hf

    segs = [
        anus.Segment(0.0, [coeffs[0], coeffs[1]]),
        anus.Segment(1.0, [coeffs[1], coeffs[2]]),
    ]
    dev = anus.qapprox(x, segs)
    assert dev.fmt == fw and dev.is_limb
    draw = np.asarray(dev.raw(), dtype=object).reshape(-1)
    cp0 = [cpairs[0], cpairs[1]]
    cp1 = [cpairs[1], cpairs[2]]
    for i, xv in enumerate(xs):
        val = hostint.raw_to_double(int(xv), fw)
        pair = host_qpoly((int(xv), fw), cp0 if val < 0.0 else cp1)
        expect = hostops.convert(pair, fw)[0]
        assert int(draw[i]) == expect, (i, int(xv))
