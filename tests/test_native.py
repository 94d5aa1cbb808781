"""Differential tests: native C++ host engine vs the exact Python model.

The Python model (hostint/hostops) is the semantic source of truth (itself
pinned to the compiled reference by tests/golden_data); the native engine
must agree bit-for-bit on every input in its supported envelope.
"""

import itertools

import numpy as np
import pytest

from qublas_tpu import hostint, hostops, native
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable (no g++)")

rng = np.random.RandomState(123)

ALL_RM = list(RoundMode)
ALL_OM = list(OverflowMode)


def sample(fmt, n=200):
    return rng.randint(fmt.raw_min, fmt.raw_max + 1, size=n)


@pytest.mark.parametrize("rm", ALL_RM)
@pytest.mark.parametrize("om", ALL_OM)
def test_requantize_all_modes(rm, om):
    src = qformat(6, 6)
    dst = qformat(3, 2, round_mode=rm, overflow_mode=om)
    raws = sample(src)
    got = native.requantize(raws, src, dst)
    assert got is not None
    want = [hostint.requantize(int(v), src.frac_bits, dst) for v in raws]
    assert got.tolist() == want


@pytest.mark.parametrize("src,dst", [
    (qformat(4, 4), qformat(8, 9)),                 # widening
    (qformat(6, -3), qformat(2, 1)),                # negative frac
    (qformat(-2, 6), qformat(-1, 3)),               # negative int
    (qformat(10, 10), qformat(3, 3, signed=False)), # unsigned target
    (qformat(30, 30), qformat(8, 8)),               # wide-ish source
])
def test_requantize_shapes(src, dst):
    raws = sample(src, 100)
    got = native.requantize(raws, src, dst)
    assert got is not None
    want = [hostint.requantize(int(v), src.frac_bits, dst) for v in raws]
    assert got.tolist() == want


@pytest.mark.parametrize("rm", ALL_RM)
def test_double_to_raw(rm):
    for f in (qformat(8, 8, round_mode=rm),
              qformat(6, -3, round_mode=rm),
              qformat(-2, 6, round_mode=rm),
              qformat(3, 5, signed=False, round_mode=rm,
                      overflow_mode=OverflowMode.SAT_ZERO),
              qformat(30, 30, round_mode=rm)):
        vals = [0.0, 1.0, -1.0, 1.25, -1.25, 0.1, -0.1, 3.14159,
                1e-8, -1e-8, 123456.789, -123456.789, 1e20, -1e20,
                1e-300, -1e-300, 0.09375, 1.59375, float("nan"),
                float("inf"), float("-inf"), 255.9999, -256.0]
        got = native.double_to_raw(np.array(vals), f)
        assert got is not None
        want = [hostint.double_to_raw(v, f) for v in vals]
        assert got.tolist() == want, (f, [
            (v, g, w) for v, g, w in zip(vals, got.tolist(), want) if g != w])


def test_double_to_raw_refuses_wrap_modes():
    f = qformat(8, 8, overflow_mode=OverflowMode.WRP_TCPL)
    assert native.double_to_raw(np.array([1.0]), f) is None


@pytest.mark.parametrize("op", ["mul", "add", "sub", "div"])
def test_binary_ops(op):
    fa, fb = qformat(4, 4), qformat(3, 5)
    host_fn = {"mul": hostops.qmul, "add": hostops.qadd,
               "sub": hostops.qsub, "div": hostops.qdiv}[op]
    for rm, om in itertools.product(
            (RoundMode.TRN_TCPL, RoundMode.RND_CONV, RoundMode.RND_INF),
            (OverflowMode.SAT_TCPL, OverflowMode.SAT_ZERO,
             OverflowMode.WRP_TCPL)):
        to = qformat(3, 2, round_mode=rm, overflow_mode=om)
        a, b = sample(fa, 100), sample(fb, 100)
        if op == "div":
            b[b == 0] = 1
            b[7] = 0  # keep one div-by-zero case
        got = native.binary_op(op, a, b, fa, fb, to)
        assert got is not None
        want = [host_fn((int(x), fa), (int(y), fb), to=to)[0]
                for x, y in zip(a, b)]
        assert got.tolist() == want, (op, rm, om)


def test_pack_unpack_bits():
    f = qformat(6, 3)
    raws = sample(f, 64)
    s = native.pack_bits(raws, f.width)
    assert s is not None
    from qublas_tpu.bitstream import elem_bits

    assert s == "".join(elem_bits(int(v), f.width) for v in raws)
    back = native.unpack_bits(s, f.width, True)
    assert back.tolist() == [int(v) for v in raws]
    back_u = native.unpack_bits(s, f.width, False)
    assert back_u.tolist() == [int(v) & ((1 << f.width) - 1) for v in raws]


def test_from_float_uses_native_and_matches():
    from qublas_tpu.qtensor import from_float

    f = qformat(8, 8, round_mode=RoundMode.RND_POS_INF)
    vals = rng.randn(1000) * 100
    t = from_float(vals, f)
    want = [hostint.double_to_raw(float(v), f) for v in vals]
    assert [int(v) for v in np.asarray(t.raw()).reshape(-1)] == want


def test_oversized_formats_route_to_multiword():
    """Formats past the 64-bit scalar envelope run on the compiled
    multiword engine, which picks its working width per config (512..8192
    bits since late round 4; 2048 max through round 3); only configurations
    whose intermediates exceed 8190 bits refuse."""
    from qublas_tpu import hostint

    wide = qformat(40, 40)  # storage 81: multiword territory
    got = native.requantize([(1 << 70) + 3], wide, wide)
    assert got is not None and int(got[0]) == (1 << 70) + 3
    # a ~900-bit intermediate now lands on the 1024-bit engine (round-2
    # refused it at the fixed 512-bit width) and must match the oracle
    src = qformat(500, 0)
    dst = qformat(500, 400)
    got = native.requantize([1 << 490], src, dst)
    assert got is not None
    assert int(got[0]) == hostint.requantize(1 << 490, 0, dst)
    # ~2400-bit intermediates land on the round-4 4096-bit engine (these
    # refused through round 3 and ran the Python-int loop)
    src2 = qformat(1500, 0)
    dst2 = qformat(1500, 900)
    got = native.requantize([1 << 1400], src2, dst2)
    assert got is not None
    assert int(got[0]) == hostint.requantize(1 << 1400, 0, dst2)
    # past the 8192-bit engine: refuse, exact Python model covers it
    src3 = qformat(5000, 0)
    dst3 = qformat(5000, 4000)
    assert native.requantize([1 << 4900], src3, dst3) is None
    assert hostint.requantize(1 << 4900, 0, dst3) == (1 << 4900) << 4000


@pytest.mark.parametrize("k", [1, 2, 3, 5, 8, 13, 16, 33])
def test_tree_gemm_host_matches_oracle(k):
    from qublas_tpu.qformat import mul_merge

    fa, fb = qformat(4, 4), qformat(3, 5)
    mul_to = qformat(5, 5, overflow_mode=OverflowMode.SAT_ZERO)
    layers = (qformat(6, 4, round_mode=RoundMode.RND_CONV), qformat(5, 2))
    out = qformat(6, 3)
    m, n = 3, 4
    A = rng.randint(fa.raw_min, fa.raw_max + 1, (m, k))
    B = rng.randint(fb.raw_min, fb.raw_max + 1, (k, n))
    mul_fmt = mul_merge(fa, fb, mul_to, False)
    got = native.tree_gemm_host(A, B, fa, fb, mul_fmt, layers, out)
    assert got is not None
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    want = np.array([[c[0] for c in row]
                     for row in hostops.qgemul(ar, br, out, mul_to, layers)])
    np.testing.assert_array_equal(got, want)


def test_tree_gemm_host_wide_formats_work():
    """The whole point of the C++ engine: 64-bit-storage formats whose
    intermediates exceed int32 still run natively (i128)."""
    from qublas_tpu.qformat import mul_merge

    f = qformat(12, 12)  # 25-bit storage; full-prec product = 49-bit
    out = qformat(22, 18)
    k = 6
    A = rng.randint(f.raw_min, f.raw_max + 1, (2, k)).astype(object)
    B = rng.randint(f.raw_min, f.raw_max + 1, (k, 2)).astype(object)
    mul_fmt = mul_merge(f, f, None, True)  # full-prec product (40,40)
    got = native.tree_gemm_host(A, B, f, f, mul_fmt, (mul_fmt,), out)
    assert got is not None
    ar = [[(int(A[i, p]), f) for p in range(k)] for i in range(2)]
    br = [[(int(B[p, j]), f) for j in range(2)] for p in range(k)]
    want = np.array([[c[0] for c in row]
                     for row in hostops.qgemul(ar, br, out, None, (mul_fmt,),
                                               mul_full_prec=True)])
    np.testing.assert_array_equal(got, want)


def test_w_requant_extreme_right_shifts():
    """Requantize shifts at and beyond the 512-bit engine word: d == 512
    needs an UNSIGNED tie compare (2^511 sets the W512 sign bit) and
    d >= 513 must not build the threshold at all (w_pow2(d-1) would write
    past the limb array — stack corruption before the fix).  All RND modes,
    positive/negative/tiny values, vs the exact host model."""
    fa = QFormat(200, 100)
    fb = QFormat(10, 4)
    vals = np.array([(1 << 250) + 12345, -(1 << 280), -((1 << 300) - 7),
                     7, -1, 0], dtype=object)
    bv = np.array([9, -3, 11, 5, -128, 1], dtype=object)
    for rm in RoundMode:
        # d = 104 - to_frac: covers 534, 524, 516, 513, 512, 511, 504
        for to_frac in (-430, -420, -412, -409, -408, -407, -400):
            to = QFormat(480, to_frac, True, rm, OverflowMode.SAT_TCPL)
            res = native.binary_op_wide("mul", vals, bv, fa, fb, to)
            if res is None:
                continue  # engine rejected the envelope: host path serves it
            for x, y, g in zip(vals, bv, res):
                want = hostops.qmul((int(x), fa), (int(y), fb), to=to)[0]
                assert int(g) == want, (rm, to_frac, int(x), int(y),
                                        int(g), want)
