"""Golden-model tests for scalar ops, reduction and gemm semantics."""

import pytest

from qublas_tpu import hostops as H
from qublas_tpu.hostint import double_to_raw, raw_to_double
from qublas_tpu.qformat import (
    FULL_PREC, OverflowMode, QFormat, RoundMode, add_merge, mul_merge,
)

R, O = RoundMode, OverflowMode


def q(x, fmt):
    return (double_to_raw(x, fmt), fmt)


def f(v):
    return raw_to_double(*v)


class TestMergers:
    def test_mul_default(self):
        a, b = QFormat(4, 3), QFormat(2, 7)
        out = mul_merge(a, b)
        assert (out.int_bits, out.frac_bits) == (4, 7)
        assert out.signed

    def test_mul_full_prec(self):
        out = mul_merge(QFormat(4, 3), QFormat(2, 7), full_prec=True)
        assert (out.int_bits, out.frac_bits) == (6, 10)

    def test_add_default_and_full_prec(self):
        a, b = QFormat(4, 3), QFormat(2, 7)
        assert (add_merge(a, b).int_bits, add_merge(a, b).frac_bits) == (4, 7)
        assert add_merge(a, b, full_prec=True).int_bits == 5

    def test_mode_conflict_falls_to_default(self):
        a = QFormat(4, 4, round_mode=R.RND_CONV, overflow_mode=O.SAT_ZERO)
        b = QFormat(4, 4, round_mode=R.RND_INF, overflow_mode=O.SAT_ZERO)
        out = mul_merge(a, b)
        assert out.round_mode == R.TRN_TCPL  # library default
        assert out.overflow_mode == O.SAT_ZERO  # shared -> kept

    def test_override(self):
        out = mul_merge(QFormat(4, 4), QFormat(4, 4), to={"frac_bits": 2})
        assert (out.int_bits, out.frac_bits) == (4, 2)


class TestScalarOps:
    def test_mul_simple(self):
        t = QFormat(8, 8)
        assert f(H.qmul(q(1.5, t), q(2.5, t))) == 3.75

    def test_mul_rounds_through_out_frac(self):
        t = QFormat(8, 2)
        # 1.25 * 1.25 = 1.5625, product frac=4 -> out frac=2, TRN_TCPL -> 1.5
        assert f(H.qmul(q(1.25, t), q(1.25, t))) == 1.5

    def test_mul_saturation_zero(self):
        t = QFormat(2, 2, overflow_mode=O.SAT_ZERO)
        # 3.75 * 3.75 = 14.06 overflows 2.2 -> SAT_ZERO gives 0
        assert f(H.qmul(q(3.75, t), q(3.75, t))) == 0.0

    def test_add_align(self):
        a, b = QFormat(4, 2), QFormat(4, 6)
        assert f(H.qadd(q(1.25, a), q(0.015625, b))) == 1.265625

    def test_sub(self):
        t = QFormat(8, 8)
        assert f(H.qsub(q(1.0, t), q(2.5, t))) == -1.5

    def test_div_truncates_toward_zero(self):
        t = QFormat(8, 8)
        # -1 / 3 at frac 8: raw = trunc(-256*256/768) = trunc(-85.33) = -85
        out = H.qdiv(q(-1.0, t), q(3.0, t))
        assert out[0] == -85

    def test_div_by_zero_is_zero(self):
        t = QFormat(8, 8)
        assert H.qdiv(q(5.0, t), q(0.0, t))[0] == 0

    def test_abs_neg_widen(self):
        t = QFormat(4, 4)
        a = H.qabs(q(-3.5, t))
        assert f(a) == 3.5 and a[1].int_bits == 5
        n = H.qneg(q(-3.5, t))
        assert f(n) == 3.5 and n[1].int_bits == 5

    def test_abs_unsigned_passthrough(self):
        t = QFormat(4, 4, signed=False)
        a = H.qabs(q(3.5, t))
        assert a[1] == t

    def test_cmp_eq_cross_format(self):
        a, b = QFormat(4, 2), QFormat(6, 5)
        assert H.qeq(q(1.25, a), q(1.25, b))
        assert H.qcmp(q(1.25, a), q(1.5, b)) == -1
        assert H.qcmp(q(2.0, a), q(1.5, b)) == 1


class TestReduce:
    def test_vector_path_even(self):
        t = QFormat(8, 8)
        vals = [q(x, t) for x in [1.0, 2.0, 3.0, 4.0]]
        assert f(H.qreduce_list(vals)) == 10.0

    def test_vector_odd_tail_passes_through(self):
        # layer fmt saturates hard; tail must NOT be added at layer 0
        t = QFormat(8, 8)
        vals = [q(x, t) for x in [1.0, 2.0, 3.0]]
        r = H.qreduce_list(vals)
        assert f(r) == 6.0

    def test_variadic_odd_tail_added_to_final(self):
        # 3 elems: variadic does ((a+b) + c) at layer-0 fmt;
        # with a narrow layer fmt both paths coincide here, so use a
        # saturating fmt to expose ordering.
        t = QFormat(3, 0, overflow_mode=O.SAT_TCPL)
        a, b, c = q(3.0, t), q(3.0, t), q(3.0, t)
        lf = QFormat(3, 0, overflow_mode=O.SAT_TCPL)  # max 7
        # vector: (a+b)=6 ; tail c -> layer1: 6+3 = 9 -> sat 7
        assert f(H.qreduce_list([a, b, c], lf)) == 7.0
        # variadic: (a+b)=6 reduced alone -> 6; then 6+3 -> sat 7
        assert f(H.qreduce_args([a, b, c], lf)) == 7.0

    def test_per_layer_types(self):
        t = QFormat(8, 8)
        l0 = QFormat(8, 4)
        l1 = QFormat(8, 1)
        vals = [q(x, t) for x in [1.03125, 1.03125, 1.03125, 1.03125]]
        # layer0: 1.03125+1.03125 = 2.0625 -> frac4 -> 2.0625; layer1 sum
        # 4.125 -> frac1 TRN -> 4.0
        r = H.qreduce_list(vals, (l0, l1))
        assert f(r) == 4.0
        assert r[1] == l1

    def test_single_element(self):
        t = QFormat(8, 8)
        assert f(H.qreduce_list([q(2.5, t)])) == 2.5
        assert f(H.qreduce_args([q(2.5, t)])) == 2.5

    def test_odd_tail_requantized_by_layer_fmt(self):
        # tail element 1.25 (frac 8) copied into layer fmt frac 0 -> 1.0
        t = QFormat(8, 8)
        lf = QFormat(8, 0)
        vals = [q(1.0, t), q(1.0, t), q(1.25, t)]
        # layer0: 1+1=2 (frac0); tail 1.25 -> converted to frac0 = 1.0
        # layer1: 2+1 = 3
        assert f(H.qreduce_list(vals, lf)) == 3.0


class TestGemm:
    def test_4x4_int8_identityish(self):
        t = QFormat(8, 8, round_mode=R.TRN_TCPL, overflow_mode=O.SAT_ZERO)
        A = [[q(float(i == j), t) for j in range(4)] for i in range(4)]
        B = [[q(i + j * 0.25, t) for j in range(4)] for i in range(4)]
        C = H.qgemul(A, B, out_fmt=t)
        for i in range(4):
            for j in range(4):
                assert f(C[i][j]) == f(B[i][j])

    def test_transpose_a(self):
        t = QFormat(8, 8)
        A = [[q(1.0, t), q(2.0, t)], [q(3.0, t), q(4.0, t)]]
        B = [[q(1.0, t), q(0.0, t)], [q(0.0, t), q(1.0, t)]]
        C = H.qgemul(A, B, out_fmt=t, transpose_a=True)
        assert f(C[0][1]) == 3.0 and f(C[1][0]) == 2.0

    def test_gemv(self):
        t = QFormat(8, 8)
        A = [[q(1.0, t), q(2.0, t)], [q(3.0, t), q(4.0, t)]]
        x = [q(1.0, t), q(0.5, t)]
        y = H.qgemv(A, x, out_fmt=t)
        assert [f(v) for v in y] == [2.0, 5.0]


class TestComplex:
    def test_basic_mul(self):
        t = QFormat(8, 8)
        a = (q(1.0, t), q(2.0, t))
        b = (q(3.0, t), q(4.0, t))
        re, im = H.complex_mul_basic(a, b)
        assert f(re) == -5.0 and f(im) == 10.0

    def test_tf_mul_matches_basic_when_lossless(self):
        t = QFormat(8, 8)
        wide = QFormat(20, 16)
        a = (q(1.5, t), q(-2.25, t))
        b = (q(0.5, t), q(3.0, t))
        re1, im1 = H.complex_mul_basic(a, b, ac=wide, bd=wide, ad=wide,
                                       bc=wide, acbd=wide, adbc=wide)
        re2, im2 = H.complex_mul_tf(a, b, ab=wide, cd=wide, ba=wide,
                                    abc=wide, cdb=wide, bad=wide,
                                    AB=wide, BC=wide)
        assert f(re1) == f(re2) and f(im1) == f(im2)

    def test_add_sub(self):
        t = QFormat(8, 8)
        a = (q(1.0, t), q(2.0, t))
        b = (q(3.0, t), q(-4.0, t))
        re, im = H.complex_add(a, b)
        assert f(re) == 4.0 and f(im) == -2.0
        re, im = H.complex_sub(a, b)
        assert f(re) == -2.0 and f(im) == 6.0


def test_full_prec_tag_object():
    assert repr(FULL_PREC) == "FullPrec"
