"""Complex tensor ops vs the host golden model (QuBLAS.h:3374-3739)."""

import numpy as np
import pytest

from qublas_tpu import hostops
from qublas_tpu.complex import (
    QComplexTensor, cadd, ceq, cmul, cmul_tf, cneg, complex_from_float,
    complex_from_raw, cr_add, cr_div, cr_mul, cr_sub, csub, rc_add, rc_mul,
    rc_sub,
)
from qublas_tpu.qformat import OverflowMode, RoundMode, qformat
from qublas_tpu.qtensor import from_raw

rng = np.random.RandomState(3)

F44 = qformat(4, 4)
F35 = qformat(3, 5)
TAG = qformat(4, 3, round_mode=RoundMode.RND_CONV,
              overflow_mode=OverflowMode.SAT_ZERO)


def rand_c(fr, fi, n=8):
    return complex_from_raw(rng.randint(fr.raw_min, fr.raw_max + 1, n),
                            rng.randint(fi.raw_min, fi.raw_max + 1, n),
                            fr, fi)


def host_pairs(c):
    re = np.asarray(c.real.raw(), dtype=object).reshape(-1)
    im = np.asarray(c.imag.raw(), dtype=object).reshape(-1)
    return [((int(r), c.real.fmt), (int(i), c.imag.fmt))
            for r, i in zip(re, im)]


def assert_matches(dev, host_list):
    for i, (hr, hi) in enumerate(host_list):
        assert int(dev.real.raw().reshape(-1)[i]) == hr[0], i
        assert int(dev.imag.raw().reshape(-1)[i]) == hi[0], i
    assert dev.real.fmt == host_list[0][0][1]
    assert dev.imag.fmt == host_list[0][1][1]


@pytest.mark.parametrize("kw", [{}, dict(ac=TAG, bd=TAG, ad=TAG, bc=TAG,
                                         acbd=TAG, adbc=TAG)])
def test_cmul_basic(kw):
    a, b = rand_c(F44, F35), rand_c(F44, F35)
    dev = cmul(a, b, **kw)
    host = [hostops.complex_mul_basic(x, y, **kw)
            for x, y in zip(host_pairs(a), host_pairs(b))]
    assert_matches(dev, host)


@pytest.mark.parametrize("kw", [
    {},
    dict(ab=TAG, cd=TAG, abc=TAG, cdb=TAG, bad=TAG, AB=TAG, BC=TAG),
    dict(ba=TAG),  # the reference ignores baT (QuBLAS.h:3515 ::list omission)
])
def test_cmul_tf(kw):
    a, b = rand_c(F44, F35), rand_c(F44, F35)
    dev = cmul_tf(a, b, **kw)
    host = [hostops.complex_mul_tf(x, y, **kw)
            for x, y in zip(host_pairs(a), host_pairs(b))]
    assert_matches(dev, host)


def test_cmul_tf_ba_quirk_propagates_to_other_stages():
    """Reference quirk pair: `ba` never applies to its own (b-a) step
    (::list omission, QuBLAS.h:3515) but, as the single supplied tag, it
    becomes the default for every *other* step (tagExtractor single-payload
    strip, QuBLAS.h:157-161)."""
    a, b = rand_c(F44, F44), rand_c(F44, F44)
    with_ba = cmul_tf(a, b, ba=TAG)
    # equivalent to explicitly tagging every stage (ba applies to its own
    # step when supplied; the others inherit the single-tag fallback)
    explicit = cmul_tf(a, b, ab=TAG, cd=TAG, ba=TAG, abc=TAG, cdb=TAG,
                       bad=TAG, AB=TAG, BC=TAG)
    np.testing.assert_array_equal(with_ba.real.raw(), explicit.real.raw())
    np.testing.assert_array_equal(with_ba.imag.raw(), explicit.imag.raw())
    assert with_ba.real.fmt == TAG


def test_cadd_csub_per_part_formats():
    a, b = rand_c(F44, F35), rand_c(F44, F35)
    dev = cadd(a, b, real_to=TAG, imag_to=qformat(5, 2))
    host = [hostops.complex_add(x, y, real_to=TAG, imag_to=qformat(5, 2))
            for x, y in zip(host_pairs(a), host_pairs(b))]
    assert_matches(dev, host)
    dev = csub(a, b)
    host = [hostops.complex_sub(x, y)
            for x, y in zip(host_pairs(a), host_pairs(b))]
    assert_matches(dev, host)


def test_cneg_negates_both_parts():
    a = rand_c(F44, F35)
    dev = cneg(a)
    assert dev.real.fmt.int_bits == F44.int_bits + 1
    np.testing.assert_array_equal(
        np.asarray(dev.real.raw(), np.int64),
        -np.asarray(a.real.raw(), np.int64))
    np.testing.assert_array_equal(
        np.asarray(dev.imag.raw(), np.int64),
        -np.asarray(a.imag.raw(), np.int64))


def test_ceq():
    a = rand_c(F44, F44)
    b = QComplexTensor(a.real, a.imag)
    assert bool(np.asarray(ceq(a, b)).all())
    c = rand_c(F44, F44)
    eq = np.asarray(ceq(a, c))
    manual = (np.asarray(a.real.raw()) == np.asarray(c.real.raw())) & (
        np.asarray(a.imag.raw()) == np.asarray(c.imag.raw()))
    np.testing.assert_array_equal(eq, manual)


# ---------------------------------------------------------------------------
# Real × complex mixed ops — asymmetric reference quirks
# ---------------------------------------------------------------------------

def test_rc_mul_cr_mul():
    r = from_raw(rng.randint(F44.raw_min, F44.raw_max + 1, 8), F44)
    c = rand_c(F44, F35)
    dev = rc_mul(r, c, real_to=TAG)
    # real*complex: per part multiply (QuBLAS.h:3603-3620)
    for i in range(8):
        hr, _ = hostops.qmul((int(r.raw()[i]), F44),
                             (int(c.real.raw()[i]), F44), to=TAG)
        assert int(dev.real.raw()[i]) == hr
    dev2 = cr_mul(c, r)
    for i in range(8):
        hi, _ = hostops.qmul((int(c.imag.raw()[i]), F35),
                             (int(r.raw()[i]), F44))
        assert int(dev2.imag.raw()[i]) == hi


def test_rc_add_imag_passes_through():
    """real + complex leaves the imaginary part untouched
    (QuBLAS.h:3648-3663)."""
    r = from_raw(rng.randint(F44.raw_min, F44.raw_max + 1, 8), F44)
    c = rand_c(F44, F35)
    dev = rc_add(r, c, to=TAG)
    assert dev.imag.fmt == F35
    np.testing.assert_array_equal(dev.imag.raw(), c.imag.raw())
    dev2 = cr_add(c, r)
    np.testing.assert_array_equal(dev2.imag.raw(), c.imag.raw())


def test_rc_sub_imag_is_zero_minus():
    """real - complex computes imag = (0 - c.imag) quantized with ``to``
    (QuBLAS.h:3682-3697)."""
    r = from_raw(rng.randint(F44.raw_min, F44.raw_max + 1, 8), F44)
    c = rand_c(F44, F35)
    dev = rc_sub(r, c, to=TAG)
    for i in range(8):
        hi, hf = hostops.qsub((0, F44), (int(c.imag.raw()[i]), F35), to=TAG)
        assert int(dev.imag.raw()[i]) == hi
        assert dev.imag.fmt == hf
    # complex - real: imag passes through (QuBLAS.h:3699-3713)
    dev2 = cr_sub(c, r)
    np.testing.assert_array_equal(dev2.imag.raw(), c.imag.raw())


def test_cr_div_per_part():
    r = from_raw(rng.randint(1, F44.raw_max + 1, 8), F44)
    c = rand_c(F44, F35)
    dev = cr_div(c, r)
    for i in range(8):
        hr, _ = hostops.qdiv((int(c.real.raw()[i]), F44),
                             (int(r.raw()[i]), F44))
        assert int(dev.real.raw()[i]) == hr


def test_complex_from_float_and_to_complex():
    c = complex_from_float([1.5 - 0.25j, -2.0 + 0.5j], qformat(4, 4))
    vals = c.to_complex()
    np.testing.assert_allclose(vals, [1.5 - 0.25j, -2.0 + 0.5j])


def test_width_property():
    c = rand_c(F44, F35)
    assert c.width == F44.width + F35.width  # QuBLAS.h:2509


def test_operators():
    a, b = rand_c(F44, F44), rand_c(F44, F44)
    assert isinstance(a * b, QComplexTensor)
    assert isinstance(a + b, QComplexTensor)
    assert isinstance(a - b, QComplexTensor)
    assert isinstance(-a, QComplexTensor)


def test_unsupported_divisions_raise():
    """Parity with the reference throws: complex/complex
    (QuBLAS.h:3591-3598) and real/complex (QuBLAS.h:3716-3720)."""
    from qublas_tpu.complex import cdiv, rc_div
    from qublas_tpu.qtensor import from_raw

    a, b = rand_c(F44, F44), rand_c(F44, F44)
    r = from_raw(rng.randint(1, F44.raw_max, 8), F44)
    with pytest.raises(NotImplementedError):
        cdiv(a, b)
    with pytest.raises(NotImplementedError):
        a / b
    with pytest.raises(NotImplementedError):
        rc_div(r, a)
