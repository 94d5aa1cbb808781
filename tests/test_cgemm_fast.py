"""Complex GEMM MXU fast path: lossless configs collapse to 4 (basic) /
3 (TF) integer matmuls; must match the general tree path bit-for-bit."""

import numpy as np
import pytest

from qublas_tpu.complex import complex_from_raw
from qublas_tpu.ops import cgemm as CG
from qublas_tpu.ops.cgemm import _fast_cgemul, cgemul
from qublas_tpu.qformat import OverflowMode, qformat

rng = np.random.RandomState(91)

F = qformat(3, 4)
WIDE = qformat(20, 8)
MID = qformat(5, 4)


def mat(shape, fr=F, fi=F):
    return complex_from_raw(rng.randint(fr.raw_min, fr.raw_max + 1, shape),
                            rng.randint(fi.raw_min, fi.raw_max + 1, shape),
                            fr, fi)


def general(a, b, out, **kw):
    orig = CG._fast_cgemul
    CG._fast_cgemul = lambda *a_, **k_: None
    try:
        return cgemul(a, b, out, **kw)
    finally:
        CG._fast_cgemul = orig


def assert_equal(x, y):
    np.testing.assert_array_equal(np.asarray(x.real.raw()),
                                  np.asarray(y.real.raw()))
    np.testing.assert_array_equal(np.asarray(x.imag.raw()),
                                  np.asarray(y.imag.raw()))
    assert x.real.fmt == y.real.fmt and x.imag.fmt == y.imag.fmt


BASIC_KW = dict(ac=WIDE, bd=WIDE, ad=WIDE, bc=WIDE, acbd=WIDE, adbc=WIDE)
TF_KW = dict(ab=MID, cd=MID, ba=MID, abc=WIDE, cdb=WIDE, bad=WIDE,
             AB=WIDE, BC=WIDE)


@pytest.mark.parametrize("algo", ["basic", "tf"])
@pytest.mark.parametrize("k", [1, 2, 5, 16, 33])
def test_fast_matches_general(algo, k):
    a, b = mat((4, k)), mat((k, 3))
    out = (qformat(18, 8), qformat(18, 8))
    fast = cgemul(a, b, out, algo=algo, add_formats=(WIDE,), **kw_for(algo))
    slow = general(a, b, out, algo=algo, add_formats=(WIDE,),
                   **kw_for(algo))
    assert_equal(fast, slow)
    # confirm the proof actually fired
    assert _fast_cgemul(a, b, out[0], out[1], algo, (WIDE,), (WIDE,),
                        kw_for(algo)) is not None


def kw_for(algo):
    return BASIC_KW if algo == "basic" else TF_KW


def test_mixed_part_formats():
    fr, fi = qformat(3, 4), qformat(2, 5)
    a, b = mat((3, 6), fr, fi), mat((6, 4), fr, fi)
    out = (qformat(18, 9), qformat(17, 9))
    fast = cgemul(a, b, out, algo="basic", add_formats=(WIDE,), **BASIC_KW)
    slow = general(a, b, out, algo="basic", add_formats=(WIDE,), **BASIC_KW)
    assert_equal(fast, slow)


def test_epilogue_saturation_allowed():
    """The final converting assignment may saturate — only the internal
    pipeline must be lossless."""
    narrow = (qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO),
              qformat(3, 4))
    a, b = mat((4, 8)), mat((8, 4))
    fast = cgemul(a, b, narrow, algo="basic", add_formats=(WIDE,),
                  **BASIC_KW)
    slow = general(a, b, narrow, algo="basic", add_formats=(WIDE,),
                   **BASIC_KW)
    assert_equal(fast, slow)


def test_lossy_configs_refuse_fast_path():
    f44 = qformat(4, 4)
    a, b = mat((3, 5), f44, f44), mat((5, 3), f44, f44)
    assert _fast_cgemul(a, b, f44, f44, "basic", (), (), {}) is None
    # default-inferred TF ba stage saturates -> refused
    assert _fast_cgemul(a, b, WIDE, WIDE, "tf", (WIDE,), (WIDE,),
                        dict(ab=WIDE, cd=WIDE, abc=WIDE, cdb=WIDE,
                             bad=WIDE, AB=WIDE, BC=WIDE)) is None
