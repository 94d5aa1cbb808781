"""Complex quantized GEMM vs the host golden composition."""

import numpy as np
import pytest

from qublas_tpu import hostops
from qublas_tpu.complex import complex_from_raw
from qublas_tpu.ops.cgemm import cgemul, cgemv
from qublas_tpu.qformat import OverflowMode, RoundMode, qformat

rng = np.random.RandomState(31)

F44 = qformat(4, 4)
F35 = qformat(3, 5)
TAG = qformat(4, 3, round_mode=RoundMode.RND_CONV,
              overflow_mode=OverflowMode.SAT_ZERO)


def rand_cmat(fr, fi, shape):
    return complex_from_raw(rng.randint(fr.raw_min, fr.raw_max + 1, shape),
                            rng.randint(fi.raw_min, fi.raw_max + 1, shape),
                            fr, fi)


def host_rows(c):
    m, k = c.shape
    re = np.asarray(c.real.raw(), dtype=object)
    im = np.asarray(c.imag.raw(), dtype=object)
    return [[((int(re[i, p]), c.real.fmt), (int(im[i, p]), c.imag.fmt))
             for p in range(k)] for i in range(m)]


def check(dev, host):
    m, n = dev.shape
    for i in range(m):
        for j in range(n):
            (hr, hrf), (hi, hif) = host[i][j]
            assert int(dev.real.raw()[i, j]) == hr, (i, j)
            assert int(dev.imag.raw()[i, j]) == hi, (i, j)
    assert dev.real.fmt == host[0][0][0][1]
    assert dev.imag.fmt == host[0][0][1][1]


@pytest.mark.parametrize("algo", ["basic", "tf"])
@pytest.mark.parametrize("k", [1, 3, 4, 7])
def test_cgemul_matches_host(algo, k):
    a = rand_cmat(F44, F35, (3, k))
    b = rand_cmat(F44, F35, (k, 2))
    out = (qformat(6, 4), qformat(5, 5))
    layers = (qformat(6, 5),)
    dev = cgemul(a, b, out, algo=algo, add_formats=layers)
    host = hostops.cgemul(host_rows(a), host_rows(b), out, algo=algo,
                          add_formats=layers)
    check(dev, host)


def test_cgemul_tf_with_tags():
    k = 5
    a = rand_cmat(F44, F44, (2, k))
    b = rand_cmat(F44, F44, (k, 3))
    out = qformat(6, 4)
    dev = cgemul(a, b, out, algo="tf", ab=TAG, cd=TAG, abc=TAG, cdb=TAG,
                 bad=TAG, AB=TAG, BC=TAG)
    host = hostops.cgemul(host_rows(a), host_rows(b), out, algo="tf",
                          ab=TAG, cd=TAG, abc=TAG, cdb=TAG, bad=TAG,
                          AB=TAG, BC=TAG)
    check(dev, host)


def test_cgemul_per_part_layer_formats():
    k = 6
    a = rand_cmat(F44, F35, (2, k))
    b = rand_cmat(F44, F35, (k, 2))
    layers = ((qformat(6, 5), qformat(7, 4)),
              (qformat(5, 3), qformat(5, 2)))
    out = (qformat(5, 3), qformat(5, 2))
    dev = cgemul(a, b, out, add_formats=layers)
    host = hostops.cgemul(host_rows(a), host_rows(b), out,
                          add_formats=layers)
    check(dev, host)


def test_cgemul_transposes():
    k = 4
    a = rand_cmat(F44, F44, (k, 3))   # transposed A
    b = rand_cmat(F44, F44, (2, k))   # transposed B
    out = qformat(6, 4)
    dev = cgemul(a, b, out, transpose_a=True, transpose_b=True)
    at = complex_from_raw(np.asarray(a.real.raw()).T,
                          np.asarray(a.imag.raw()).T, F44)
    bt = complex_from_raw(np.asarray(b.real.raw()).T,
                          np.asarray(b.imag.raw()).T, F44)
    host = hostops.cgemul(host_rows(at), host_rows(bt), out)
    check(dev, host)


def test_cgemv():
    k = 5
    a = rand_cmat(F44, F44, (3, k))
    x = rand_cmat(F44, F44, (k,))
    out = qformat(6, 4)
    y = cgemv(a, x, out)
    col = complex_from_raw(np.asarray(x.real.raw()).reshape(k, 1),
                           np.asarray(x.imag.raw()).reshape(k, 1), F44)
    full = cgemul(a, col, out)
    np.testing.assert_array_equal(np.asarray(y.real.raw()),
                                  np.asarray(full.real.raw())[:, 0])


def test_gemm_epilogue_lut():
    from qublas_tpu.anus import build_table, sqrt_func
    from qublas_tpu.ops.gemm import qgemul
    from qublas_tpu.qtensor import from_raw

    f = qformat(3, 4)
    wide = qformat(20, 8)
    out = qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO)
    A = rng.randint(f.raw_min, f.raw_max + 1, (4, 8))
    B = rng.randint(f.raw_min, f.raw_max + 1, (8, 4))
    table = build_table(sqrt_func, out, out)
    fused = qgemul(from_raw(A, f), from_raw(B, f), out, mul_to=wide,
                   add_formats=(wide,), epilogue_lut=table)
    plain = table(qgemul(from_raw(A, f), from_raw(B, f), out, mul_to=wide,
                         add_formats=(wide,)))
    np.testing.assert_array_equal(np.asarray(fused.raw()),
                                  np.asarray(plain.raw()))
