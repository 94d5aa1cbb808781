"""Deterministic differential fuzz: random format/mode/op configurations,
device paths vs the exact host golden model.

The width-proof router (ops/widths.py) decides i32 / pair / host per config;
this sweep hammers the decision boundaries with random widths (including
negative int/frac bits) so no route disagrees with the oracle.
"""

import numpy as np
import pytest

import depthctl

from qublas_tpu import hostops
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.ops.reduce import qreduce
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat

rng = np.random.RandomState(20260817)


def reseed(name: str, trial: int):
    global rng
    import zlib

    rng = np.random.RandomState(
        zlib.crc32(f"{name}:{trial}".encode()) % (2**31))


def rand_fmt(max_total=24):
    while True:
        i = int(rng.randint(-6, 20))
        f = int(rng.randint(-6, 20))
        if 0 <= i + f <= max_total:
            break
    return qformat(i, f, bool(rng.randint(0, 2)),
                   RoundMode(rng.randint(0, 7)),
                   OverflowMode(rng.randint(0, 5)))


def rand_raws(fmt, n):
    lo = max(fmt.raw_min, -(1 << 62))
    hi = min(fmt.raw_max, (1 << 62) - 1)
    return np.array([int(rng.randint(lo, hi + 1)) for _ in range(n)],
                    dtype=object)


@pytest.mark.parametrize("trial", range(depthctl.trials(60, 24)))
def test_fuzz_binary_ops(trial):
    reseed("test_fuzz_binary_ops", trial)
    from qublas_tpu.qtensor import from_raw

    fa, fb = rand_fmt(), rand_fmt()
    to = None if rng.randint(0, 2) else rand_fmt()
    op = ["qmul", "qadd", "qsub", "qdiv"][rng.randint(0, 4)]
    n = 24
    a_raws, b_raws = rand_raws(fa, n), rand_raws(fb, n)
    if op == "qdiv":
        b_raws = np.array([v if v else 1 for v in b_raws], dtype=object)
        b_raws[3] = 0  # keep one div-by-zero
    a, b = from_raw(a_raws, fa), from_raw(b_raws, fb)
    dev = getattr(ew, op)(a, b, to=to)
    host_fn = getattr(hostops, op)
    for x, y, g in zip(a_raws, b_raws,
                       np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, wf = host_fn((int(x), fa), (int(y), fb), to=to)
        assert int(g) == want, (op, fa, fb, to, int(x), int(y), int(g), want)
        assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(20, 8)))
def test_fuzz_qreduce(trial):
    reseed("test_fuzz_qreduce", trial)
    from qublas_tpu.qtensor import from_raw

    fa = rand_fmt(16)
    n = int(rng.randint(1, 20))
    nlayers = rng.randint(0, 3)
    layers = tuple(rand_fmt(20) for _ in range(nlayers))
    raws = rand_raws(fa, n)
    dev = qreduce(from_raw(raws, fa), layers)
    want, wf = hostops.qreduce_list([(int(v), fa) for v in raws], layers)
    assert int(np.asarray(dev.raw(), dtype=object)) == want, (fa, layers, n)
    assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(12, 6)))
def test_fuzz_qgemul(trial):
    reseed("test_fuzz_qgemul", trial)
    from qublas_tpu.qtensor import from_raw

    fa, fb = rand_fmt(14), rand_fmt(14)
    out = rand_fmt(16)
    mul_to = None if rng.randint(0, 2) else rand_fmt(20)
    nlayers = rng.randint(0, 3)
    layers = tuple(rand_fmt(22) for _ in range(nlayers))
    m, k, n = (int(rng.randint(1, 5)) for _ in range(3))
    A = rand_raws(fa, m * k).reshape(m, k)
    B = rand_raws(fb, k * n).reshape(k, n)
    dev = qgemul(from_raw(A, fa), from_raw(B, fb), out, mul_to=mul_to,
                 add_formats=layers)
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    host = hostops.qgemul(ar, br, out, mul_to, layers)
    got = np.asarray(dev.raw(), dtype=object)
    for i in range(m):
        for j in range(n):
            assert int(got[i, j]) == host[i][j][0], (
                fa, fb, out, mul_to, layers, (m, k, n), i, j)


@pytest.mark.parametrize("trial", range(depthctl.trials(16, 8)))
def test_fuzz_complex_mul(trial):
    reseed("test_fuzz_complex_mul", trial)
    from qublas_tpu import hostops
    from qublas_tpu.complex import cmul, cmul_tf, complex_from_raw

    fr, fi = rand_fmt(14), rand_fmt(14)
    algo = "tf" if rng.randint(0, 2) else "basic"
    names = (("ab", "cd", "ba", "abc", "cdb", "bad", "AB", "BC")
             if algo == "tf" else
             ("ac", "bd", "ad", "bc", "acbd", "adbc"))
    kw = {n: (rand_fmt(18) if rng.randint(0, 2) else None) for n in names}
    n = 12
    a = complex_from_raw(rand_raws(fr, n), rand_raws(fi, n), fr, fi)
    b = complex_from_raw(rand_raws(fr, n), rand_raws(fi, n), fr, fi)
    dev = (cmul_tf if algo == "tf" else cmul)(a, b, **kw)
    host_fn = (hostops.complex_mul_tf if algo == "tf"
               else hostops.complex_mul_basic)
    for i in range(n):
        hp = host_fn(((int(a.real.raw()[i]), fr), (int(a.imag.raw()[i]), fi)),
                     ((int(b.real.raw()[i]), fr), (int(b.imag.raw()[i]), fi)),
                     **kw)
        assert int(np.asarray(dev.real.raw(), dtype=object)[i]) == hp[0][0], \
            (algo, kw, i)
        assert int(np.asarray(dev.imag.raw(), dtype=object)[i]) == hp[1][0], \
            (algo, kw, i)


@pytest.mark.parametrize("trial", range(depthctl.trials(10, 5)))
def test_fuzz_cgemul(trial):
    reseed("test_fuzz_cgemul", trial)
    from qublas_tpu import hostops
    from qublas_tpu.complex import complex_from_raw
    from qublas_tpu.ops.cgemm import cgemul

    fr, fi = rand_fmt(10), rand_fmt(10)
    out = (rand_fmt(16), rand_fmt(16))
    layers = tuple(rand_fmt(20) for _ in range(rng.randint(0, 3)))
    m, k, n = (int(rng.randint(1, 4)) for _ in range(3))
    a = complex_from_raw(rand_raws(fr, m * k).reshape(m, k),
                         rand_raws(fi, m * k).reshape(m, k), fr, fi)
    b = complex_from_raw(rand_raws(fr, k * n).reshape(k, n),
                         rand_raws(fi, k * n).reshape(k, n), fr, fi)
    dev = cgemul(a, b, out, algo="basic", add_formats=layers)
    ar = [[((int(np.asarray(a.real.raw(), dtype=object)[i, p]), fr),
            (int(np.asarray(a.imag.raw(), dtype=object)[i, p]), fi))
           for p in range(k)] for i in range(m)]
    br = [[((int(np.asarray(b.real.raw(), dtype=object)[p, j]), fr),
            (int(np.asarray(b.imag.raw(), dtype=object)[p, j]), fi))
           for j in range(n)] for p in range(k)]
    host = hostops.cgemul(ar, br, out, algo="basic", add_formats=layers)
    for i in range(m):
        for j in range(n):
            assert int(np.asarray(dev.real.raw(), dtype=object)[i, j]) == \
                host[i][j][0][0], (fr, fi, out, layers, i, j)
            assert int(np.asarray(dev.imag.raw(), dtype=object)[i, j]) == \
                host[i][j][1][0], (fr, fi, out, layers, i, j)


@pytest.mark.parametrize("trial", range(depthctl.trials(6, 3)))
def test_fuzz_sharded_mn(trial):
    """M/N sharding must be bit-exact for any (possibly order-sensitive)
    config — each output element's full tree runs on one device."""
    reseed("test_fuzz_sharded_mn", trial)
    from qublas_tpu.parallel import make_mesh, sharded_qgemul_mn
    from qublas_tpu.qtensor import from_raw

    fa, fb = rand_fmt(12), rand_fmt(12)
    out = rand_fmt(14)
    layers = tuple(rand_fmt(18) for _ in range(rng.randint(0, 2)))
    mesh = make_mesh(dp=2, tp=4)
    m, k, n = 4, int(rng.randint(1, 6)), 8
    A = rand_raws(fa, m * k).reshape(m, k)
    B = rand_raws(fb, k * n).reshape(k, n)
    a, b = from_raw(A, fa), from_raw(B, fb)
    if a.is_host or b.is_host:
        pytest.skip("host-path formats don't shard")
    ref = qgemul(a, b, out, add_formats=layers)
    got = sharded_qgemul_mn(a, b, out, mesh, add_formats=layers)
    np.testing.assert_array_equal(np.asarray(got.raw()),
                                  np.asarray(ref.raw()))


@pytest.mark.parametrize("trial", range(depthctl.trials(20, 8)))
def test_fuzz_qcast(trial):
    reseed("test_fuzz_qcast", trial)
    from qublas_tpu.qtensor import from_raw

    src, dst = rand_fmt(40), rand_fmt(40)
    raws = rand_raws(src, 32)
    dev = ew.qcast(from_raw(raws, src), dst)
    for x, g in zip(raws, np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.convert((int(x), src), dst)
        assert int(g) == want, (src, dst, int(x))


# ---------------------------------------------------------------------------
# Wide (33..64-bit storage) formats: device limb-pair storage vs the oracle
# ---------------------------------------------------------------------------

def rand_wide_fmt():
    """Format with 33..64-bit physical storage (device pair storage)."""
    while True:
        i = int(rng.randint(-6, 60))
        f = int(rng.randint(-6, 60))
        if 32 <= i + f <= 63:
            break
    return qformat(i, f, bool(rng.randint(0, 2)),
                   RoundMode(rng.randint(0, 7)),
                   OverflowMode(rng.randint(0, 5)))


@pytest.mark.parametrize("trial", range(depthctl.trials(40, 16)))
def test_fuzz_wide_binary_ops(trial):
    reseed("test_fuzz_wide_binary_ops", trial)
    from qublas_tpu.qtensor import from_raw

    fa = rand_wide_fmt()
    fb = rand_wide_fmt() if rng.randint(0, 2) else rand_fmt()
    if rng.randint(0, 2):
        fa, fb = fb, fa
    to = None if rng.randint(0, 3) == 0 else (
        rand_wide_fmt() if rng.randint(0, 2) else rand_fmt())
    op = ["qmul", "qadd", "qsub", "qdiv"][rng.randint(0, 4)]
    n = 16
    a_raws, b_raws = rand_raws(fa, n), rand_raws(fb, n)
    if op == "qdiv":
        b_raws = np.array([v if v else 1 for v in b_raws], dtype=object)
    a, b = from_raw(a_raws, fa), from_raw(b_raws, fb)
    dev = getattr(ew, op)(a, b, to=to)
    host_fn = getattr(hostops, op)
    for x, y, g in zip(a_raws, b_raws,
                       np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, wf = host_fn((int(x), fa), (int(y), fb), to=to)
        assert int(g) == want, (op, fa, fb, to, int(x), int(y), int(g), want)
        assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(12, 5)))
def test_fuzz_wide_qreduce(trial):
    reseed("test_fuzz_wide_qreduce", trial)
    from qublas_tpu.qtensor import from_raw

    fa = rand_wide_fmt()
    n = int(rng.randint(1, 16))
    nlayers = rng.randint(0, 3)
    layers = tuple((rand_wide_fmt() if rng.randint(0, 2) else rand_fmt())
                   for _ in range(nlayers))
    raws = rand_raws(fa, n)
    dev = qreduce(from_raw(raws, fa), layers)
    want, wf = hostops.qreduce_list([(int(v), fa) for v in raws], layers)
    assert int(np.asarray(dev.raw(), dtype=object)) == want, (fa, layers, n)
    assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(8, 4)))
def test_fuzz_wide_qcast(trial):
    reseed("test_fuzz_wide_qcast", trial)
    from qublas_tpu.qtensor import from_raw

    fa = rand_wide_fmt()
    to = rand_wide_fmt() if rng.randint(0, 2) else rand_fmt()
    raws = rand_raws(fa, 24)
    dev = ew.qcast(from_raw(raws, fa), to)
    for x, g in zip(raws, np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.convert((int(x), fa), to)
        assert int(g) == want, (fa, to, int(x), int(g), want)


def test_wide_formats_are_device_resident():
    """The round-2 contract: 33..64-bit-storage tensors live on device as
    limb pairs, not host object arrays (VERDICT missing item 1)."""
    from qublas_tpu.qtensor import from_raw

    for trial in range(20):
        reseed("test_wide_formats_are_device_resident", trial)
        fa = rand_wide_fmt()
        t = from_raw(rand_raws(fa, 8), fa)
        assert t.is_pair and not t.is_host, fa


@pytest.mark.parametrize("trial", range(depthctl.trials(16, 6)))
def test_fuzz_wide_complex_mul(trial):
    """Complex multiplies whose parts / step formats land on the 33..64-bit
    pair-storage routes (round-2 device coverage)."""
    reseed("test_fuzz_wide_complex_mul", trial)
    from qublas_tpu import hostops
    from qublas_tpu.complex import cmul, cmul_tf, complex_from_raw

    def some_fmt():
        return rand_wide_fmt() if rng.randint(0, 2) else rand_fmt(14)

    fr, fi = some_fmt(), some_fmt()
    algo = "tf" if rng.randint(0, 2) else "basic"
    names = (("ab", "cd", "ba", "abc", "cdb", "bad", "AB", "BC")
             if algo == "tf" else
             ("ac", "bd", "ad", "bc", "acbd", "adbc"))
    kw = {n: (some_fmt() if rng.randint(0, 2) else None) for n in names}
    n = 8
    a = complex_from_raw(rand_raws(fr, n), rand_raws(fi, n), fr, fi)
    b = complex_from_raw(rand_raws(fr, n), rand_raws(fi, n), fr, fi)
    dev = (cmul_tf if algo == "tf" else cmul)(a, b, **kw)
    host_fn = (hostops.complex_mul_tf if algo == "tf"
               else hostops.complex_mul_basic)
    ar = np.asarray(a.real.raw(), dtype=object)
    ai = np.asarray(a.imag.raw(), dtype=object)
    br = np.asarray(b.real.raw(), dtype=object)
    bi = np.asarray(b.imag.raw(), dtype=object)
    dr = np.asarray(dev.real.raw(), dtype=object)
    di = np.asarray(dev.imag.raw(), dtype=object)
    for i in range(n):
        hp = host_fn(((int(ar[i]), fr), (int(ai[i]), fi)),
                     ((int(br[i]), fr), (int(bi[i]), fi)), **kw)
        assert int(dr[i]) == hp[0][0], (algo, fr, fi, kw, i)
        assert int(di[i]) == hp[1][0], (algo, fr, fi, kw, i)
