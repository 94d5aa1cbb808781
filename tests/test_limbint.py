"""Differential coverage for 65..256-bit device limb storage (ops/limbint.py).

The reference runs any ``ArbiInt`` width in compiled code (QuBLAS.h:566-912;
its generated test grids go to 200-bit formats).  Round 2 makes formats with
65..256-bit physical storage device-resident as stacked (K, ...) uint32 limbs;
this file pins the limb primitives to Python-int arithmetic and the public ops
to the host golden model, across random widths, modes and storage-kind mixes.
"""

import numpy as np
import pytest

import depthctl

from qublas_tpu import hostops
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops import limbint as L
from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.ops.reduce import qreduce
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat
from qublas_tpu.qtensor import QTensor, from_raw

rng = np.random.RandomState(0)


def reseed(name: str, trial: int):
    global rng
    import zlib

    rng = np.random.RandomState(
        zlib.crc32(f"{name}:{trial}".encode()) % (2**31))


def rand_limb_fmt(max_storage=256):
    """Format with 65..max_storage-bit physical storage (device limbs)."""
    while True:
        i = int(rng.randint(-6, max_storage))
        f = int(rng.randint(-6, max_storage))
        if 64 <= i + f <= max_storage - 1:
            break
    fmt = qformat(i, f, bool(rng.randint(0, 2)),
                  RoundMode(rng.randint(0, 7)),
                  OverflowMode(rng.randint(0, 5)))
    if fmt.storage_bits > max_storage or fmt.storage_bits < 65:
        return rand_limb_fmt(max_storage)
    return fmt


def rand_narrow_fmt(max_total=24):
    while True:
        i = int(rng.randint(-6, 20))
        f = int(rng.randint(-6, 20))
        if 0 <= i + f <= max_total:
            break
    return qformat(i, f, bool(rng.randint(0, 2)),
                   RoundMode(rng.randint(0, 7)),
                   OverflowMode(rng.randint(0, 5)))


def rand_raws(fmt, n):
    """Full-range raws (beyond int64) composed from 32-bit draws."""
    span = fmt.raw_max - fmt.raw_min + 1
    words = (int(span).bit_length() + 95) // 32
    out = []
    for _ in range(n):
        v = 0
        for _w in range(words):
            v = (v << 32) | int(rng.randint(0, 1 << 32, dtype=np.int64))
        out.append(fmt.raw_min + (v % span))
    return np.array(out, dtype=object)


def rand_ints(bits, n):
    """Random signed ints spanning the full ``bits``-bit two's-complement
    range, biased toward structure (powers, near-boundary)."""
    out = []
    for _ in range(n):
        kind = rng.randint(0, 5)
        if kind == 0:
            out.append(0)
        elif kind == 1:
            out.append((1 << (bits - 1)) - 1 - int(rng.randint(0, 3)))
        elif kind == 2:
            out.append(-(1 << (bits - 1)) + int(rng.randint(0, 3)))
        else:
            v = 0
            for _w in range((bits + 31) // 32):
                v = (v << 32) | int(rng.randint(0, 1 << 32, dtype=np.int64))
            v &= (1 << bits) - 1
            if v >= 1 << (bits - 1):
                v -= 1 << bits
            out.append(v)
    return out


# ---------------------------------------------------------------------------
# Primitive layer: limb arithmetic vs Python ints
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("K", [3, 4, 5, 8])
def test_limb_primitives_match_python(K):
    reseed("prim", K)
    bits = 32 * K
    mask = (1 << bits) - 1

    def wrap(v):
        v &= mask
        return v - (1 << bits) if v >= 1 << (bits - 1) else v

    n = 64
    avals = rand_ints(bits, n)
    bvals = rand_ints(bits, n)
    a = L.limbs_from_ints(np.array(avals, dtype=object), K)
    b = L.limbs_from_ints(np.array(bvals, dtype=object), K)

    # round trip
    assert [int(v) for v in L.ints_from_limbs(a)] == avals

    checks = {
        "add": (L.ladd(a, b), [wrap(x + y) for x, y in zip(avals, bvals)]),
        "sub": (L.lsub(a, b), [wrap(x - y) for x, y in zip(avals, bvals)]),
        "neg": (L.lneg(a), [wrap(-x) for x in avals]),
        "mul": (L.lmul(a, b, K),
                [wrap(x * y) for x, y in zip(avals, bvals)]),
    }
    for name, (got, want) in checks.items():
        got_i = [int(v) for v in L.ints_from_limbs(got)]
        assert got_i == want, (name, K)

    for d in (0, 1, 31, 32, 33, 32 * K - 1):
        got = [int(v) for v in L.ints_from_limbs(L.lshl(a, d))]
        assert got == [wrap(x << d) for x in avals], ("shl", d, K)
        got = [int(v) for v in L.ints_from_limbs(L.lshr(a, d))]
        assert got == [x >> d for x in avals], ("shr", d, K)
        got = [int(v) for v in L.ints_from_limbs(L.llow_bits(a, d))]
        # llow_bits yields the masked low bits as a (possibly negative when
        # bit d-1..top set) two's-complement limb value; compare mod 2^bits
        want = [(x & ((1 << d) - 1)) & mask for x in avals]
        assert [g & mask for g in got] == want, ("low_bits", d, K)

    lt = np.asarray(L.llt(a, b))
    eq = np.asarray(L.leq(a, b))
    isn = np.asarray(L.lis_neg(a))
    isp = np.asarray(L.lis_pos(a))
    for i in range(n):
        assert bool(lt[i]) == (avals[i] < bvals[i])
        assert bool(eq[i]) == (avals[i] == bvals[i])
        assert bool(isn[i]) == (avals[i] < 0)
        assert bool(isp[i]) == (avals[i] > 0)

    # sign-extension to a wider working width preserves the value
    wide = L.lext(a, K + 3)
    assert [int(v) for v in L.ints_from_limbs(wide)] == avals


def test_lconst_and_select():
    for c in (0, 1, -1, (1 << 100) - 7, -(1 << 150)):
        arr = L.lconst(c, 6, (4,))
        assert [int(v) for v in L.ints_from_limbs(arr)] == [c] * 4
    a = L.lconst(5, 3, (4,))
    b = L.lconst(-9, 3, (4,))
    cond = np.array([True, False, True, False])
    import jax.numpy as jnp

    got = [int(v) for v in L.ints_from_limbs(L.lselect(jnp.asarray(cond),
                                                       a, b))]
    assert got == [5, -9, 5, -9]


# ---------------------------------------------------------------------------
# Storage contract
# ---------------------------------------------------------------------------

def test_limb_formats_are_device_resident():
    for trial in range(20):
        reseed("resident", trial)
        fa = rand_limb_fmt()
        raws = rand_raws(fa, 8)
        t = from_raw(raws, fa)
        assert t.is_limb and not t.is_host, fa
        # raws round-trip bit-for-bit through the device storage
        back = [int(v) for v in np.asarray(t.raw(), dtype=object).reshape(-1)]
        assert back == [int(v) for v in raws], fa
    # >992-bit storage falls back to host object arrays (the device limb
    # cap rose 256 -> 384 -> 992 across rounds 3-4; per-op width proofs
    # now route individual ops, not a global storage guarantee)
    f = qformat(920, 80)   # 1001-bit storage
    t = from_raw(np.array([1, -2], dtype=object), f)
    assert t.is_host
    f2 = qformat(420, 80)  # 501-bit storage: device-resident since round 4
    t2 = from_raw(np.array([1, -2], dtype=object), f2)
    assert t2.is_limb and not t2.is_host


def test_limb_raw_round_trip_exact():
    reseed("roundtrip", 0)
    fa = rand_limb_fmt()
    raws = rand_raws(fa, 33)
    t = from_raw(raws, fa)
    got = [int(v) for v in np.asarray(t.raw(), dtype=object).reshape(-1)]
    assert got == [int(v) for v in raws]


# ---------------------------------------------------------------------------
# Public elementwise ops vs the host golden model
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("trial", range(depthctl.trials(40, 16)))
def test_fuzz_limb_binary_ops(trial):
    reseed("limb_binary", trial)
    fa = rand_limb_fmt(200)
    pick = rng.randint(0, 3)
    fb = (rand_limb_fmt(200) if pick == 0
          else rand_narrow_fmt() if pick == 1
          else rand_limb_fmt(64 + 60))  # mixes pair-width neighbours too
    if rng.randint(0, 2):
        fa, fb = fb, fa
    to = None if rng.randint(0, 3) == 0 else (
        rand_limb_fmt(220) if rng.randint(0, 2) else rand_narrow_fmt())
    op = ["qmul", "qadd", "qsub"][rng.randint(0, 3)]
    n = 12
    a_raws, b_raws = rand_raws(fa, n), rand_raws(fb, n)
    a, b = from_raw(a_raws, fa), from_raw(b_raws, fb)
    dev = getattr(ew, op)(a, b, to=to)
    host_fn = getattr(hostops, op)
    for x, y, g in zip(a_raws, b_raws,
                       np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, wf = host_fn((int(x), fa), (int(y), fb), to=to)
        assert int(g) == want, (op, fa, fb, to, int(x), int(y), int(g), want)
        assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(16, 8)))
def test_fuzz_limb_qcast(trial):
    reseed("limb_cast", trial)
    fa = rand_limb_fmt()
    pick = rng.randint(0, 3)
    to = (rand_limb_fmt() if pick == 0 else rand_narrow_fmt() if pick == 1
          else rand_limb_fmt(64 + 50))
    if rng.randint(0, 3) == 0:
        fa, to = to, fa  # narrow/pair source into a limb destination
    raws = rand_raws(fa, 24)
    dev = ew.qcast(from_raw(raws, fa), to)
    for x, g in zip(raws, np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.convert((int(x), fa), to)
        assert int(g) == want, (fa, to, int(x), int(g), want)


@pytest.mark.parametrize("trial", range(depthctl.trials(10, 5)))
def test_fuzz_limb_unary_and_compare(trial):
    reseed("limb_unary", trial)
    fa = rand_limb_fmt()
    raws = rand_raws(fa, 16)
    a = from_raw(raws, fa)
    for name in ("qabs", "qneg"):
        dev = getattr(ew, name)(a)
        for x, g in zip(raws,
                        np.asarray(dev.raw(), dtype=object).reshape(-1)):
            want, wf = getattr(hostops, name)((int(x), fa))
            assert int(g) == want, (name, fa, int(x))
            assert dev.fmt == wf
    fb = rand_limb_fmt() if rng.randint(0, 2) else rand_narrow_fmt()
    b_raws = rand_raws(fb, 16)
    b = from_raw(b_raws, fb)
    cmp_dev = np.asarray(ew.qcmp(a, b))
    eq_dev = np.asarray(ew.qeq(a, b))
    for i, (x, y) in enumerate(zip(raws, b_raws)):
        va = int(x) / (2.0 ** 0)  # compare in the aligned raw domain:
        # qcmp semantics = value comparison; mirror via host alignment
        f = max(fa.frac_bits, fb.frac_bits)
        xa = int(x) << (f - fa.frac_bits)
        yb = int(y) << (f - fb.frac_bits)
        want = (xa > yb) - (xa < yb)
        assert int(cmp_dev[i]) == want, (fa, fb, int(x), int(y))
        assert bool(eq_dev[i]) == (xa == yb)


@pytest.mark.parametrize("trial", range(depthctl.trials(12, 6)))
def test_fuzz_limb_qreduce(trial):
    reseed("limb_reduce", trial)
    pick = rng.randint(0, 2)
    fa = rand_limb_fmt(150) if pick else rand_narrow_fmt()
    n = int(rng.randint(1, 14))
    nlayers = rng.randint(0, 3)
    layers = tuple((rand_limb_fmt(200) if rng.randint(0, 2)
                    else rand_narrow_fmt())
                   for _ in range(nlayers))
    raws = rand_raws(fa, n)
    dev = qreduce(from_raw(raws, fa), layers)
    want, wf = hostops.qreduce_list([(int(v), fa) for v in raws], layers)
    assert int(np.asarray(dev.raw(), dtype=object)) == want, (fa, layers, n)
    assert dev.fmt == wf


@pytest.mark.parametrize("trial", range(depthctl.trials(6, 3)))
def test_fuzz_limb_gemm(trial):
    reseed("limb_gemm", trial)
    fa = rand_limb_fmt(120)
    fb = rand_narrow_fmt() if rng.randint(0, 2) else rand_limb_fmt(100)
    mul_to = rand_limb_fmt(230)
    out = rand_limb_fmt(200) if rng.randint(0, 2) else rand_narrow_fmt()
    addf = (rand_limb_fmt(240),) if rng.randint(0, 2) else ()
    m, k, n = 2, int(rng.randint(1, 6)), 2
    A = rand_raws(fa, m * k).reshape(m, k)
    B = rand_raws(fb, k * n).reshape(k, n)
    dev = qgemul(from_raw(A, fa), from_raw(B, fb), out, mul_to=mul_to,
                 add_formats=addf)
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    host = hostops.qgemul(ar, br, out, mul_to, addf)
    g = np.asarray(dev.raw(), dtype=object)
    for i in range(m):
        for j in range(n):
            assert int(g[i, j]) == host[i][j][0], (fa, fb, mul_to, out, addf)


# ---------------------------------------------------------------------------
# Transform compatibility: the limb ops must live inside jit
# ---------------------------------------------------------------------------

def test_limb_ops_inside_jit():
    import jax

    reseed("limb_jit", 0)
    fa = qformat(80, 40)
    fb = qformat(70, 20)
    to = qformat(90, 30)
    a = from_raw(rand_raws(fa, 8), fa)
    b = from_raw(rand_raws(fb, 8), fb)

    def f(x, y):
        return ew.qmul(QTensor(x, fa), QTensor(y, fb), to=to).data

    eager = ew.qmul(a, b, to=to)
    jitted = QTensor(jax.jit(f)(a.data, b.data), to)
    assert [int(v) for v in np.asarray(jitted.raw(),
                                       dtype=object).reshape(-1)] == \
        [int(v) for v in np.asarray(eager.raw(), dtype=object).reshape(-1)]


def test_limb_tensor_utilities():
    """Slicing, shuffle, to_double, display, checkpoint-facing raw()."""
    reseed("limb_util", 0)
    fa = qformat(80, 40)
    raws = rand_raws(fa, 12)
    t = from_raw(raws.reshape(3, 4), fa)
    # slicing
    s = t[1:3, ::2]
    assert s.shape == (2, 2) and s.is_limb
    want = np.asarray(raws, dtype=object).reshape(3, 4)[1:3, ::2]
    got = np.asarray(s.raw(), dtype=object)
    assert [int(v) for v in got.reshape(-1)] == \
        [int(v) for v in want.reshape(-1)]
    # shuffle keeps the multiset of raws
    sh = t.shuffle(seed=7)
    assert sorted(int(v) for v in
                  np.asarray(sh.raw(), dtype=object).reshape(-1)) == \
        sorted(int(v) for v in raws)
    # to_double matches raw / 2^frac
    d = t.to_double()
    for v, x in zip(d.reshape(-1), raws):
        assert v == float(int(x)) * 2.0 ** -fa.frac_bits


@pytest.mark.parametrize("trial", range(depthctl.trials(10, 5)))
def test_fuzz_limb_complex_mul(trial):
    """Complex multiplies whose parts / step formats land on the 65..256-bit
    limb routes."""
    reseed("limb_cmul", trial)
    from qublas_tpu.complex import cmul, cmul_tf, complex_from_raw

    def some_fmt():
        return rand_limb_fmt(140) if rng.randint(0, 2) else rand_narrow_fmt()

    fr, fi = some_fmt(), some_fmt()
    algo = "tf" if rng.randint(0, 2) else "basic"
    names = (("ab", "cd", "ba", "abc", "cdb", "bad", "AB", "BC")
             if algo == "tf" else
             ("ac", "bd", "ad", "bc", "acbd", "adbc"))
    kw = {n: (some_fmt() if rng.randint(0, 2) else None) for n in names}
    n = 6
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


# ---------------------------------------------------------------------------
# Sharded execution of wide (pair/limb) GEMMs on the virtual mesh
# ---------------------------------------------------------------------------

def _mesh_or_skip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from qublas_tpu.parallel import make_mesh

    return make_mesh(dp=2, tp=4)


def test_sharded_mn_gemm_limb_operands():
    # 3-limb formats: shard_map compile cost grows with the unrolled
    # K^2 limb products, so keep the working width minimal here (deep
    # widths are swept by the unsharded fuzz above)
    mesh = _mesh_or_skip()
    from qublas_tpu.parallel import sharded_qgemul_mn

    reseed("shard_mn_limb", 0)
    fa = qformat(40, 28)       # 69-bit: 3 limbs
    fb = qformat(8, 8)
    out = qformat(50, 30, True, RoundMode.RND_CONV,
                  OverflowMode.SAT_TCPL)    # 81-bit: 3 limbs
    m, k, n = 4, 6, 8
    A = rand_raws(fa, m * k).reshape(m, k)
    B = rand_raws(fb, k * n).reshape(k, n)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    mul_to = qformat(48, 40)   # 89-bit product format
    got = sharded_qgemul_mn(ta, tb, out, mesh, mul_to=mul_to)
    ref = qgemul(ta, tb, out, mul_to=mul_to)
    assert got.fmt == ref.fmt
    g = np.asarray(got.raw(), dtype=object)
    w = np.asarray(ref.raw(), dtype=object)
    assert [int(v) for v in g.reshape(-1)] == [int(v) for v in w.reshape(-1)]


def test_sharded_dp_gemm_limb_operands():
    mesh = _mesh_or_skip()
    from qublas_tpu.parallel import sharded_qgemul_dp

    reseed("shard_dp_limb", 0)
    fa = qformat(40, 30)       # 71-bit: 3-limb operand
    fb = qformat(8, 8)
    out = qformat(50, 20)      # 71-bit: 3-limb output
    batch, m, k, n = 8, 2, 3, 4
    A = rand_raws(fa, batch * m * k).reshape(batch, m, k)
    B = rand_raws(fb, k * n).reshape(k, n)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    got = sharded_qgemul_dp(ta, tb, out, mesh)
    ref = qgemul(ta, tb, out)
    g = np.asarray(got.raw(), dtype=object)
    w = np.asarray(ref.raw(), dtype=object)
    assert g.shape == w.shape == (batch, m, n)
    assert [int(v) for v in g.reshape(-1)] == [int(v) for v in w.reshape(-1)]


def test_sharded_mn_gemm_host_route_raises():
    mesh = _mesh_or_skip()
    from qublas_tpu.parallel import sharded_qgemul_mn

    fa = qformat(500, 99)      # 600-bit storage: limb, but the product
    fb = qformat(500, 99)      # work (~1200 bits) outgrows the envelope
    A = from_raw(np.ones((4, 4), dtype=object), fa)
    B = from_raw(np.ones((4, 8), dtype=object), fb)
    with pytest.raises(ValueError):
        sharded_qgemul_mn(A, B, qformat(500, 99), mesh,
                          mul_to=qformat(1010, 198))


def test_shard_qgemul_auto_wide_picks_mn():
    """Auto strategy must not route wide (non-int32) configs to K."""
    mesh = _mesh_or_skip()
    from qublas_tpu.parallel import shard_qgemul

    reseed("shard_auto_wide", 0)
    fa = qformat(40, 30)       # 3-limb operand
    fb = qformat(8, 8)
    out = qformat(50, 30)      # 3-limb output
    A = from_raw(rand_raws(fa, 4 * 8).reshape(4, 8), fa)
    B = from_raw(rand_raws(fb, 8 * 4).reshape(8, 4), fb)
    got = shard_qgemul(A, B, out, mesh, mul_to=qformat(48, 40))
    ref = qgemul(A, B, out, mul_to=qformat(48, 40))
    g = np.asarray(got.raw(), dtype=object)
    w = np.asarray(ref.raw(), dtype=object)
    assert [int(v) for v in g.reshape(-1)] == [int(v) for v in w.reshape(-1)]
