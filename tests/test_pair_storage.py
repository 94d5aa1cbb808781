"""Device (hi, lo) limb-pair storage for 33..64-bit formats.

Round-2 feature (VERDICT item 2): formats whose physical storage is wider
than one int32 lane but fits two 32-bit limbs stay device-resident as a
:class:`qublas_tpu.ops.wideint.PairArray` instead of falling off onto
host-side Python-int loops.  The reference runs these widths in compiled
multiword ``ArbiInt`` code (QuBLAS.h:566-912; its tests use formats up to
``intBits<70>, fracBits<70>``); parity here = bit-identity with the host
golden model on every route.
"""

import numpy as np
import pytest

from qublas_tpu import hostops
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.ops.reduce import qreduce
from qublas_tpu.ops.wideint import PairArray
from qublas_tpu.ops.widths import storage_kind
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat
from qublas_tpu.qtensor import QTensor, from_raw, random_fill, zeros

F40 = qformat(30, 9)            # storage 40
F33 = qformat(16, 16)           # storage 33 (full-prec (8,8) product)
F64 = qformat(33, 30)           # storage 64


def rand_wide(fmt, n, seed=0):
    rng = np.random.RandomState(seed)
    lo = max(fmt.raw_min, -(1 << 62))
    hi = min(fmt.raw_max, (1 << 62) - 1)
    vals = [int(rng.randint(-(1 << 31), 1 << 31))
            * int(rng.randint(0, 1 << 20)) for _ in range(n)]
    return np.array([max(lo, min(hi, v)) for v in vals], dtype=object)


def test_storage_kind_boundaries():
    assert storage_kind(qformat(23, 8)) == "lane"      # 32
    assert storage_kind(qformat(24, 8)) == "pair"      # 33
    assert storage_kind(qformat(33, 30)) == "pair"     # 64
    assert storage_kind(qformat(34, 30)) == "limb"     # 65
    assert storage_kind(qformat(200, 55)) == "limb"    # 256
    assert storage_kind(qformat(201, 55)) == "limb"    # 257 (round 3)
    assert storage_kind(qformat(300, 83)) == "limb"    # 384
    assert storage_kind(qformat(300, 84)) == "limb"    # 385 (round 4)
    assert storage_kind(qformat(600, 391)) == "limb"   # 992
    assert storage_kind(qformat(600, 392)) is None     # 993: host
    # WRP_TCPL_SAT wraps at the machine word: pair up to 64
    w = qformat(40, 8, overflow_mode=OverflowMode.WRP_TCPL_SAT)
    assert storage_kind(w) == "pair"


def test_from_raw_pair_round_trip():
    raws = rand_wide(F40, 64)
    t = from_raw(raws, F40)
    assert t.is_pair and not t.is_host
    assert isinstance(t.data, PairArray)
    np.testing.assert_array_equal(
        t.raw(), np.array([int(v) for v in raws], dtype=np.int64))


def test_from_raw_pair_extremes():
    f = F64
    raws = np.array([f.raw_min, f.raw_max, 0, -1, 1,
                     -(1 << 62), (1 << 62) - 1], dtype=object)
    t = from_raw(raws, f)
    assert t.is_pair
    np.testing.assert_array_equal(
        t.raw(), np.array([int(v) for v in raws], dtype=np.int64))


def test_zeros_and_getitem_and_shuffle():
    z = zeros((4, 6), F40)
    assert z.is_pair and z.shape == (4, 6)
    assert int(z.raw().sum()) == 0
    s = z[1:3, ::2]
    assert s.shape == (2, 3) and s.is_pair
    t = from_raw(rand_wide(F40, 12).reshape(3, 4), F40)
    sh = t.shuffle(seed=7)
    assert sorted(int(v) for v in sh.raw().reshape(-1)) == \
        sorted(int(v) for v in t.raw().reshape(-1))


def test_random_fill_pair_resident():
    t = random_fill((8,), F40, seed=3)
    assert t.is_pair
    assert all(F40.raw_min <= int(v) <= F40.raw_max for v in t.raw())


@pytest.mark.parametrize("op", ["qadd", "qsub", "qmul"])
def test_wide_binary_vs_host(op):
    a_raws = rand_wide(F40, 32, seed=1)
    b_raws = rand_wide(F40, 32, seed=2)
    a, b = from_raw(a_raws, F40), from_raw(b_raws, F40)
    to = qformat(44, 12) if op != "qmul" else qformat(35, 6)
    dev = getattr(ew, op)(a, b, to=to)
    assert dev.is_pair
    host_fn = getattr(hostops, op)
    for x, y, g in zip(a_raws, b_raws, dev.raw()):
        want, wf = host_fn((int(x), F40), (int(y), F40), to=to)
        assert int(g) == want
        assert dev.fmt == wf


def test_wide_mul_wide_by_lane():
    """pair x lane product staying within 64 bits runs on device."""
    small = qformat(3, 4)
    a = from_raw(rand_wide(F40, 16, seed=4), F40)
    b = from_raw(np.arange(-8, 8), small)
    out = qformat(40, 10)
    dev = ew.qmul(a, b, to=out)
    assert dev.is_pair
    for x, y, g in zip(a.raw(), b.raw(), dev.raw()):
        want, _ = hostops.qmul((int(x), F40), (int(y), small), to=out)
        assert int(g) == want


def test_wide_mul_overflowing_product_goes_host_exact():
    """pair x pair whose product can exceed 64 bits must still be exact
    (host route)."""
    a = from_raw([F40.raw_max, F40.raw_min], F40)
    b = from_raw([F40.raw_max, F40.raw_max], F40)
    out = qformat(62, 0)
    dev = ew.qmul(a, b, to=out)
    for x, y, g in zip(a.raw(), b.raw(),
                       np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.qmul((int(x), F40), (int(y), F40), to=out)
        assert int(g) == want


@pytest.mark.parametrize("rm", list(RoundMode))
@pytest.mark.parametrize("om", list(OverflowMode))
def test_wide_cast_all_modes(rm, om):
    """requantize pair->lane and pair->pair across every mode combo."""
    raws = np.array([0, 1, -1, 3, -3, (1 << 38) + 5, -(1 << 38) - 5,
                     F40.raw_max, F40.raw_min, (3 << (9 - 1)),  # exact tie
                     -(3 << (9 - 1)), (1 << 20) - 1], dtype=object)
    a = from_raw(raws, F40)
    assert a.is_pair
    for tgt in (qformat(6, 4, round_mode=rm, overflow_mode=om),
                qformat(20, 4, round_mode=rm, overflow_mode=om),
                qformat(38, 4, round_mode=rm, overflow_mode=om),
                qformat(44, 12, round_mode=rm, overflow_mode=om),
                qformat(36, 4, signed=False, round_mode=rm,
                        overflow_mode=om)):
        dev = ew.qcast(a, tgt)
        got = np.asarray(dev.raw(), dtype=object).reshape(-1)
        for x, g in zip(raws, got):
            want, _ = hostops.convert((int(x), F40), tgt)
            assert int(g) == want, (rm, om, tgt, int(x), int(g), want)


def test_wide_neg_abs_cmp_eq():
    raws = rand_wide(F40, 24, seed=5)
    a = from_raw(raws, F40)
    n = ew.qneg(a)
    assert n.is_pair
    for x, g in zip(raws, n.raw()):
        want, wf = hostops.qneg((int(x), F40))
        assert int(g) == want and n.fmt == wf
    ab = ew.qabs(a)
    for x, g in zip(raws, ab.raw()):
        want, wf = hostops.qabs((int(x), F40))
        assert int(g) == want and ab.fmt == wf
    b = from_raw(rand_wide(F40, 24, seed=6), F40)
    c = ew.qcmp(a, b)
    e = ew.qeq(a, b)
    for x, y, gc, ge in zip(raws, b.raw(), np.asarray(c).reshape(-1),
                            np.asarray(e).reshape(-1)):
        assert int(gc) == hostops.qcmp((int(x), F40), (int(y), F40))
        assert bool(ge) == hostops.qeq((int(x), F40), (int(y), F40))


def test_wide_mixed_cmp_with_lane():
    lane = qformat(10, 4)
    a = from_raw(rand_wide(F40, 8, seed=7), F40)
    b = from_raw(np.arange(-4, 4) * 100, lane)
    c = ew.qcmp(a, b)
    for x, y, g in zip(a.raw(), b.raw(), np.asarray(c).reshape(-1)):
        assert int(g) == hostops.qcmp((int(x), F40), (int(y), lane))


def test_wide_reduce_vs_host():
    raws = rand_wide(F40, 21, seed=8)  # odd count exercises tail rule
    layers = (qformat(42, 8), qformat(45, 6, round_mode=RoundMode.RND_CONV))
    dev = qreduce(from_raw(raws, F40), layers)
    want, wf = hostops.qreduce_list([(int(v), F40) for v in raws], layers)
    assert int(np.asarray(dev.raw(), dtype=object)) == want
    assert dev.fmt == wf


def test_wide_gemm_layered_vs_host():
    m, k, n = 3, 5, 2
    fa, fb = F40, qformat(28, 4)
    A = rand_wide(fa, m * k, seed=9).reshape(m, k)
    B = rand_wide(fb, k * n, seed=10).reshape(k, n)
    out = qformat(30, 4, overflow_mode=OverflowMode.SAT_ZERO)
    mul_to = qformat(50, 10)
    layers = (qformat(52, 10),)
    dev = qgemul(from_raw(A, fa), from_raw(B, fb), out, mul_to=mul_to,
                 add_formats=layers)
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    host = hostops.qgemul(ar, br, out, mul_to, layers)
    got = np.asarray(dev.raw(), dtype=object)
    for i in range(m):
        for j in range(n):
            assert int(got[i, j]) == host[i][j][0]


def test_wide_jit_and_vmap():
    import jax

    raws = rand_wide(F40, 32, seed=11)
    a = from_raw(raws, F40)
    b = from_raw(rand_wide(F40, 32, seed=12), F40)
    to = qformat(44, 12)

    @jax.jit
    def f(x, y):
        return ew.qadd(x, y, to=to)

    eager = ew.qadd(a, b, to=to)
    jitted = f(a, b)
    np.testing.assert_array_equal(np.asarray(jitted.raw()),
                                  np.asarray(eager.raw()))

    a2 = from_raw(rand_wide(F40, 32, seed=13).reshape(4, 8), F40)
    b2 = from_raw(rand_wide(F40, 32, seed=14).reshape(4, 8), F40)
    vm = jax.vmap(lambda x, y: ew.qadd(x, y, to=to))(a2, b2)
    ref = ew.qadd(a2, b2, to=to)
    np.testing.assert_array_equal(np.asarray(vm.raw()),
                                  np.asarray(ref.raw()))


def test_wrp_sat_pair_machine_word_wrap():
    """WRP_TCPL_SAT (identity stub) with 33..64-bit storage wraps at the
    64-bit machine word — matches the reference's int64-word ArbiInt store
    (probed behavior, REFERENCE_DEFECTS)."""
    f = qformat(40, 8, overflow_mode=OverflowMode.WRP_TCPL_SAT)
    src = qformat(60, 8)
    raws = np.array([(1 << 58) + 12345, -(1 << 58) - 77, 99], dtype=object)
    a = from_raw(raws, src)
    dev = ew.qcast(a, f)
    assert dev.is_pair
    for x, g in zip(raws, dev.raw()):
        want, _ = hostops.convert((int(x), src), f)
        assert int(g) == want


def test_wide_div_host_route_exact():
    a = from_raw(rand_wide(F40, 8, seed=15), F40)
    b = from_raw([3, -7, 11, 1, 5, -2, 9, 0], qformat(10, 2))
    out = qformat(35, 4)
    dev = ew.qdiv(a, b, to=out)
    for x, y, g in zip(a.raw(), b.raw(),
                       np.asarray(dev.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.qdiv((int(x), F40), (int(y), qformat(10, 2)),
                               to=out)
        assert int(g) == want


def test_checkpoint_pair_round_trip(tmp_path):
    from qublas_tpu import checkpoint

    t = from_raw(rand_wide(F64, 10, seed=16), F64)
    p = str(tmp_path / "wide.npz")
    checkpoint.save(p, {"w": t})
    back = checkpoint.load(p)["w"]
    assert back.is_pair
    np.testing.assert_array_equal(back.raw(), t.raw())
    assert back.fmt == t.fmt


def test_bitstream_pair_round_trip():
    from qublas_tpu import bitstream

    t = from_raw(rand_wide(F40, 6, seed=17), F40)
    bits = bitstream.to_bits(t)
    back = bitstream.from_bits(bits, F40, t.shape, twos_complement=True)
    np.testing.assert_array_equal(np.asarray(back.raw(), dtype=np.int64),
                                  t.raw())
