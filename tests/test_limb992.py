"""Device limb storage extended to 992 bits via per-op width proofs
(round 4, VERDICT r3 item 9 / missing-3).

Rounds 2-3 capped device storage at 256/384 bits so that EVERY binary op
provably fit the 1024-bit working envelope globally.  Round 4 drops the
global guarantee: storage up to 992 bits is device-resident, and each op's
own exact interval proof (``route_mul`` / ``route_addsub`` /
``requant_work_bits``) decides device vs host per config — a 512-bit add or
cast runs on stacked uint32 limbs, while a 512x512-bit product (~1026
working bits) routes to the compiled host engine.  Matches the reference's
arbitrary ``ArbiInt<N>`` instantiability (QuBLAS.h:566-912) far past its
own 200-bit test grids.  Oracle: the exact host golden model.
"""

import random

import numpy as np
import pytest

import depthctl

from qublas_tpu import from_raw, hostint, hostops, qformat
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops.widths import (LIMB_STORE_MAX_BITS, route_addsub,
                                   route_mul, storage_kind)
from qublas_tpu.qformat import OverflowMode, RoundMode, add_merge


def rand_raws(fmt, n, seed):
    rng = random.Random(f"l992:{seed}:{fmt.storage_bits}")
    vals = [0, 1, -1, fmt.raw_max, fmt.raw_min]
    vals += [rng.randint(fmt.raw_min, fmt.raw_max) for _ in range(n - 5)]
    return np.array(vals[:n], dtype=object)


F512 = qformat(312, 199)        # exactly 512-bit storage (16 limbs)
F992 = qformat(600, 391)        # exactly 992-bit storage (31 limbs)


def test_envelope_and_storage_kinds():
    assert LIMB_STORE_MAX_BITS == 992
    assert storage_kind(F512) == "limb"
    assert storage_kind(F992) == "limb"
    assert storage_kind(qformat(600, 392)) is None   # 993: host
    t = from_raw(rand_raws(F992, 6, 0), F992)
    assert t.is_limb and t.data.nlimbs == 31
    raws = rand_raws(F512, 8, 1)
    back = from_raw(raws, F512).raw()
    assert [int(v) for v in back] == [int(v) for v in raws]


def test_per_op_routes_split_device_vs_host():
    """The per-op proofs, not a storage cap, pick the route: a 512-bit add
    stays on device limbs; a 512x512 product outgrows the 1024-bit working
    envelope and routes host."""
    out_a = qformat(320, 199, overflow_mode=OverflowMode.SAT_TCPL)
    r, *_ = route_addsub(F512, F512, out_a, sub=False)
    assert r == "limb"
    out_m = qformat(640, 398)
    r, *_ = route_mul(F512, F512, out_m)
    assert r == "host"
    # a 512 x narrow product fits the envelope -> device
    r, *_ = route_mul(F512, qformat(10, 4), qformat(330, 203))
    assert r == "limb"


def test_add_512_vs_oracle():
    out = qformat(320, 199, round_mode=RoundMode.RND_CONV,
                  overflow_mode=OverflowMode.SAT_ZERO)
    A = rand_raws(F512, 12, 2)
    B = rand_raws(F512, 12, 3)
    ta, tb = from_raw(A, F512), from_raw(B, F512)
    assert ta.is_limb
    got = ew.qadd(ta, tb, to=out)
    assert got.is_limb
    g = np.asarray(got.raw(), dtype=object)
    for x, y, r in zip(A, B, g.reshape(-1)):
        want, _ = hostops.qadd((int(x), F512), (int(y), F512), to=out)
        assert int(r) == want


def test_mul_512_by_narrow_vs_oracle():
    fb = qformat(10, 4)
    out = qformat(330, 203, overflow_mode=OverflowMode.SAT_TCPL)
    A = rand_raws(F512, 10, 4)
    B = rand_raws(fb, 10, 5)
    got = ew.qmul(from_raw(A, F512), from_raw(B, fb), to=out)
    g = np.asarray(got.raw(), dtype=object)
    for x, y, r in zip(A, B, g.reshape(-1)):
        want, _ = hostops.qmul((int(x), F512), (int(y), fb), to=out)
        assert int(r) == want


def test_mul_512_by_512_host_fallback_correct():
    """The proof sends it host; the result must still match the oracle."""
    out = qformat(640, 398)
    A = rand_raws(F512, 6, 6)
    B = rand_raws(F512, 6, 7)
    got = ew.qmul(from_raw(A, F512), from_raw(B, F512), to=out)
    g = np.asarray(got.raw(), dtype=object)
    for x, y, r in zip(A, B, g.reshape(-1)):
        want, _ = hostops.qmul((int(x), F512), (int(y), F512), to=out)
        assert int(r) == want


@pytest.mark.parametrize("om", list(OverflowMode))
def test_cast_992_vs_oracle(om):
    src = F992
    dst = qformat(400, 200, round_mode=RoundMode.RND_CONV, overflow_mode=om)
    A = rand_raws(src, 10, 8)
    got = from_raw(A, src).astype(dst)
    g = np.asarray(got.raw(), dtype=object)
    for x, r in zip(A, g.reshape(-1)):
        assert int(r) == hostint.requantize(int(x), src.frac_bits, dst)


def test_cast_up_into_992_vs_oracle():
    src = qformat(100, 50)
    dst = qformat(600, 391, overflow_mode=OverflowMode.SAT_TCPL)
    A = rand_raws(src, 10, 9)
    got = from_raw(A, src).astype(dst)
    assert got.is_limb and got.data.nlimbs == 31
    g = np.asarray(got.raw(), dtype=object)
    for x, r in zip(A, g.reshape(-1)):
        assert int(r) == hostint.requantize(int(x), src.frac_bits, dst)


@pytest.mark.parametrize("trial", range(depthctl.trials(8, 3)))
def test_fuzz_385_to_992_vs_oracle(trial):
    """Random formats in the newly-admitted 385..992-bit storage range:
    whatever route the proof picks (device limbs or host), results must
    match the oracle bit-for-bit."""
    rng = np.random.RandomState(7900 + trial)

    def rfmt():
        while True:
            i = int(rng.randint(-6, 700))
            f = int(rng.randint(-6, 500))
            if 385 <= i + f + 1 <= 992:
                return qformat(i, f, bool(rng.randint(0, 2)),
                               RoundMode(int(rng.randint(0, 7))),
                               OverflowMode(int(rng.randint(0, 5))))
    fa = rfmt()
    fb = qformat(int(rng.randint(2, 120)), int(rng.randint(0, 120)))
    out = rfmt() if rng.randint(0, 2) else \
        qformat(int(rng.randint(10, 300)), int(rng.randint(0, 150)),
                round_mode=RoundMode(int(rng.randint(0, 7))),
                overflow_mode=OverflowMode(int(rng.randint(0, 5))))
    n = 8
    A = rand_raws(fa, n, 300 + trial)
    B = rand_raws(fb, n, 400 + trial)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert ta.is_limb
    for op, host in (("qadd", hostops.qadd), ("qsub", hostops.qsub),
                     ("qmul", hostops.qmul)):
        got = getattr(ew, op)(ta, tb, to=out)
        g = np.asarray(got.raw(), dtype=object)
        for x, y, r in zip(A, B, g.reshape(-1)):
            want, _ = host((int(x), fa), (int(y), fb), to=out)
            assert int(r) == want, (op, fa, fb, out, int(x), int(y))


def test_reduce_500bit_on_device():
    from qublas_tpu.ops.reduce import qreduce

    fa = qformat(310, 199)     # 510-bit values
    layers = (qformat(320, 199),)
    x = from_raw(rand_raws(fa, 9, 11), fa)
    assert x.is_limb
    r = qreduce(x, layers)
    want, wfmt = hostops.qreduce_list(
        [(int(v), fa) for v in np.asarray(x.raw(), dtype=object)], layers)
    assert r.fmt == wfmt and int(np.asarray(r.raw(), dtype=object)) == want


def test_jit_compatible_512():
    import jax

    from qublas_tpu.ops.limbint import LimbArray
    from qublas_tpu.qtensor import QTensor

    out = qformat(320, 199, overflow_mode=OverflowMode.SAT_ZERO)
    A = rand_raws(F512, 8, 12)
    B = rand_raws(F512, 8, 13)
    ta, tb = from_raw(A, F512), from_raw(B, F512)
    f = jax.jit(lambda la, lb: ew.qadd(QTensor(LimbArray(la), F512),
                                       QTensor(LimbArray(lb), F512),
                                       to=out).data.limbs)
    got = QTensor(LimbArray(f(ta.data.limbs, tb.data.limbs)), out)
    eager = ew.qadd(ta, tb, to=out)
    assert [int(v) for v in np.asarray(got.raw(), dtype=object)] == \
        [int(v) for v in np.asarray(eager.raw(), dtype=object)]
