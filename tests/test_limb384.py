"""Device limb storage extended to 384 bits (round 3, VERDICT r2
missing-2's device half): formats with 257..384-bit physical storage now
live as stacked uint32 limbs on device instead of host object arrays —
the widest storage whose every binary op provably fits the 1024-bit
working cap (a 384x384 product is ~770 working bits).  Differentially
pinned to the exact host golden model.
"""

import random

import numpy as np
import pytest

import depthctl

from qublas_tpu import from_raw, hostint, hostops, qformat
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops.widths import LIMB_STORE_MAX_BITS, storage_kind
from qublas_tpu.qformat import OverflowMode, RoundMode


def rand_raws(fmt, n, seed):
    rng = random.Random(f"l384:{seed}:{fmt.storage_bits}")
    vals = [0, 1, -1, fmt.raw_max, fmt.raw_min]
    vals += [rng.randint(fmt.raw_min, fmt.raw_max) for _ in range(n - 5)]
    return np.array(vals[:n], dtype=object)


F301 = qformat(200, 100)
F384 = qformat(250, 133)        # exactly 384-bit storage


def test_envelope_and_storage_kinds():
    # the cap rose again in round 4 (384 -> 992, per-op width proofs);
    # this file remains the 257..384-bit coverage, test_limb992.py the rest
    assert LIMB_STORE_MAX_BITS >= 384
    assert storage_kind(F301) == "limb"
    assert storage_kind(F384) == "limb"
    t = from_raw(rand_raws(F384, 6, 0), F384)
    assert t.is_limb and t.data.nlimbs == 12
    # round-trip through raw()
    raws = rand_raws(F301, 8, 1)
    back = from_raw(raws, F301).raw()
    assert [int(v) for v in back] == [int(v) for v in raws]


@pytest.mark.parametrize("trial", range(depthctl.trials(10, 4)))
def test_fuzz_binary_ops_vs_oracle(trial):
    rng = np.random.RandomState(7000 + trial)
    def rfmt():
        while True:
            i = int(rng.randint(-6, 260))
            f = int(rng.randint(-6, 260))
            if 257 <= i + f + 1 <= 384:
                return qformat(i, f, bool(rng.randint(0, 2)),
                               RoundMode(int(rng.randint(0, 7))),
                               OverflowMode(int(rng.randint(0, 5))))
    fa = rfmt()
    fb = qformat(int(rng.randint(2, 60)), int(rng.randint(0, 60)))
    out = rfmt() if rng.randint(0, 2) else \
        qformat(int(rng.randint(10, 120)), int(rng.randint(0, 60)),
                round_mode=RoundMode(int(rng.randint(0, 7))),
                overflow_mode=OverflowMode(int(rng.randint(0, 5))))
    n = 12
    A = rand_raws(fa, n, 100 + trial)
    B = rand_raws(fb, n, 200 + trial)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert ta.is_limb
    for op, host in (("qmul", hostops.qmul), ("qadd", hostops.qadd),
                     ("qsub", hostops.qsub)):
        got = getattr(ew, op)(ta, tb, to=out)
        g = np.asarray(got.raw(), dtype=object)
        for x, y, r in zip(A, B, g.reshape(-1)):
            want, _ = host((int(x), fa), (int(y), fb), to=out)
            assert int(r) == want, (op, fa, fb, out, int(x), int(y))


@pytest.mark.parametrize("om", list(OverflowMode))
def test_cast_384_vs_oracle(om):
    src = F384
    dst = qformat(180, 90, round_mode=RoundMode.RND_CONV, overflow_mode=om)
    A = rand_raws(src, 14, 3)
    got = from_raw(A, src).astype(dst)
    g = np.asarray(got.raw(), dtype=object)
    for x, r in zip(A, g.reshape(-1)):
        assert int(r) == hostint.requantize(int(x), src.frac_bits, dst)


def test_reduce_and_gemm_300bit_on_device():
    from qublas_tpu.ops.gemm import qgemul
    from qublas_tpu.ops.reduce import qreduce

    fa, fb = F301, qformat(10, 4)
    layers = (qformat(210, 100),)
    x = from_raw(rand_raws(fa, 9, 4), fa)
    r = qreduce(x, layers)
    want, wfmt = hostops.qreduce_list(
        [(int(v), fa) for v in np.asarray(x.raw(), dtype=object)], layers)
    assert r.fmt == wfmt and int(np.asarray(r.raw(), dtype=object)) == want

    m, k, n = 2, 5, 2
    A = rand_raws(fa, m * k, 5).reshape(m, k)
    B = rand_raws(fb, k * n, 6).reshape(k, n)
    out = qformat(220, 80, overflow_mode=OverflowMode.SAT_TCPL)
    mul_to = qformat(215, 104)
    got = qgemul(from_raw(A, fa), from_raw(B, fb), out, mul_to=mul_to,
                 add_formats=(qformat(225, 104),))
    ho = hostops.qgemul(
        [[(int(A[i, j]), fa) for j in range(k)] for i in range(m)],
        [[(int(B[i, j]), fb) for j in range(n)] for i in range(k)],
        out, mul_to, (qformat(225, 104),))
    g = np.asarray(got.raw(), dtype=object)
    assert all(int(g[i][j]) == ho[i][j][0]
               for i in range(m) for j in range(n))


def test_sharded_mn_300bit_operand():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual mesh")
    from qublas_tpu.ops.gemm import qgemul
    from qublas_tpu.parallel import make_mesh, sharded_qgemul_mn

    mesh = make_mesh(dp=2, tp=4)
    fa, fb = qformat(190, 92), qformat(8, 8)   # 283-bit: 9 limbs
    out = qformat(200, 60)
    m, k, n = 4, 4, 8
    ta = from_raw(rand_raws(fa, m * k, 7).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 8).reshape(k, n), fb)
    assert ta.is_limb
    got = sharded_qgemul_mn(ta, tb, out, mesh, mul_to=qformat(205, 100))
    ref = qgemul(ta, tb, out, mul_to=qformat(205, 100))
    g = np.asarray(got.raw(), dtype=object)
    w = np.asarray(ref.raw(), dtype=object)
    assert [int(v) for v in g.reshape(-1)] == [int(v) for v in w.reshape(-1)]


def test_jit_compatible_384():
    import jax

    from qublas_tpu.ops.limbint import LimbArray
    from qublas_tpu.qtensor import QTensor

    fa = F301
    fb = qformat(10, 4)
    out = qformat(210, 80)
    A = rand_raws(fa, 16, 9)
    B = rand_raws(fb, 16, 10)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    f = jax.jit(lambda ls, bd: ew.qmul(QTensor(LimbArray(ls), fa),
                                       QTensor(bd, fb), to=out).data.limbs)
    got = QTensor(LimbArray(f(ta.data.limbs, tb.data)), out)
    eager = ew.qmul(ta, tb, to=out)
    assert [int(v) for v in np.asarray(got.raw(), dtype=object)] == \
        [int(v) for v in np.asarray(eager.raw(), dtype=object)]
