"""Device limb division (round 4 — completes device division across every
storage kind).

Qdiv configs whose numerator/denominator/quotient outgrow the signed 64-bit
pair domain — limb-storage operands, or any operands whose
``<< (shift_a + out.frac_bits)`` numerator passes 64 bits — previously ran a
per-element host Python loop.  They now run ``limbint.ldiv_trunc``
(bit-serial restoring long division on stacked uint32 limbs) + the
overflow-only limb epilogue, proof-gated by ``widths.route_div`` within the
1024-bit working envelope.

Semantics are the documented D1 intent (the reference's Qdiv is
uninstantiable, REFERENCE_DEFECTS.md; QuBLAS.h:3252): div-by-zero -> 0,
truncate toward zero, overflow stage only.  Oracle: ``hostops.qdiv``.
"""

import random

import numpy as np
import pytest

import jax

from qublas_tpu import from_raw, hostops, qformat
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops import limbint as L
from qublas_tpu.ops.widths import route_div
from qublas_tpu.qformat import OverflowMode, RoundMode, add_merge
from qublas_tpu.qtensor import QTensor

from depthctl import trials as _trials


def rand_raws(fmt, n, seed):
    rng = random.Random(f"ld:{seed}:{fmt.storage_bits}")
    return np.array([rng.randint(fmt.raw_min, fmt.raw_max)
                     for _ in range(n)], dtype=object)


def _vs_oracle(ta, tb, to, A, B):
    got = ew.qdiv(ta, tb, to=to)
    g = np.asarray(got.raw(), dtype=object).reshape(-1)
    for x, y, gv in zip(A.reshape(-1), B.reshape(-1), g):
        want, wf = hostops.qdiv((int(x), ta.fmt), (int(y), tb.fmt), to=to)
        assert got.fmt == wf
        assert int(gv) == want, (int(x), int(y), int(gv), want)
    return got


def _route(fa, fb, to):
    return route_div(fa, fb, add_merge(fa, fb, to, False))[0]


def test_limb_operand_division_vs_oracle():
    """101-bit / 81-bit limb-storage operands: previously a host loop, now
    the device restoring divider on stacked limbs."""
    fa = qformat(60, 40)
    fb = qformat(50, 30)
    to = qformat(70, 20, overflow_mode=OverflowMode.SAT_ZERO)
    assert _route(fa, fb, to) == "limb"
    A = rand_raws(fa, 32, 1)
    B = rand_raws(fb, 32, 2)
    B[0] = 0       # reference wart: div-by-zero -> 0
    B[1] = -1
    B[2] = 1
    A[3] = fa.raw_min
    A[4] = fa.raw_max
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert ta.is_limb
    got = _vs_oracle(ta, tb, to, A, B)
    assert got.is_limb


def test_mixed_kind_operands():
    """Lane numerator / pair denominator whose upshifted numerator outgrows
    the pair domain (the ``<< out.frac_bits`` stage): pair route refuses,
    limb route takes it.  Output narrows back to (hi, lo) pair storage."""
    fa = qformat(20, 4)
    fb = qformat(40, 12)
    to = qformat(10, 44, overflow_mode=OverflowMode.SAT_TCPL)
    assert _route(fa, fb, to) == "limb"
    A = rand_raws(fa, 24, 3)
    B = rand_raws(fb, 24, 4)
    B[5] = 0
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert not ta.is_limb and tb.is_pair
    got = _vs_oracle(ta, tb, to, A, B)
    assert got.is_pair and not got.is_limb


@pytest.mark.parametrize("omode", list(OverflowMode))
def test_overflow_modes(omode):
    """All five overflow modes through the overflow-only limb epilogue
    (including WRP wraps of a quotient wider than the destination)."""
    fa = qformat(60, 40)
    fb = qformat(2, 36)
    to = qformat(12, 30, overflow_mode=omode)
    assert _route(fa, fb, to) == "limb"
    A = rand_raws(fa, 24, 5 + int(omode))
    B = rand_raws(fb, 24, 6 + int(omode))
    B[7] = 0
    _vs_oracle(from_raw(A, fa), from_raw(B, fb), to, A, B)


def test_jit_compatible():
    fa = qformat(60, 40)
    fb = qformat(50, 30)
    to = qformat(70, 20)
    A = rand_raws(fa, 16, 7)
    B = rand_raws(fb, 16, 8)
    ta, tb = from_raw(A, fa), from_raw(B, fb)

    def f(al, bl):
        r = ew.qdiv(QTensor(L.LimbArray(al), fa),
                    QTensor(L.LimbArray(bl), fb), to=to)
        return r.data.limbs

    limbs = jax.jit(f)(ta.data.limbs, tb.data.limbs)
    eager = ew.qdiv(ta, tb, to=to)
    np.testing.assert_array_equal(np.asarray(limbs),
                                  np.asarray(eager.data.limbs))


def test_ldiv_trunc_edge_values():
    """The raw divider against Python C-style division on edge patterns
    spanning limb boundaries (values to ~2^180, K = 6)."""
    from qublas_tpu.hostint import trunc_div

    vals_n = [0, 1, -1, 5, -5, (1 << 180) - 3, -(1 << 180) + 3,
              (1 << 128), -(1 << 128) - 1, (1 << 96) + (1 << 31),
              12345678901234567890123456789]
    vals_d = [1, -1, 2, -2, 3, -3, (1 << 100) + 7, -(1 << 100) - 7,
              (1 << 180) - 1, -(1 << 180) + 1, (1 << 32), (1 << 64) - 1]
    N = np.array([x for x in vals_n for _ in vals_d], dtype=object)
    D = np.array([y for _ in vals_n for y in vals_d], dtype=object)
    K = 6  # 192-bit working width: one headroom bit past the 181-bit values
    q = L.ldiv_trunc(L.limbs_from_ints(N, K), L.limbs_from_ints(D, K),
                     nbits=182)
    got = [int(v) for v in L.ints_from_limbs(q)]
    want = [trunc_div(int(x), int(y)) for x, y in zip(N, D)]
    assert got == want, [
        (int(x), int(y), g, w)
        for x, y, g, w in zip(N, D, got, want) if g != w][:5]


@pytest.mark.parametrize("trial", range(_trials(8, 4)))
def test_fuzz_limb_div_vs_oracle(trial):
    """Random limb-regime div configs (random modes, signedness, to=None)
    vs hostops.qdiv."""
    rng = random.Random(f"ldf:{trial}")

    def rf():
        while True:
            i, f = rng.randint(-4, 70), rng.randint(-4, 50)
            if i + f >= 0:
                return qformat(i, f, bool(rng.randint(0, 1)))

    for _ in range(60):
        fa, fb = rf(), rf()
        to = None if rng.randint(0, 1) else qformat(
            rng.randint(0, 80), rng.randint(0, 40), True,
            RoundMode(rng.randint(0, 6)), OverflowMode(rng.randint(0, 4)))
        try:
            out = add_merge(fa, fb, to, False)
        except ValueError:
            continue
        if route_div(fa, fb, out)[0] != "limb":
            continue
        A = rand_raws(fa, 12, hash((trial, fa.storage_bits)) % 10**6)
        B = rand_raws(fb, 12, hash((trial, fb.storage_bits)) % 10**6 + 1)
        B[0] = 0
        _vs_oracle(from_raw(A, fa), from_raw(B, fb), to, A, B)
        return
    pytest.skip("no limb-regime config drawn")


def test_host_route_beyond_envelope():
    """Working widths past the 1024-bit envelope stay on the exact host
    path: a 600-bit numerator shifted by a 500-bit-frac output passes
    1024 working bits."""
    fa = qformat(500, 100)   # 601-bit storage
    fb = qformat(8, 8)
    to = qformat(500, 460)   # numerator << 460 -> ~1061 bits
    assert _route(fa, fb, to) == "host"
    A = rand_raws(fa, 4, 9)
    B = rand_raws(fb, 4, 10)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    _vs_oracle(ta, tb, to, A, B)   # still correct via the host loop
