"""Device pair division (round 4, VERDICT r3 item 7).

Qdiv configs whose numerator/denominator/quotient outgrow int32 but fit the
signed 64-bit pair domain — pair-storage operands, or lane operands whose
``<< (shift_a + out.frac_bits)`` numerator passes int32 — previously ran a
per-element host Python loop.  They now run ``wideint.pair_div_trunc``
(64-step restoring long division on (hi, lo) pairs) + the overflow-only
pair epilogue, proof-gated by ``widths.route_div``.

Semantics are the documented D1 intent (the reference's Qdiv is
uninstantiable, REFERENCE_DEFECTS.md): div-by-zero -> 0, truncate toward
zero, overflow stage only.  Oracle: ``hostops.qdiv``.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qublas_tpu import from_raw, hostops, qformat
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops import wideint as W
from qublas_tpu.ops.widths import route_div
from qublas_tpu.qformat import OverflowMode, RoundMode, add_merge
from qublas_tpu.qtensor import QTensor


def rand_raws(fmt, n, seed):
    rng = random.Random(f"pd:{seed}:{fmt.storage_bits}")
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


def test_pair_operand_division_vs_oracle():
    """40-bit pair-storage numerator / 40-bit denominator: previously a
    host loop, now the device restoring divider."""
    fa = qformat(30, 9)
    fb = qformat(30, 9)
    to = qformat(33, 4, overflow_mode=OverflowMode.SAT_TCPL)
    assert _route(fa, fb, to) == "pair"
    A = rand_raws(fa, 32, 1)
    B = rand_raws(fb, 32, 2)
    B[0] = 0       # reference wart: div-by-zero -> 0
    B[1] = -1
    B[2] = 1
    A[3] = fa.raw_min
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert ta.is_pair
    got = _vs_oracle(ta, tb, to, A, B)
    assert got.is_pair


def test_lane_operands_wide_numerator():
    """Lane operands whose upshifted numerator outgrows int32 (the
    ``<< out.frac_bits`` stage): i32 route refuses, pair route takes it."""
    fa = qformat(20, 4)
    fb = qformat(4, 12)
    to = qformat(24, 20, overflow_mode=OverflowMode.SAT_ZERO)
    assert _route(fa, fb, to) == "pair"
    A = rand_raws(fa, 24, 3)
    B = rand_raws(fb, 24, 4)
    B[5] = 0
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    _vs_oracle(ta, tb, to, A, B)


@pytest.mark.parametrize("omode", list(OverflowMode))
def test_overflow_modes(omode):
    """All five overflow modes through the overflow-only pair epilogue
    (including WRP wraps of a saturated-width quotient)."""
    fa = qformat(30, 9)
    fb = qformat(2, 6)
    to = qformat(12, 6, overflow_mode=omode)
    if _route(fa, fb, to) != "pair":
        pytest.skip("route not pair for this mode")
    A = rand_raws(fa, 24, 5 + int(omode))
    B = rand_raws(fb, 24, 6 + int(omode))
    B[7] = 0
    _vs_oracle(from_raw(A, fa), from_raw(B, fb), to, A, B)


def test_jit_compatible():
    fa = qformat(30, 9)
    fb = qformat(30, 9)
    to = qformat(33, 4)
    A = rand_raws(fa, 16, 7)
    B = rand_raws(fb, 16, 8)
    ta, tb = from_raw(A, fa), from_raw(B, fb)

    def f(ah, al, bh, bl):
        r = ew.qdiv(QTensor(W.PairArray(ah, al), fa),
                    QTensor(W.PairArray(bh, bl), fb), to=to)
        return r.data.hi, r.data.lo

    h, l = jax.jit(f)(ta.data.hi, ta.data.lo, tb.data.hi, tb.data.lo)
    eager = ew.qdiv(ta, tb, to=to)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(eager.data.hi))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(eager.data.lo))


def test_pair_div_trunc_edge_values():
    """The raw divider against Python C-style division on edge patterns."""
    from qublas_tpu.hostint import trunc_div

    vals_n = [0, 1, -1, 5, -5, (1 << 62) - 3, -(1 << 62) + 3,
              (1 << 63) - 1, -(1 << 63) + 1, 12345678901234567]
    vals_d = [1, -1, 2, -2, 3, -3, (1 << 40) + 7, -(1 << 40) - 7,
              (1 << 63) - 1, -(1 << 63) + 1]
    n = len(vals_n) * len(vals_d)
    N = np.array([x for x in vals_n for _ in vals_d], dtype=object)
    D = np.array([y for _ in vals_n for y in vals_d], dtype=object)
    np_pair = W.pair_from_int64_np
    q = W.pair_div_trunc((np_pair(N).hi, np_pair(N).lo),
                         (np_pair(D).hi, np_pair(D).lo))
    got = [int(h) * (1 << 32) + int(l)
           for h, l in zip(np.asarray(q[0]), np.asarray(q[1]))]
    want = [trunc_div(int(x), int(y)) for x, y in zip(N, D)]
    assert got == want, [
        (int(x), int(y), g, w)
        for x, y, g, w in zip(N, D, got, want) if g != w][:5]


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_pair_div_vs_oracle(trial):
    """Random pair-regime div configs (random modes, signedness, to=None)
    vs hostops.qdiv."""
    rng = random.Random(f"pdf:{trial}")

    def rf():
        while True:
            i, f = rng.randint(-4, 34), rng.randint(-4, 20)
            if i + f >= 0:
                return qformat(i, f, bool(rng.randint(0, 1)))

    for _ in range(40):
        fa, fb = rf(), rf()
        to = None if rng.randint(0, 1) else qformat(
            rng.randint(0, 40), rng.randint(0, 16), True,
            RoundMode(rng.randint(0, 6)), OverflowMode(rng.randint(0, 4)))
        try:
            out = add_merge(fa, fb, to, False)
        except ValueError:
            continue
        if route_div(fa, fb, out)[0] != "pair":
            continue
        A = rand_raws(fa, 12, hash((trial, fa.storage_bits)) % 10**6)
        B = rand_raws(fb, 12, hash((trial, fb.storage_bits)) % 10**6 + 1)
        B[0] = 0
        _vs_oracle(from_raw(A, fa), from_raw(B, fb), to, A, B)
        return
    pytest.skip("no pair-regime config drawn")


def test_i32_route_still_taken_for_narrow():
    fa = qformat(8, 4)
    fb = qformat(4, 4)
    to = qformat(14, 6)
    assert _route(fa, fb, to) == "i32"


def test_limb_route_for_limb_operands():
    """Limb-storage operands take the stacked-limb divider since late
    round 4 (they previously fell to the host loop) — full coverage in
    tests/test_limb_div.py."""
    fa = qformat(40, 30)   # 71-bit limb storage
    fb = qformat(8, 8)
    to = qformat(40, 8)
    assert _route(fa, fb, to) == "limb"
    A = rand_raws(fa, 4, 9)
    B = rand_raws(fb, 4, 10)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    _vs_oracle(ta, tb, to, A, B)
