"""Structural shift/mask sweeps for the 64-bit pair emulation.

Parity with the reference's generated ArbiInt shift-test family
(test/ArbiInt/staticShiftLeft.cpp, staticShiftRight.cpp — a width×shift grid
checked positionally): our device path has no ArbiInt, but its exactness
rests on :mod:`qublas_tpu.ops.wideint`'s (hi, lo) pair primitives, so these
sweep the same grid against Python-int ground truth.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qublas_tpu.ops import wideint as W

rng = np.random.RandomState(2024)


def to_pair(vals):
    hi = np.array([(v >> 32) & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return jnp.asarray(hi).view(jnp.int32), jnp.asarray(lo)


def from_pair(p):
    hi = np.asarray(p[0]).astype(np.int64)
    lo = np.asarray(p[1]).astype(np.uint64)
    return [int(h) * (1 << 32) + int(l) for h, l in zip(hi, lo)]


def sample_values(width):
    lo, hi = -(1 << (width - 1)), (1 << (width - 1)) - 1
    base = [lo, lo + 1, -1, 0, 1, hi - 1, hi]
    base += [rng.randint(-(1 << 62), 1 << 62) % (hi - lo + 1) + lo
             for _ in range(9)]
    return [v for v in base if lo <= v <= hi]


@pytest.mark.parametrize("width", [8, 16, 31, 33, 48, 63])
@pytest.mark.parametrize("shift", [0, 1, 7, 15, 31, 32, 33, 47])
def test_pair_shl(width, shift):
    vals = [v for v in sample_values(width)
            if -(1 << 62) <= (v << shift) <= (1 << 62)]
    if not vals:
        pytest.skip("shift overflows the 64-bit envelope")
    p = to_pair(vals)
    got = from_pair(W.pair_shl(p, shift))
    assert got == [v << shift for v in vals]


@pytest.mark.parametrize("width", [8, 16, 31, 33, 48, 63])
@pytest.mark.parametrize("shift", [0, 1, 7, 15, 31, 32, 33, 47, 62])
def test_pair_shr_arithmetic(width, shift):
    vals = sample_values(width)
    p = to_pair(vals)
    got = from_pair(W.pair_shr(p, shift))
    assert got == [v >> shift for v in vals]  # Python >> is arithmetic


@pytest.mark.parametrize("width", [16, 33, 63])
@pytest.mark.parametrize("d", [1, 8, 31, 32, 33, 48, 63])
def test_pair_low_bits(width, d):
    vals = sample_values(width)
    p = to_pair(vals)
    got = from_pair(W.pair_low_bits(p, d))
    assert got == [v & ((1 << d) - 1) for v in vals]


@pytest.mark.parametrize("width", [16, 32, 48, 63])
def test_pair_add_neg_compare(width):
    a = sample_values(width)
    b = sample_values(width)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    pa, pb = to_pair(a), to_pair(b)
    assert from_pair(W.pair_add(pa, pb)) == [
        _wrap64(x + y) for x, y in zip(a, b)]
    assert from_pair(W.pair_neg(pa)) == [_wrap64(-x) for x in a]
    assert list(np.asarray(W.pair_lt(pa, pb))) == [x < y
                                                   for x, y in zip(a, b)]
    assert list(np.asarray(W.pair_eq(pa, pa))) == [True] * n


def test_mul32_wide_grid():
    vals = [-(1 << 31), -(1 << 31) + 1, -1, 0, 1, (1 << 31) - 1,
            12345, -987654321, 1 << 30, -(1 << 30)]
    a = np.array(vals, dtype=np.int64).astype(np.int32)
    for x in vals:
        xa = jnp.full(len(vals), x, dtype=jnp.int32)
        got = from_pair(W.mul32_wide(xa, jnp.asarray(a)))
        assert got == [_wrap64(x * int(y)) for y in vals]


def _wrap64(v):
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


@pytest.mark.parametrize("rm", list(__import__("qublas_tpu.qformat",
                                               fromlist=["RoundMode"])
                                    .RoundMode))
def test_requantize_split_mul_matches_host(rm):
    from qublas_tpu import hostint
    from qublas_tpu.qformat import OverflowMode, qformat

    fa = qformat(8, 8)
    n = 2000
    a = rng.randint(fa.raw_min, fa.raw_max + 1, n).astype(np.int32)
    b = rng.randint(fa.raw_min, fa.raw_max + 1, n).astype(np.int32)
    a[:8] = [fa.raw_min, fa.raw_max, 0, 0, 1, -1, fa.raw_min, fa.raw_max]
    b[:8] = [fa.raw_min, fa.raw_max, 5, 0, -1, 1, fa.raw_max, fa.raw_min]
    for om in (OverflowMode.SAT_TCPL, OverflowMode.SAT_ZERO,
               OverflowMode.WRP_TCPL, OverflowMode.SAT_SMGN):
        out = qformat(8, 8, round_mode=rm, overflow_mode=om)
        got = np.asarray(W.requantize_split_mul(
            jnp.asarray(a), jnp.asarray(b), 16, out))
        want = np.array([hostint.requantize(int(x) * int(y), 16, out)
                         for x, y in zip(a, b)])
        np.testing.assert_array_equal(got, want, err_msg=f"{rm} {om}")


def test_widen_roundtrip():
    vals = [-(1 << 31), -1, 0, 1, (1 << 31) - 1, 424242, -424242]
    x = jnp.asarray(np.array(vals, dtype=np.int32))
    assert from_pair(W.widen(x)) == vals
