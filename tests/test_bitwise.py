"""Raw-bitwise QTensor ops + decimal string I/O (VERDICT r4 missing-3).

Reference semantics: ArbiInt ``^ & | ~`` are two's-complement bitwise with
the narrower operand sign-extended and result width max(N, M)
(QuBLAS.h:1836-1978); the decimal ctor parses mod the 64-bit-multiple
machine word (:216-269, :506-518).  Differential oracle: Python ints,
which ARE two's-complement bitwise for arbitrary precision.
"""

import operator

import numpy as np
import pytest

import jax

from qublas_tpu import bitwise
from qublas_tpu.qformat import qformat
from qublas_tpu.qtensor import from_raw

OPS = [("qand", operator.and_), ("qor", operator.or_),
       ("qxor", operator.xor)]

# one format per storage kind
F_LANE8 = qformat(3, 4)          # 8-bit lanes
F_LANE32 = qformat(15, 10)       # int32 lanes
F_PAIR = qformat(30, 9)          # 40-bit pair
F_LIMB = qformat(50, 29)         # 80-bit, 3 limbs
F_HOST = qformat(700, 500)       # >992-bit: host


def rand_q(fmt, n, seed):
    rng = np.random.RandomState(seed)
    if fmt.storage_bits <= 62:
        raws = rng.randint(fmt.raw_min, fmt.raw_max + 1, n)
        return from_raw(raws, fmt), [int(v) for v in raws]
    import random

    rr = random.Random(f"bw:{seed}")
    raws = [rr.randint(fmt.raw_min, fmt.raw_max) for _ in range(n)]
    return from_raw(np.array(raws, dtype=object), fmt), raws


@pytest.mark.parametrize("fa,fb", [
    (F_LANE8, F_LANE8), (F_LANE8, F_LANE32), (F_LANE32, F_PAIR),
    (F_PAIR, F_PAIR), (F_LANE8, F_LIMB), (F_PAIR, F_LIMB),
    (F_LIMB, F_LIMB), (F_LIMB, F_HOST), (F_HOST, F_HOST),
])
def test_bitwise_vs_python_ints(fa, fb):
    a, ra = rand_q(fa, 16, 1)
    b, rb = rand_q(fb, 16, 2)
    wide = fa if fa.storage_bits >= fb.storage_bits else fb
    for name, op in OPS:
        got = getattr(bitwise, name)(a, b)
        assert got.fmt == wide
        want = [op(x, y) for x, y in zip(ra, rb)]
        assert [int(v) for v in
                np.asarray(got.raw(), dtype=object).reshape(-1)] == want
        # commuted operand order: same bits, same (wider) format
        got2 = getattr(bitwise, name)(b, a)
        assert got2.fmt == wide
        assert [int(v) for v in
                np.asarray(got2.raw(), dtype=object).reshape(-1)] == want


@pytest.mark.parametrize("fmt", [F_LANE8, F_LANE32, F_PAIR, F_LIMB, F_HOST])
def test_not_vs_python_ints(fmt):
    a, ra = rand_q(fmt, 12, 3)
    got = bitwise.qnot(a)
    assert got.fmt == fmt
    assert [int(v) for v in
            np.asarray(got.raw(), dtype=object).reshape(-1)] == \
        [~x for x in ra]


def test_bitwise_jittable_device_kinds():
    a, ra = rand_q(F_PAIR, 8, 4)
    b, rb = rand_q(F_LANE32, 8, 5)

    @jax.jit
    def f(ah, al, bd):
        from qublas_tpu.ops.wideint import PairArray
        from qublas_tpu.qtensor import QTensor

        r = bitwise.qxor(QTensor(PairArray(ah, al), F_PAIR),
                         QTensor(bd, F_LANE32))
        return r.data.hi, r.data.lo

    hi, lo = f(a.data.hi, a.data.lo, b.data)
    from qublas_tpu.ops.wideint import PairArray
    from qublas_tpu.qtensor import QTensor

    got = QTensor(PairArray(hi, lo), F_PAIR)
    assert [int(v) for v in got.raw().reshape(-1)] == \
        [x ^ y for x, y in zip(ra, rb)]


def test_decimal_roundtrip_and_word_wrap():
    f = qformat(50, 29)                   # 80-bit storage, 128-bit word
    vals = ["123456789012345678901234", "-98765432109876543210", "0", "7"]
    t = bitwise.from_decimal(vals, f)
    assert list(bitwise.to_decimal(t).reshape(-1)) == vals
    # beyond the 128-bit machine word: wraps mod 2^128, signed (reference
    # string_to_big_integer writes into the limb array)
    big = 1 << 200
    t2 = bitwise.from_decimal([str(big + 5)], f)
    assert int(t2.raw().reshape(-1)[0]) == 5
    t3 = bitwise.from_decimal([str((1 << 127) + 1)], qformat(80, 47))
    assert int(np.asarray(t3.raw(), dtype=object).reshape(-1)[0]) == \
        -(1 << 127) + 1


def test_lane_wart_raws_not_truncated():
    """fill(int)-wart raws (out-of-range, stored in a wider lane dtype)
    must survive the device bitwise path un-masked, matching the host
    oracle (round-5 review fix)."""
    f = qformat(3, 4)                     # 8-bit format
    a = from_raw(np.array([300, -200, 77]), f)   # wart raws -> int16 lane
    got = bitwise.qand(a, a)
    assert [int(v) for v in np.asarray(got.raw()).reshape(-1)] == \
        [300, -200, 77]
    b = from_raw(np.array([0x1FF, 3, 5]), f)
    got2 = bitwise.qxor(a, b)
    assert [int(v) for v in np.asarray(got2.raw()).reshape(-1)] == \
        [300 ^ 0x1FF, -200 ^ 3, 77 ^ 5]
