"""Streaming wide GEMM (binary-carry over k-chunks at the QTensor level).

The streaming path must be bit-identical to the layered fallback (which is
pinned to the host golden model elsewhere) for every chunk-count pattern:
the binary-carry merge order equals the reference's balanced-tree pairing
(QuBLAS.h:4960-4990) including the ragged drain edge.
"""

import random

import numpy as np
import pytest

import depthctl

import jax

from qublas_tpu import from_raw, hostops, qformat
from qublas_tpu.ops import gemm
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode
from qublas_tpu.qtensor import QTensor


def rand_raws(fmt, n, seed):
    rng = random.Random(f"{seed}:{fmt.storage_bits}:{n}")
    lo = -(1 << (fmt.storage_bits - 1))
    hi = (1 << (fmt.storage_bits - 1)) - 1
    return np.array([rng.randint(lo, hi) for _ in range(n)], dtype=object)


@pytest.fixture
def force_stream(monkeypatch):
    monkeypatch.setattr(gemm, "_STREAM_MIN_ELEMS", 0)
    # keep these tests pinned to the streaming tree: a proof-lossless fuzz
    # config would otherwise route to the round-3 pair-domain fast path on
    # BOTH sides of the comparison and stop exercising the stream
    monkeypatch.setattr(gemm, "_fast_gemm_wide", lambda *a, **k: None)


def _layered(ta, tb, out, **kw):
    """The layered fallback result (streaming disabled)."""
    saved = gemm._STREAM_MIN_ELEMS
    gemm._STREAM_MIN_ELEMS = 1 << 60
    try:
        return gemm.qgemul(ta, tb, out, **kw)
    finally:
        gemm._STREAM_MIN_ELEMS = saved


def _assert_same(got, ref):
    assert got.fmt == ref.fmt
    g = np.asarray(got.raw(), dtype=object)
    w = np.asarray(ref.raw(), dtype=object)
    assert g.shape == w.shape
    assert [int(v) for v in g.reshape(-1)] == [int(v) for v in w.reshape(-1)]


# k values covering distinct chunk/drain patterns: 48 = 16*3 (drain add),
# 40 = 8*101b (seed+convert+add), 56 = 8*7 (all-add drain), 128 = 64*2
@pytest.mark.parametrize("k", depthctl.pick([48, 40, 56, 128], [40, 128]))
def test_stream_pair_matches_layered(force_stream, k):
    fa = qformat(30, 9)           # 40-bit storage: pair
    fb = qformat(8, 8)
    out = QFormat(30, 9, True, RoundMode.RND_CONV, OverflowMode.SAT_TCPL)
    m, n = 3, 4
    ta = from_raw(rand_raws(fa, m * k, 1).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 2).reshape(k, n), fb)
    assert ta.is_pair
    kw = dict(mul_to=qformat(38, 17), add_formats=(qformat(34, 12),))
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))


def test_stream_pair_default_merger(force_stream):
    fa = fb = qformat(30, 9)
    out = qformat(33, 9)
    m, k, n = 3, 40, 4
    ta = from_raw(rand_raws(fa, m * k, 3).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 4).reshape(k, n), fb)
    got = gemm.qgemul(ta, tb, out)
    _assert_same(got, _layered(ta, tb, out))


def test_stream_limb_matches_layered(force_stream):
    fa = qformat(40, 28)          # 69-bit storage: limb
    fb = qformat(8, 8)
    out = QFormat(50, 30, True, RoundMode.RND_CONV, OverflowMode.SAT_TCPL)
    m, k, n = 2, 48, 3
    ta = from_raw(rand_raws(fa, m * k, 5).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 6).reshape(k, n), fb)
    assert ta.is_limb
    kw = dict(mul_to=qformat(48, 40))
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))


def test_stream_batched(force_stream):
    fa = fb = qformat(30, 9)
    out = qformat(33, 9)
    b, m, k, n = 2, 2, 40, 3
    ta = from_raw(rand_raws(fa, b * m * k, 7).reshape(b, m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 8).reshape(k, n), fb)
    got = gemm.qgemul(ta, tb, out)
    _assert_same(got, _layered(ta, tb, out))


def test_stream_vs_host_oracle(force_stream):
    """Direct pin to the golden model on a small streamed case (24 = 8*3)."""
    fa = qformat(30, 9)
    fb = qformat(8, 8)
    out = qformat(30, 9)
    m, k, n = 2, 24, 2
    A = rand_raws(fa, m * k, 9).reshape(m, k)
    B = rand_raws(fb, k * n, 10).reshape(k, n)
    got = gemm.qgemul(from_raw(A, fa), from_raw(B, fb), out)
    ho = hostops.qgemul(
        [[(int(A[i, j]), fa) for j in range(k)] for i in range(m)],
        [[(int(B[i, j]), fb) for j in range(n)] for i in range(k)], out)
    g = np.asarray(got.raw(), dtype=object)
    assert all(int(g[i][j]) == ho[i][j][0]
               for i in range(m) for j in range(n))


def test_stream_jit_compatible(force_stream):
    fa = fb = qformat(30, 9)
    out = qformat(33, 9)
    m, k, n = 3, 48, 3
    ta = from_raw(rand_raws(fa, m * k, 11).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 12).reshape(k, n), fb)
    f = jax.jit(lambda ad, bd: gemm.qgemul(
        QTensor(ad, fa), QTensor(bd, fb), out).data)
    got = QTensor(f(ta.data, tb.data), out)
    _assert_same(got, _layered(ta, tb, out))


@pytest.mark.parametrize("trial", range(depthctl.trials(8, 4)))
def test_fuzz_stream_vs_layered(force_stream, trial):
    """Random wide configs + random chunk patterns: the streamed tree must
    equal the layered tree bit-for-bit (the layered path is pinned to the
    oracle by the differential fuzz elsewhere)."""
    import zlib

    rng = np.random.RandomState(
        zlib.crc32(f"stream_fuzz:{trial}".encode()) % (2**31))

    def rfmt(lo_bits, hi_bits):
        while True:
            i = int(rng.randint(-6, hi_bits))
            f = int(rng.randint(-6, hi_bits))
            w = i + f
            if lo_bits <= w <= hi_bits:
                break
        return qformat(i, f, bool(rng.randint(0, 2)),
                       RoundMode(rng.randint(0, 7)),
                       OverflowMode(rng.randint(0, 5)))

    def raws(fmt, n):
        lo = max(fmt.raw_min, -(1 << 62))
        hi = min(fmt.raw_max, (1 << 62) - 1)
        return np.array([int(rng.randint(lo, hi + 1)) for _ in range(n)],
                        dtype=object)

    fa = rfmt(33, 48) if trial % 2 else rfmt(65, 80)   # pair / limb operand
    fb = rfmt(4, 16)
    out = rfmt(20, 48)
    # any k >= 16 streams now (general-k): sample odd/even/prime freely
    k = int(rng.randint(16, 180))
    m, n = 2, 3
    ta = from_raw(raws(fa, m * k).reshape(m, k), fa)
    tb = from_raw(raws(fb, k * n).reshape(k, n), fb)
    kw = {}
    if rng.randint(0, 2):
        kw["mul_to"] = rfmt(40, 70)
    if rng.randint(0, 2):
        kw["add_formats"] = tuple(rfmt(30, 60)
                                  for _ in range(rng.randint(1, 3)))
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))


def test_stream_inside_shard_map(force_stream):
    """Streaming composes with the sharded entry points: the local tiles'
    qgemul streams inside shard_map and still matches the unsharded tree.
    Formats are unique to this test so the program cache can't hand back a
    layered-trace program compiled by another test."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual mesh")
    from qublas_tpu.parallel import make_mesh, sharded_qgemul_mn

    mesh = make_mesh(dp=2, tp=4)
    fa = qformat(29, 10)          # pair storage, unique to this test
    fb = qformat(7, 7)
    out = qformat(31, 8)
    m, k, n = 4, 48, 8
    ta = from_raw(rand_raws(fa, m * k, 21).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 22).reshape(k, n), fb)
    got = sharded_qgemul_mn(ta, tb, out, mesh)
    _assert_same(got, gemm.qgemul(ta, tb, out))


def test_stream_policy_gates():
    """Streaming engages only when it can help: a chunk >= 8 with at least
    two full chunks (k >= 16), and a product tensor big enough to matter."""
    fa = fb = qformat(30, 9)
    out = qformat(33, 9)

    def mk(m, k, n):
        return (from_raw(rand_raws(fa, m * k, 13).reshape(m, k), fa),
                from_raw(rand_raws(fb, k * n, 14).reshape(k, n), fb))

    # k too small for two >=8 chunks
    ta, tb = mk(2, 15, 2)
    assert gemm._stream_gemm_wide(ta, tb, out, None, (), False) is None
    # small product tensor under the default threshold (any k)
    for k in (32, 33, 48):
        ta, tb = mk(2, k, 2)
        assert gemm._stream_gemm_wide(ta, tb, out, None, (), False) is None
    # the qgemul entry still computes all of these correctly (layered)
    got = gemm.qgemul(ta, tb, out)
    _assert_same(got, _layered(ta, tb, out))


# general k (round 3): odd / prime / pow2+-1 contractions stream too — the
# ragged tail subtree must reproduce the reference's odd-tail converting
# assignments at every layer (QuBLAS.h:4977-4980)
@pytest.mark.parametrize("k", depthctl.pick([17, 19, 33, 65, 97, 127, 251, 257], [17, 33, 127, 257]))
def test_stream_general_k_matches_layered(force_stream, k):
    fa = qformat(30, 9)
    fb = qformat(8, 8)
    out = QFormat(30, 9, True, RoundMode.RND_CONV, OverflowMode.SAT_TCPL)
    m, n = 2, 3
    ta = from_raw(rand_raws(fa, m * k, 31).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 32).reshape(k, n), fb)
    assert ta.is_pair
    kw = dict(mul_to=qformat(38, 17), add_formats=(qformat(34, 12),))
    assert gemm._stream_gemm_wide(ta, tb, out, kw["mul_to"],
                                  kw["add_formats"], False) is not None
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))


@pytest.mark.parametrize("k", [21, 29])
def test_stream_general_k_vs_host_oracle(force_stream, k):
    """Odd-k streamed result pinned directly to the golden model."""
    fa = qformat(30, 9)
    fb = qformat(8, 8)
    out = qformat(30, 9)
    m, n = 2, 2
    A = rand_raws(fa, m * k, 33).reshape(m, k)
    B = rand_raws(fb, k * n, 34).reshape(k, n)
    ta, tb = from_raw(A, fa), from_raw(B, fb)
    assert gemm._stream_gemm_wide(ta, tb, out, None, (), False) is not None
    got = gemm.qgemul(ta, tb, out)
    ho = hostops.qgemul(
        [[(int(A[i, j]), fa) for j in range(k)] for i in range(m)],
        [[(int(B[i, j]), fb) for j in range(n)] for i in range(k)], out)
    g = np.asarray(got.raw(), dtype=object)
    assert all(int(g[i][j]) == ho[i][j][0]
               for i in range(m) for j in range(n))


def test_stream_large_odd_k(force_stream):
    """k = 1023 (the scale the round-2 gate refused: no pow2 factor) —
    streamed bits equal the layered tree's."""
    fa = qformat(30, 9)
    fb = qformat(8, 8)
    out = qformat(33, 9)
    m, k, n = 2, 1023, 2
    ta = from_raw(rand_raws(fa, m * k, 35).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 36).reshape(k, n), fb)
    kw = dict(add_formats=(qformat(40, 14),))
    assert gemm._stream_gemm_wide(ta, tb, out, None, kw["add_formats"],
                                  False) is not None
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))


def test_stream_limb_general_k(force_stream):
    fa = qformat(40, 28)          # 69-bit storage: limb
    fb = qformat(8, 8)
    out = QFormat(50, 30, True, RoundMode.RND_CONV, OverflowMode.SAT_TCPL)
    m, k, n = 2, 37, 3
    ta = from_raw(rand_raws(fa, m * k, 37).reshape(m, k), fa)
    tb = from_raw(rand_raws(fb, k * n, 38).reshape(k, n), fb)
    assert ta.is_limb
    kw = dict(mul_to=qformat(48, 40))
    got = gemm.qgemul(ta, tb, out, **kw)
    _assert_same(got, _layered(ta, tb, out, **kw))
