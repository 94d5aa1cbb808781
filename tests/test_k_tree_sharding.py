"""Subtree-aligned K-sharding of ORDER-SENSITIVE tree GEMMs (round 5).

The other K strategies are gated on a losslessness proof; ``k_tree`` shards
the canonical per-layer-quantized (rounding/saturating) accumulation —
reference tree semantics at QuBLAS.h:4960-4990 — bit-exactly by construction:
each device folds complete aligned subtrees (no pass-throughs exist below the
split level when 2^s | k), node values all_gather, and the top layers fold
with shifted TypeAt formats.  All cases assert bit-identity with the
single-chip path on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax

from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.parallel import make_mesh, shard_qgemul, sharded_qgemul_k_tree
from qublas_tpu.parallel.sharding import _k_tree_split
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat
from qublas_tpu.qtensor import from_raw

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")

rng = np.random.RandomState(11)


def rand(fmt, shape, seed=None):
    r = np.random.RandomState(seed) if seed is not None else rng
    return from_raw(r.randint(fmt.raw_min, fmt.raw_max + 1, size=shape), fmt)


def assert_match(got, ref):
    np.testing.assert_array_equal(np.asarray(got.raw()),
                                  np.asarray(ref.raw()))
    assert got.fmt == ref.fmt


# the canonical order-sensitive config: saturating per-layer accumulation
F88Z = qformat(8, 8, overflow_mode=OverflowMode.SAT_ZERO)
# rounding per-layer formats (order-sensitive through RND_CONV ties)
RL = (qformat(9, 6, round_mode=RoundMode.RND_CONV),
      qformat(10, 5, round_mode=RoundMode.RND_CONV,
              overflow_mode=OverflowMode.SAT_TCPL))


def test_split_geometry():
    # k = tp * 2^s exactly: one subtree per device, no padding
    assert _k_tree_split(512, 8) == (6, 1, 64, 8)
    # tp | k, chunk not a power of two
    assert _k_tree_split(24, 4) == (2, 2, 8, 6)
    # odd k: degenerate split (products gather)
    assert _k_tree_split(17, 8) == (0, 3, 3, 17)
    # k < tp
    assert _k_tree_split(3, 8) == (0, 1, 1, 3)


@pytest.mark.parametrize("k", [64, 256])
def test_k_tree_saturating_pow2(k):
    """k = tp * 2^s: each device folds exactly one subtree (the q==1
    qgemul path)."""
    mesh = make_mesh(dp=1, tp=8)
    a = rand(F88Z, (4, k), seed=k)
    b = rand(F88Z, (k, 6), seed=k + 1)
    ref = qgemul(a, b, F88Z, add_formats=(F88Z,))
    got = sharded_qgemul_k_tree(a, b, F88Z, mesh, add_formats=(F88Z,))
    assert_match(got, ref)


@pytest.mark.parametrize("k", [24, 40, 48])
def test_k_tree_multi_subtree(k):
    """tp | k but the per-device chunk holds several subtrees (q > 1
    layered local fold), possibly with node padding."""
    mesh = make_mesh(dp=2, tp=4)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (5, k), seed=k)
    b = rand(f, (k, 7), seed=k + 1)
    ref = qgemul(a, b, f, add_formats=RL)
    got = sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL)
    assert_match(got, ref)


@pytest.mark.parametrize("k", [17, 20, 52, 100])
def test_k_tree_ragged_k(k):
    """k not divisible by tp (incl. odd k): padded node slots slice off,
    top-fold odd-tail conversions reproduce the global tree."""
    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (3, k), seed=k)
    b = rand(f, (k, 5), seed=k + 2)
    ref = qgemul(a, b, f, add_formats=RL)
    got = sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL)
    assert_match(got, ref)


def test_k_tree_default_merger_formats():
    """Empty add_formats: AddMerger default inference per layer must match
    the single-chip tree (format evolution crosses the split level)."""
    mesh = make_mesh(dp=1, tp=8)
    f = qformat(3, 4)
    out = qformat(5, 4, round_mode=RoundMode.RND_POS_INF)
    a = rand(f, (4, 32), seed=201)
    b = rand(f, (32, 4), seed=202)
    ref = qgemul(a, b, out)
    got = sharded_qgemul_k_tree(a, b, out, mesh)
    assert_match(got, ref)


def test_k_tree_mul_quantized_products():
    """Per-product mul_to quantization (rounding at the product step)."""
    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4)
    mul = qformat(6, 5, round_mode=RoundMode.RND_INF)
    out = qformat(7, 5, overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (4, 64), seed=301)
    b = rand(f, (64, 4), seed=302)
    ref = qgemul(a, b, out, mul_to=mul, add_formats=(out,))
    got = sharded_qgemul_k_tree(a, b, out, mesh, mul_to=mul,
                                add_formats=(out,))
    assert_match(got, ref)


def test_k_tree_pair_storage_nodes():
    """Order-sensitive config whose node values live in (hi, lo) pair
    storage: the gather and top fold ride the pair leaves."""
    mesh = make_mesh(dp=2, tp=4)
    f = qformat(15, 10)                      # int32 lanes
    wide = qformat(40, 20)                   # pair-storage layer format
    out = qformat(20, 10, round_mode=RoundMode.RND_CONV,
                  overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (3, 32), seed=401)
    b = rand(f, (32, 3), seed=402)
    # rounding final cast keeps it order-sensitive enough to skip the
    # proof strategies when using shifted-down layer formats
    ref = qgemul(a, b, out, add_formats=(wide, qformat(30, 12)))
    got = sharded_qgemul_k_tree(a, b, out, mesh,
                                add_formats=(wide, qformat(30, 12)))
    assert_match(got, ref)


def test_k_tree_epilogue_lut():
    from qublas_tpu import anus

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(3, 4)
    out = qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO)
    table = anus.build_table(anus.sqrt_func, out, qformat(4, 3))
    a = rand(f, (4, 32), seed=501)
    b = rand(f, (32, 4), seed=502)
    ref = qgemul(a, b, out, add_formats=(out,), epilogue_lut=table,
                 use_pallas=False)
    got = sharded_qgemul_k_tree(a, b, out, mesh, add_formats=(out,),
                                epilogue_lut=table)
    assert_match(got, ref)


def test_auto_picks_k_tree_for_order_sensitive():
    """shard_qgemul auto routes deep-split order-sensitive configs to
    k_tree (round-5 wiring) and still falls back to mn for shallow
    splits."""
    mesh = make_mesh(dp=1, tp=8)
    a = rand(F88Z, (4, 64), seed=601)
    b = rand(F88Z, (64, 4), seed=602)
    ref = qgemul(a, b, F88Z, add_formats=(F88Z,))
    got = shard_qgemul(a, b, F88Z, mesh, add_formats=(F88Z,))
    assert_match(got, ref)
    # odd k -> s=0 -> shallow -> mn fallback still bit-exact
    a2 = rand(F88Z, (8, 27), seed=603)
    b2 = rand(F88Z, (27, 8), seed=604)
    ref2 = qgemul(a2, b2, F88Z, add_formats=(F88Z,))
    got2 = shard_qgemul(a2, b2, F88Z, mesh, add_formats=(F88Z,))
    assert_match(got2, ref2)


# ---------------------------------------------------------------------------
# Order-sensitive Qreduce K-sharding (the reduce analogue)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [64, 40, 17, 100])
def test_k_tree_reduce_order_sensitive(n):
    from qublas_tpu.ops.reduce import qreduce
    from qublas_tpu.parallel import sharded_qreduce_k_tree

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    x = rand(f, (n,), seed=700 + n)
    ref = qreduce(x, RL)
    got = sharded_qreduce_k_tree(x, RL, mesh=mesh)
    assert_match(got, ref)


def test_k_tree_reduce_default_formats_and_pair():
    from qublas_tpu.ops.reduce import qreduce
    from qublas_tpu.parallel import sharded_qreduce_k_tree

    mesh = make_mesh(dp=2, tp=4)
    # AddMerger default chain (no formats)
    f = qformat(3, 4)
    x = rand(f, (32,), seed=801)
    assert_match(sharded_qreduce_k_tree(x, mesh=mesh), qreduce(x))
    # pair-storage node values (wide layer format, rounding later)
    f2 = qformat(15, 10)
    layers = (qformat(40, 12, round_mode=RoundMode.RND_CONV),)
    x2 = rand(f2, (24,), seed=802)
    assert_match(sharded_qreduce_k_tree(x2, layers, mesh=mesh),
                 qreduce(x2, layers))


# ---------------------------------------------------------------------------
# Order-sensitive COMPLEX GEMM K-sharding (the complex analogue)
# ---------------------------------------------------------------------------

def _cops(m, k, n, f, seeds):
    from qublas_tpu.complex import QComplexTensor

    return (QComplexTensor(rand(f, (m, k), seeds[0]),
                           rand(f, (m, k), seeds[1])),
            QComplexTensor(rand(f, (k, n), seeds[2]),
                           rand(f, (k, n), seeds[3])))


@pytest.mark.parametrize("algo,k", [("basic", 32), ("tf", 32),
                                    ("basic", 21), ("tf", 40)])
def test_k_tree_cgemul_order_sensitive(algo, k):
    from qublas_tpu.ops.cgemm import cgemul
    from qublas_tpu.parallel import sharded_cgemul_k_tree

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    out = (qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO),
           qformat(5, 3, round_mode=RoundMode.RND_CONV))
    a, b = _cops(3, k, 4, f, (900, 901, 902, 903))
    kw = dict(algo=algo, add_formats=(qformat(6, 4),))
    ref = cgemul(a, b, out, **kw)
    got = sharded_cgemul_k_tree(a, b, out, mesh, **kw)
    assert_match(got.real, ref.real)
    assert_match(got.imag, ref.imag)


def test_k_tree_cgemul_auto_picks_when_mn_infeasible():
    """auto: order-sensitive complex config with n < tp routes to k_tree
    (mn cannot shard the output)."""
    from qublas_tpu.ops.cgemm import cgemul
    from qublas_tpu.parallel import sharded_cgemul

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    a, b = _cops(3, 64, 3, f, (910, 911, 912, 913))
    ref = cgemul(a, b, (f, f), algo="tf")
    got = sharded_cgemul(a, b, (f, f), mesh, algo="tf")
    assert_match(got.real, ref.real)
    assert_match(got.imag, ref.imag)


def test_k_tree_cache_not_confused_by_swapped_dims():
    """Two calls with identical formats/k/mesh but different output dims
    must not reuse a stale-shape program (round-5 review: the cache key
    omitted m/n while the closure baked them in — the second call
    returned wrong values or crashed)."""
    from qublas_tpu.complex import QComplexTensor
    from qublas_tpu.ops.cgemm import cgemul
    from qublas_tpu.parallel import sharded_cgemul_k_tree

    mesh = make_mesh(dp=1, tp=8)
    # real GEMM, q>1 branch: (4,48)x(48,6) then (8,48)x(48,6)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    for m in (4, 8):
        a = rand(f, (m, 48), seed=950 + m)
        b = rand(f, (48, 6), seed=960 + m)
        got = sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL)
        assert_match(got, qgemul(a, b, f, add_formats=RL))
    # complex GEMM: swapped output dims
    for m, n in ((3, 4), (4, 3)):
        ca = QComplexTensor(rand(f, (m, 64), seed=970 + m),
                            rand(f, (m, 64), seed=971 + m))
        cb = QComplexTensor(rand(f, (64, n), seed=972 + n),
                            rand(f, (64, n), seed=973 + n))
        got = sharded_cgemul_k_tree(ca, cb, (f, f), mesh,
                                    add_formats=(qformat(6, 4),))
        ref = cgemul(ca, cb, (f, f), add_formats=(qformat(6, 4),))
        assert_match(got.real, ref.real)
        assert_match(got.imag, ref.imag)


def test_k_tree_butterfly_matches_gather_and_single_chip():
    """The ppermute-butterfly top fold (auto for one-subtree-per-device
    power-of-2 splits) must be bit-identical to both the all_gather form
    and the single-chip tree."""
    mesh = make_mesh(dp=1, tp=8)
    f = qformat(8, 8, overflow_mode=OverflowMode.SAT_ZERO)
    for k in (64, 512):
        a = rand(f, (4, k), seed=1000 + k)
        b = rand(f, (k, 6), seed=1001 + k)
        ref = qgemul(a, b, f, add_formats=RL)
        bf = sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL,
                                   butterfly=True)
        ag = sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL,
                                   butterfly=False)
        assert_match(bf, ref)
        assert_match(ag, ref)


def test_k_tree_butterfly_pair_nodes():
    """Butterfly exchange/select on (hi, lo) pair node values."""
    mesh = make_mesh(dp=2, tp=4)
    f = qformat(15, 10)
    layers = (qformat(40, 12, round_mode=RoundMode.RND_CONV),
              qformat(42, 10))
    out = qformat(20, 8, overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (3, 32), seed=1100)
    b = rand(f, (32, 3), seed=1101)
    ref = qgemul(a, b, out, add_formats=layers)
    got = sharded_qgemul_k_tree(a, b, out, mesh, add_formats=layers,
                                butterfly=True)
    assert_match(got, ref)


def test_k_tree_cgemul_butterfly_and_local_fast():
    """q==1 complex splits run the local fold as a single-chip cgemul and
    the top levels as the per-part butterfly — bit-identical to gather
    form and single-chip, for both algos, incl. a locally-lossless config
    (the local cgemul takes its fast path)."""
    from qublas_tpu.complex import QComplexTensor
    from qublas_tpu.ops.cgemm import cgemul
    from qublas_tpu.parallel import sharded_cgemul_k_tree

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    out = (f, qformat(5, 3, round_mode=RoundMode.RND_CONV))
    for algo in ("basic", "tf"):
        a, b = _cops(3, 64, 4, f, (1200, 1201, 1202, 1203))
        kw = dict(algo=algo, add_formats=(qformat(6, 4),))
        ref = cgemul(a, b, out, **kw)
        for bf in (True, False):
            got = sharded_cgemul_k_tree(a, b, out, mesh, butterfly=bf,
                                        **kw)
            assert_match(got.real, ref.real)
            assert_match(got.imag, ref.imag)
    # locally-lossless wide-layer config: local cgemul hits its fast path
    f2 = qformat(3, 4)
    wide = qformat(20, 8)
    mid = qformat(5, 4)
    out2 = (qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO),) * 2
    kw2 = dict(algo="tf", add_formats=(qformat(9, 8),), ab=mid, cd=mid,
               ba=mid, abc=wide, cdb=wide, bad=wide, AB=wide, BC=wide)
    a2, b2 = _cops(3, 64, 4, f2, (1210, 1211, 1212, 1213))
    ref2 = cgemul(a2, b2, out2, **kw2)
    got2 = sharded_cgemul_k_tree(a2, b2, out2, mesh, **kw2)
    assert_match(got2.real, ref2.real)
    assert_match(got2.imag, ref2.imag)


def test_k_tree_reduce_butterfly():
    from qublas_tpu.ops.reduce import qreduce
    from qublas_tpu.parallel import sharded_qreduce_k_tree

    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    x = rand(f, (64,), seed=1300)
    ref = qreduce(x, RL)
    for bf in (True, False):
        got = sharded_qreduce_k_tree(x, RL, mesh=mesh, butterfly=bf)
        assert_match(got, ref)


def test_butterfly_true_raises_outside_gate():
    """butterfly=True must never silently downgrade to the gather
    (round-5 review): a non-qualifying split raises."""
    mesh = make_mesh(dp=1, tp=8)
    f = qformat(4, 4, overflow_mode=OverflowMode.SAT_ZERO)
    a = rand(f, (3, 21), seed=1400)       # ragged k -> s=0
    b = rand(f, (21, 4), seed=1401)
    with pytest.raises(ValueError):
        sharded_qgemul_k_tree(a, b, f, mesh, add_formats=RL,
                              butterfly=True)
