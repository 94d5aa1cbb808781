"""Round-3 review regressions (VERDICT r2 weak/missing items)."""

import numpy as np
import pytest

from qublas_tpu import from_raw, qformat
from qublas_tpu.qformat import OverflowMode


# ---------------------------------------------------------------------------
# VERDICT r2 weak-6: _PROBE_CACHE must be LRU-bounded (probe keys include
# operand shapes, so shape churn in a long-lived process grew it unbounded)
# ---------------------------------------------------------------------------

def test_probe_cache_bounded(monkeypatch):
    from qublas_tpu.parallel import sharding as sh

    monkeypatch.setattr(sh, "_PROBE_CACHE", sh._LRU(8))
    for i in range(100):
        sh._probe_cache_put(("shape", i), bool(i % 2))
    assert len(sh._PROBE_CACHE) <= 8
    # most recent keys survive
    assert sh._probe_cache_get(("shape", 99)) is not None
    assert sh._probe_cache_get(("shape", 0)) is None


def test_probe_cache_lru_recency(monkeypatch):
    from qublas_tpu.parallel import sharding as sh

    monkeypatch.setattr(sh, "_PROBE_CACHE", sh._LRU(4))
    for i in range(4):
        sh._probe_cache_put(i, True)
    # touch 0 -> it becomes most recent; inserting 2 more evicts 1 and 2
    assert sh._probe_cache_get(0) is True
    sh._probe_cache_put(4, False)
    sh._probe_cache_put(5, True)
    assert sh._probe_cache_get(0) is True
    assert sh._probe_cache_get(1) is None
    assert sh._probe_cache_get(2) is None
    # negative verdicts are cached values, not misses
    assert sh._probe_cache_get(4) is False


def test_probe_cache_shape_churn_via_public_path(monkeypatch):
    """Shape churn through _check_traceable stays bounded."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from qublas_tpu.parallel import sharding as sh

    monkeypatch.setattr(sh, "_PROBE_CACHE", sh._LRU(4))
    f40 = qformat(30, 9)                       # pair storage -> probe runs
    out = qformat(33, 9)
    rng = np.random.RandomState(0)
    for k in (8, 12, 16, 20, 24, 28):
        a = from_raw(rng.randint(-(1 << 39), 1 << 39, (2, k),
                                 dtype=np.int64).astype(object), f40)
        b = from_raw(rng.randint(-128, 128, (k, 2)).astype(object),
                     qformat(8, 8))
        sh._check_traceable(a[0:1, :], b[:, 0:1], out, None, (), {}, "test")
    assert len(sh._PROBE_CACHE) <= 4
