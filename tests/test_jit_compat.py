"""Device-path ops must be traceable under jax.jit / vmap (XLA semantics:
everything trace-time static except the raw data)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qublas_tpu import hostops
from qublas_tpu.ops import elementwise as ew
from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.ops.reduce import qreduce, qreduce_args
from qublas_tpu.qformat import OverflowMode, qformat
from qublas_tpu.qtensor import QTensor, from_raw

rng = np.random.RandomState(55)
F88Z = qformat(8, 8, overflow_mode=OverflowMode.SAT_ZERO)
F44 = qformat(4, 4)


def test_jit_elementwise_chain():
    a_raw = jnp.asarray(rng.randint(F44.raw_min, F44.raw_max + 1, 64),
                        dtype=jnp.int16)
    b_raw = jnp.asarray(rng.randint(F44.raw_min, F44.raw_max + 1, 64),
                        dtype=jnp.int16)

    @jax.jit
    def chain(x, y):
        a, b = QTensor(x, F44), QTensor(y, F44)
        return ew.qadd(ew.qmul(a, b), a, to=qformat(5, 3)).data

    got = np.asarray(chain(a_raw, b_raw))
    for x, y, g in zip(np.asarray(a_raw), np.asarray(b_raw), got):
        p = hostops.qmul((int(x), F44), (int(y), F44))
        want, _ = hostops.qadd(p, (int(x), F44), to=qformat(5, 3))
        assert int(g) == want


def test_jit_gemm_and_reduce():
    A = jnp.asarray(rng.randint(F88Z.raw_min, F88Z.raw_max + 1, (4, 6)),
                    dtype=jnp.int32)
    B = jnp.asarray(rng.randint(F88Z.raw_min, F88Z.raw_max + 1, (6, 4)),
                    dtype=jnp.int32)

    @jax.jit
    def f(a, b):
        c = qgemul(QTensor(a, F88Z), QTensor(b, F88Z), F88Z)
        r = qreduce(c, (qformat(10, 6),))
        return c.data, r.data

    c, r = f(A, B)
    c2 = qgemul(QTensor(A, F88Z), QTensor(B, F88Z), F88Z)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2.raw()))


def test_vmap_elementwise():
    a_raw = jnp.asarray(rng.randint(F44.raw_min, F44.raw_max + 1, (3, 16)),
                        dtype=jnp.int16)
    b_raw = jnp.asarray(rng.randint(F44.raw_min, F44.raw_max + 1, (3, 16)),
                        dtype=jnp.int16)

    def one(x, y):
        return ew.qmul(QTensor(x, F44), QTensor(y, F44)).data

    got = jax.vmap(one)(a_raw, b_raw)
    direct = ew.qmul(QTensor(a_raw, F44), QTensor(b_raw, F44)).data
    np.testing.assert_array_equal(np.asarray(got), np.asarray(direct))


def test_qtensor_pytree_through_jit():
    a = from_raw(rng.randint(F44.raw_min, F44.raw_max + 1, 8), F44)

    @jax.jit
    def f(t: QTensor) -> QTensor:
        return ew.qneg(t)

    out = f(a)
    assert isinstance(out, QTensor)
    assert out.fmt.int_bits == F44.int_bits + 1


def test_qreduce_args_variadic():
    vals = [from_raw(np.array(v, dtype=object), F44)
            for v in (3, -5, 10, 7, 2)]
    got = qreduce_args(vals, (qformat(5, 3),))
    want, wf = hostops.qreduce_args([(int(np.asarray(v.raw(), dtype=object)),
                                      F44) for v in vals], (qformat(5, 3),))
    assert int(np.asarray(got.raw(), dtype=object)) == want
    assert got.fmt == wf


def test_hybrid_gemm_jit_and_grad_free_transform():
    """The prefix-lossless hybrid GEMM dispatch is trace-compatible."""
    import jax
    import numpy as np

    from qublas_tpu.ops.gemm import qgemul
    from qublas_tpu.qformat import OverflowMode, qformat
    from qublas_tpu.qtensor import QTensor, from_raw

    fa = qformat(3, 4)
    mul_to = qformat(7, 8)
    layers = (qformat(8, 8), qformat(9, 8), qformat(10, 8), qformat(11, 8),
              qformat(6, 4, overflow_mode=OverflowMode.SAT_ZERO))
    out = qformat(5, 4)
    rng = np.random.RandomState(0)
    A = from_raw(rng.randint(fa.raw_min, fa.raw_max + 1, (4, 32)), fa)
    B = from_raw(rng.randint(fa.raw_min, fa.raw_max + 1, (32, 4)), fa)

    @jax.jit
    def f(ad, bd):
        return qgemul(QTensor(ad, fa), QTensor(bd, fa), out, mul_to=mul_to,
                      add_formats=layers).data

    eager = qgemul(A, B, out, mul_to=mul_to, add_formats=layers)
    np.testing.assert_array_equal(np.asarray(f(A.data, B.data)),
                                  np.asarray(eager.raw()))
