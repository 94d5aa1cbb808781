"""Multi-chip / multi-host sharded quantized GEMM.

The reference is a single-threaded header with no distribution of any kind
(SURVEY.md §2.19); these are the build-plan components mandated by
BASELINE.json's north star: tensor-sharded Qgemul operands across a TPU pod
slice with reduce-scatter / all-gather over ICI, and DP-style batched GEMM
streaming across hosts (DCN).

Design (scaling-book recipe): pick a `Mesh`, annotate shardings, let XLA
insert collectives.  Three strategies, chosen by bit-exactness constraints:

* ``"mn"`` — shard M over ``dp`` and N over ``tp``; A's rows and B's columns
  all-gather as needed by XLA.  **Always bit-exact**, including the
  order-sensitive quantized-accumulation configs, because every output
  element's full dot product is computed on one chip with the same tree
  order as the single-chip path.

* ``"k"`` — shard the contraction dim over ``tp``; each chip computes a
  partial int32 dot, partials combine with ``psum`` (all-reduce over ICI) or
  ``psum_scatter`` (reduce-scatter, N-sharded output), and the requantize
  epilogue runs on the summed value.  Valid **only** under an exactness
  proof (:func:`qublas_tpu.ops.gemm.exact_plan`): integer adds must be
  provably lossless so the cross-chip summation order cannot change bits.
  The proof is checked at trace time and the call falls back to ``"mn"``
  when it fails.

* ``"dp"`` — shard leading batch dims; each chip runs independent GEMMs
  (multi-host batch streaming).

All functions operate on :class:`~qublas_tpu.qtensor.QTensor` (a pytree), so
they compose with ``jax.jit`` / ``jax.shard_map`` like any array program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wideint as W
from ..ops.gemm import exact_plan, qgemul
from ..ops.widths import dtype_for
from ..qformat import QFormat, mul_merge
from ..qtensor import QTensor

__all__ = ["make_mesh", "shard_qgemul", "sharded_qgemul_k",
           "sharded_qgemul_k_pipelined", "sharded_qgemul_mn",
           "sharded_qgemul_dp", "init_distributed"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-host JAX runtime (DCN side of the BASELINE
    north star: "batched quantized GEMM streams continuously across hosts").

    On a TPU pod slice with the standard launcher env (TPU_WORKER_HOSTNAMES
    etc.) all arguments auto-detect; returns the global device count.  After
    this, :func:`make_mesh` over ``jax.devices()`` spans hosts — dp across
    DCN, tp across ICI — and the shard_map programs below run unchanged
    (XLA routes collectives over the right fabric per the mesh layout).
    """
    import jax

    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) device mesh.  ``tp`` defaults to all remaining
    devices.  On a multi-host pod slice ``jax.devices()`` spans hosts, so dp
    naturally maps across DCN and tp across ICI."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f"{len(devices)} devices != dp({dp}) * tp({tp})")
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def _device_put(t: QTensor, mesh: Mesh, spec: P) -> QTensor:
    return QTensor(jax.device_put(t.data, NamedSharding(mesh, spec)), t.fmt)


def shard_qgemul(a: QTensor, b: QTensor, out_fmt: QFormat, mesh: Mesh,
                 mul_to=None, add_formats=(), strategy: str = "auto",
                 **kw) -> QTensor:
    """Sharded C = A @ B.  See module docstring for strategy semantics."""
    if isinstance(add_formats, QFormat):
        add_formats = (add_formats,)
    add_formats = tuple(add_formats)
    if strategy == "auto":
        if a.ndim > 2:
            strategy = "dp"
        else:
            mul_fmt = mul_merge(a.fmt, b.fmt, mul_to,
                                kw.get("mul_full_prec", False))
            plan = exact_plan(a.fmt, b.fmt, mul_fmt, add_formats,
                              a.shape[-1])
            strategy = "k" if plan is not None else "mn"
    if strategy == "k":
        return sharded_qgemul_k(a, b, out_fmt, mesh, mul_to=mul_to,
                                add_formats=add_formats, **kw)
    if strategy == "k_pipelined":
        return sharded_qgemul_k_pipelined(a, b, out_fmt, mesh, mul_to=mul_to,
                                          add_formats=add_formats, **kw)
    if strategy == "mn":
        return sharded_qgemul_mn(a, b, out_fmt, mesh, mul_to=mul_to,
                                 add_formats=add_formats, **kw)
    if strategy == "dp":
        return sharded_qgemul_dp(a, b, out_fmt, mesh, mul_to=mul_to,
                                 add_formats=add_formats, **kw)
    raise ValueError(f"unknown strategy {strategy!r}")


# ---------------------------------------------------------------------------
# M/N sharding — bit-exact for every config
# ---------------------------------------------------------------------------

def sharded_qgemul_mn(a: QTensor, b: QTensor, out_fmt: QFormat, mesh: Mesh,
                      mul_to=None, add_formats=(), **kw) -> QTensor:
    """Shard M over dp, N over tp; each chip computes full dot products for
    its output tile, so any accumulation config stays bit-exact."""
    a = _device_put(a, mesh, P("dp", None))
    b = _device_put(b, mesh, P(None, "tp"))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("dp", None), P(None, "tp")),
             out_specs=P("dp", "tp"))
    def block(ad, bd):
        return qgemul(QTensor(ad, a.fmt), QTensor(bd, b.fmt), out_fmt,
                      mul_to=mul_to, add_formats=add_formats, **kw).data

    return QTensor(block(a.data, b.data), out_fmt)


# ---------------------------------------------------------------------------
# K sharding — exactness-proof regime; psum/reduce-scatter over ICI
# ---------------------------------------------------------------------------

def sharded_qgemul_k(a: QTensor, b: QTensor, out_fmt: QFormat, mesh: Mesh,
                     mul_to=None, add_formats=(), mul_full_prec=False,
                     reduce_scatter: bool = False, **kw) -> QTensor:
    """Shard the contraction dim over ``tp``.  Each chip computes a partial
    int32 dot on its K-slice (MXU), then partials sum over ICI — ``psum``
    (output replicated over tp) or ``psum_scatter`` (reduce-scatter, output
    N-sharded over tp, the TP-style layout that feeds a subsequent
    K-sharded GEMM).  The requantize epilogue runs *after* the collective,
    overlapping XLA's collective pipelining with the next tile's compute.

    Requires the lossless-accumulation proof; raises otherwise (the caller
    or :func:`shard_qgemul` should fall back to ``"mn"``).
    """
    k = a.shape[-1]
    tp = mesh.shape["tp"]
    mul_fmt = mul_merge(a.fmt, b.fmt, mul_to, mul_full_prec)
    plan = exact_plan(a.fmt, b.fmt, mul_fmt, add_formats, k)
    if plan is None:
        raise ValueError(
            "K-sharding needs a lossless accumulation proof; this config's "
            "tree is order-sensitive — use strategy='mn'")
    if not plan.dot_interval.fits32:
        raise ValueError("dot interval exceeds int32; use strategy='mn'")
    if k % tp:
        raise ValueError(f"K={k} not divisible by tp={tp}")

    a = _device_put(a, mesh, P(None, "tp"))
    b = _device_put(b, mesh, P("tp", None))
    out_dtype = dtype_for(out_fmt)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, "tp"), P("tp", None)),
             out_specs=P(None, "tp") if reduce_scatter else P(None, None))
    def block(ad, bd):
        x = ad if ad.dtype == jnp.int8 else ad.astype(jnp.int32)
        y = bd if bd.dtype == jnp.int8 else bd.astype(jnp.int32)
        partial_dot = jnp.matmul(x, y, preferred_element_type=jnp.int32)
        if reduce_scatter:
            dot = jax.lax.psum_scatter(partial_dot, "tp", scatter_dimension=1,
                                       tiled=True)
        else:
            dot = jax.lax.psum(partial_dot, "tp")
        raw = W.requantize_i32(dot, plan.prod_frac, out_fmt)
        return raw.astype(out_dtype)

    return QTensor(block(a.data, b.data), out_fmt)


def sharded_qgemul_k_pipelined(a: QTensor, b: QTensor, out_fmt: QFormat,
                               mesh: Mesh, mul_to=None, add_formats=(),
                               mul_full_prec=False) -> QTensor:
    """K-sharded GEMM as a *decomposed reduce-scatter matmul*: the ICI
    transfer overlaps the MXU compute (SURVEY.md §7 hard part 5).

    Each of the ``tp`` steps computes one output N-block's partial dot while
    the accumulator ring-rotates via ``ppermute`` — XLA schedules the async
    collective-permute of step *i* concurrently with the matmul of step
    *i+1*, hiding the interconnect latency instead of serializing a bulk
    ``psum`` after all compute (the classic latency-hiding collective
    matmul from the scaling playbook).  At step ``i`` device ``d`` computes
    the block destined to land on device ``d`` after the remaining
    ``tp-1-i`` rotations.

    Output is N-sharded over ``tp`` (reduce-scatter layout).  Same
    exactness-proof requirement as :func:`sharded_qgemul_k`.
    """
    k = a.shape[-1]
    tp = mesh.shape["tp"]
    n = b.shape[-1]
    mul_fmt = mul_merge(a.fmt, b.fmt, mul_to, mul_full_prec)
    plan = exact_plan(a.fmt, b.fmt, mul_fmt, add_formats, k)
    if plan is None or not plan.dot_interval.fits32:
        raise ValueError(
            "pipelined K-sharding needs a lossless accumulation proof; "
            "use strategy='mn' for order-sensitive configs")
    if k % tp or n % tp:
        raise ValueError(f"K={k} and N={n} must divide tp={tp}")
    bn = n // tp
    a = _device_put(a, mesh, P(None, "tp"))
    b = _device_put(b, mesh, P("tp", None))
    out_dtype = dtype_for(out_fmt)
    perm = [(j, (j + 1) % tp) for j in range(tp)]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, "tp"), P("tp", None)),
             out_specs=P(None, "tp"))
    def block(ad, bd):
        x = ad if ad.dtype == jnp.int8 else ad.astype(jnp.int32)
        y = bd if bd.dtype == jnp.int8 else bd.astype(jnp.int32)
        idx = jax.lax.axis_index("tp")
        m_loc = x.shape[0]
        acc = jnp.zeros((m_loc, bn), dtype=jnp.int32)
        for i in range(tp):
            blk = (idx + tp - 1 - i) % tp
            yb = jax.lax.dynamic_slice_in_dim(y, blk * bn, bn, axis=1)
            p = jnp.matmul(x, yb, preferred_element_type=jnp.int32)
            acc = jax.lax.ppermute(acc, "tp", perm) + p
        raw = W.requantize_i32(acc, plan.prod_frac, out_fmt)
        return raw.astype(out_dtype)

    return QTensor(block(a.data, b.data), out_fmt)


# ---------------------------------------------------------------------------
# DP batch sharding — multi-host batched GEMM streaming
# ---------------------------------------------------------------------------

def sharded_qgemul_dp(a: QTensor, b: QTensor, out_fmt: QFormat, mesh: Mesh,
                      mul_to=None, add_formats=(), **kw) -> QTensor:
    """Shard the leading batch dim over the whole mesh (dp×tp): each chip
    runs independent GEMMs on its batch slice — the DCN streaming pattern
    (BASELINE north star: "batched quantized GEMM streams continuously
    across hosts")."""
    if a.ndim < 3:
        raise ValueError("dp strategy needs a batched LHS [batch, m, k]")
    axes = ("dp", "tp")
    spec_a = P(axes, *([None] * (a.ndim - 1)))
    spec_b = P(axes, *([None] * (b.ndim - 1))) if b.ndim == a.ndim else \
        P(*([None] * b.ndim))
    a = _device_put(a, mesh, spec_a)
    b = _device_put(b, mesh, spec_b)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec_a, spec_b),
             out_specs=spec_a)
    def block(ad, bd):
        return qgemul(QTensor(ad, a.fmt), QTensor(bd, b.fmt), out_fmt,
                      mul_to=mul_to, add_formats=add_formats, **kw).data

    return QTensor(block(a.data, b.data), out_fmt)
