"""Pallas MXU kernel: integer GEMM with fused requantize epilogue.

The hot path of the framework (BASELINE.json: "INT8 Qgemul GOPS/chip vs MXU
roofline").  Used by :func:`qublas_tpu.ops.gemm.qgemul` when the exactness
proof holds (see :func:`~qublas_tpu.ops.gemm.exact_plan`): the dot runs as
int8×int8→int32 (or int32×int32) tiles on the MXU, accumulates in a VMEM
scratch across the K grid dimension, and the final K step applies the
shift-round-saturate epilogue (``requantize_i32`` — the same jnp program the
elementwise path uses, here executing on the VPU over the accumulator tile)
before writing the narrow output dtype back to HBM.  That keeps the int32
accumulator entirely in VMEM: one HBM write of int8 instead of int32 + a
second elementwise pass.

Grid iteration order is (M, N, K) with K innermost so the accumulator
scratch carries across consecutive grid steps (standard Pallas matmul
pipeline; the compiler double-buffers the A/B tile DMAs automatically).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qformat import QFormat
from ..qtensor import QTensor
from . import wideint as W
from .widths import dtype_for

__all__ = ["qgemul_fast", "should_use_pallas"]

# Default tile sizes: one MXU-friendly tile per grid step.  int8 native tiles
# are (32, 128); 128×128 blocks keep the MXU fed and divide evenly into the
# bench shapes.
_BM, _BN, _BK = 128, 128, 512


def should_use_pallas(a: QTensor, b: QTensor, out_fmt: QFormat) -> bool:
    """Gate for the Pallas kernel vs plain ``lax.dot_general``.

    Measured on TPU v5e (BENCH): XLA's int8 matmul with the requantize
    epilogue fused into its output stage reaches ~98% of the raw-matmul
    roofline, while this hand-tiled kernel reaches ~16% — XLA's matmul
    emitter (latency-hiding, native tiling) wins decisively when the
    epilogue is a fusable elementwise chain.  The kernel therefore stays
    opt-in (``QUBLAS_PALLAS=1``) as the basis for epilogues XLA cannot fuse.
    """
    if os.environ.get("QUBLAS_PALLAS", "0") != "1":
        return False
    if a.ndim != 2 or b.ndim != 2:
        return False
    m, k = a.shape
    _, n = b.shape
    if m % _BM or n % _BN or k % _BK:
        return False
    return True


def _epilogue_kernel(a_ref, b_ref, out_ref, acc_ref, *, prod_frac: int,
                     out_fmt: QFormat, out_dtype, nk: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk - 1)
    def _finish():
        raw = W.requantize_i32(acc_ref[:], prod_frac, out_fmt)
        out_ref[:] = raw.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("prod_frac", "out_fmt", "interpret"))
def _pallas_gemm(x, y, *, prod_frac: int, out_fmt: QFormat,
                 interpret: bool = False):
    m, k = x.shape
    _, n = y.shape
    out_dtype = dtype_for(out_fmt)
    nk = k // _BK
    kernel = functools.partial(
        _epilogue_kernel, prod_frac=prod_frac, out_fmt=out_fmt,
        out_dtype=out_dtype, nk=nk)
    flops = 2 * m * n * k
    return pl.pallas_call(
        kernel,
        grid=(m // _BM, n // _BN, nk),
        in_specs=[
            pl.BlockSpec((_BM, _BK), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, _BN), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((_BM, _BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(m * k * x.dtype.itemsize
                            + k * n * y.dtype.itemsize
                            + m * n * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, y)


def qgemul_fast(a: QTensor, b: QTensor, out_fmt: QFormat, plan,
                interpret: Optional[bool] = None) -> QTensor:
    """Exact-accumulation GEMM as a Pallas kernel (caller supplies the
    :class:`~qublas_tpu.ops.gemm.ExactPlan` proof)."""
    if a.ndim != 2 or b.ndim != 2 or a.shape[0] % _BM \
            or b.shape[1] % _BN or a.shape[1] % _BK:
        # the grid floor-divides by the tile sizes: remainder tiles would
        # simply never be written (uninitialized output, no error) — a
        # forced use_pallas=True must fail loudly instead
        raise ValueError(
            f"Pallas GEMM needs 2-D operands with shapes divisible by "
            f"tiles ({_BM}, {_BK}) x ({_BK}, {_BN}); got "
            f"{a.shape} @ {b.shape} — use use_pallas=False/None")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x, y = a.data, b.data
    if x.dtype != jnp.int8 or y.dtype != jnp.int8:
        x = x.astype(jnp.int32)
        y = y.astype(jnp.int32)
    raw = _pallas_gemm(x, y, prod_frac=plan.prod_frac, out_fmt=out_fmt,
                       interpret=interpret)
    return QTensor(raw, out_fmt)
