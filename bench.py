#!/usr/bin/env python3
"""Headline benchmark: INT8 Qgemul throughput vs the MXU roofline.

Prints ONE JSON line:
  {"metric": "int8_qgemul_gops", "value": N, "unit": "GOP/s", "vs_baseline": R}

``vs_baseline`` is the fraction of the chip's *measured* integer-matmul
speed-of-light: the same shape run as a raw ``jnp.matmul`` int8×int8→int32
with no requantization — the hardware ceiling for this op on this chip
(BASELINE.md: the reference publishes no numbers; the bar is "≥90% of MXU
speed-of-light").  The quantized GEMM must add its fused
shift-round-saturate epilogue without falling off that ceiling.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("QUBLAS_PALLAS", "auto")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qublas_tpu.ops.gemm import exact_plan, qgemul  # noqa: E402
from qublas_tpu.qformat import OverflowMode, qformat  # noqa: E402
from qublas_tpu.qtensor import QTensor  # noqa: E402

M = N = K = 4096
ITERS = 128

FA = qformat(3, 4)  # int8 storage: the INT8 Qgemul config
WIDE = qformat(20, 8)  # lossless int32 accumulation (proof-checked below)
OUT = qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO)


def _time(fn, a, b, iters=ITERS):
    """Time with a data dependency chaining iterations (the output feeds the
    next call's LHS) and a small *array* fetch at the end.

    On the tunneled TPU backend ``block_until_ready`` returns before the
    device work completes and scalar-returning programs hang, so the only
    honest synchronization is materializing a slice of the final chained
    output; the fixed round-trip cost (~25 ms) amortizes over ``iters``.
    """
    out = fn(a, b)
    np.asarray(out[:8, :128])  # warm-up + sync
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = fn(x, b)
    np.asarray(x[:8, :128])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    a_raw = jnp.asarray(
        rng.randint(FA.raw_min, FA.raw_max + 1, size=(M, K), dtype=np.int64)
        .astype(np.int8))
    b_raw = jnp.asarray(
        rng.randint(FA.raw_min, FA.raw_max + 1, size=(K, N), dtype=np.int64)
        .astype(np.int8))
    a = QTensor(a_raw, FA)
    b = QTensor(b_raw, FA)

    plan = exact_plan(FA, FA, WIDE, (WIDE,), K)
    assert plan is not None, "bench config must be on the MXU fast path"

    @jax.jit
    def quantized(a_data, b_data):
        return qgemul(QTensor(a_data, FA), QTensor(b_data, FA), OUT,
                      mul_to=WIDE, add_formats=(WIDE,)).data

    @jax.jit
    def roofline(a_data, b_data):
        # minimal int8 epilogue so the output can chain back as the next LHS
        return jnp.matmul(a_data, b_data,
                          preferred_element_type=jnp.int32).astype(jnp.int8)

    t_q = _time(quantized, a_raw, b_raw)
    t_r = _time(roofline, a_raw, b_raw)

    ops = 2.0 * M * N * K
    gops = ops / t_q / 1e9
    roof_gops = ops / t_r / 1e9
    print(json.dumps({
        "metric": "int8_qgemul_gops",
        "value": round(gops, 2),
        "unit": "GOP/s",
        "vs_baseline": round(gops / roof_gops, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
