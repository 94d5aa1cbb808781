#!/usr/bin/env python3
"""Experiment (VERDICT r4 weak-1 / item 3): apply the 256-entry ANUS ROM as
a compare-generated one-hot int8 MXU contraction fused into the GEMM
epilogue, vs the production packed select tree, vs the plain GEMM.

The mapping: idx in [0,256) -> onehot[idx, 256] int8 (compare vs iota),
result = onehot @ table[256] as an int8 dot_general.  2*256 MXU ops per
element replace 63 VPU selects — but the one-hot GENERATION is 256 VPU
byte-compares per element, so the outcome is an empirical question of
what XLA fuses.  Device-trace timed, carry-tied, interleaved.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from qublas_tpu.anus import build_table, rsqrt_func
from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.qformat import OverflowMode, qformat
from qublas_tpu.qtensor import QTensor
from qublas_tpu.utils.profiling import device_busy

FA = qformat(3, 4)
WIDE = qformat(20, 8)
OUT = qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    m = n = k = 2048
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(FA.raw_min, FA.raw_max + 1, (m, k),
                                dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.randint(FA.raw_min, FA.raw_max + 1, (k, n),
                                dtype=np.int64).astype(np.int8))
    table = build_table(rsqrt_func, OUT, OUT)
    tbl_np = table._np_table
    assert tbl_np.min() >= -128 and tbl_np.max() <= 127
    tbl8 = jnp.asarray(tbl_np.astype(np.int8))          # [256]
    iota = jnp.arange(256, dtype=jnp.int32)

    def onehot_apply(c):                                # c: int8 [m, n]
        idx = c.astype(jnp.int32) & 0xFF
        oh = (idx[..., None] == iota).astype(jnp.int8)  # [m, n, 256]
        v = jax.lax.dot_general(
            oh, tbl8, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)           # [m, n]
        return v.astype(jnp.int8)

    # correctness vs the production select tree
    small = jnp.asarray(rng.randint(-128, 128, (64, 64),
                                    dtype=np.int64).astype(np.int8))
    want = table(QTensor(small, OUT)).data
    got = jax.jit(onehot_apply)(small)
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(json.dumps({"check": "onehot_bits_equal_select_tree",
                      "ok": bool(ok)}), flush=True)
    assert ok

    RG = 8

    def make(kind):
        @jax.jit
        def f(x, _u):
            def body(i, acc):
                xt, _ = jax.lax.optimization_barrier((x, acc))
                c = qgemul(QTensor(xt, FA), QTensor(b, FA), OUT,
                           mul_to=WIDE, add_formats=(WIDE,),
                           epilogue_lut=table if kind == "select" else None)
                raw = c.data
                if kind == "onehot":
                    raw = onehot_apply(raw)
                return acc + raw.astype(jnp.int32)
            return jax.lax.fori_loop(0, RG, body,
                                     jnp.zeros((m, n), jnp.int32))
        return f

    arms = {"plain": make("plain"), "lut_select_tree": make("select"),
            "lut_onehot_mxu": make("onehot")}
    for name, fn in arms.items():
        t0 = time.time()
        np.asarray(fn(a, None)[:8, :128])
        print(f"compiled {name} in {time.time() - t0:.0f}s", flush=True)

    def dev_time(fn):
        p = device_busy(lambda: np.asarray(fn(a, None)[:8, :128]))
        return (p["module_s"] / RG) if p and p.get("module_s") else None

    best = {nm: float("inf") for nm in arms}
    for _ in range(3):
        for nm, fn in arms.items():
            t = dev_time(fn)
            if t is not None:
                best[nm] = min(best[nm], t)

    for nm in arms:
        print(json.dumps({"arm": nm, "iter_ms": round(best[nm] * 1e3, 4)}),
              flush=True)
    print(json.dumps({
        "verdict": "lut_mappings_vs_plain",
        "select_tree_vs_plain": round(best["plain"]
                                      / best["lut_select_tree"], 4),
        "onehot_vs_plain": round(best["plain"] / best["lut_onehot_mxu"], 4),
        "onehot_vs_select": round(best["lut_select_tree"]
                                  / best["lut_onehot_mxu"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
