#!/usr/bin/env python3
"""Experiment (VERDICT r4 weak-2): batch the TF complex GEMM's three int16
matmuls into ONE ``dot_general`` with a batch dim of 3, with the stage
shifts/combines fused after it — vs the current three-dispatch form, vs the
3x-int16-matmul floor.  Device-trace timed, carry-tied, interleaved.

Run on the real chip:  python tools/exp_cgemm_batch.py
Prints one JSON line per arm + a verdict line.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from qublas_tpu.complex import QComplexTensor
from qublas_tpu.ops.cgemm import cgemul
from qublas_tpu.ops.wideint import requantize_i32
from qublas_tpu.qformat import OverflowMode, qformat
from qublas_tpu.qtensor import QTensor
from qublas_tpu.utils.profiling import device_busy

F = qformat(3, 4)
WIDE = qformat(20, 8)
MID = qformat(5, 4)
OUT = (qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO),) * 2
CKW = dict(algo="tf", add_formats=(WIDE,), ab=MID, cd=MID, ba=MID,
           abc=WIDE, cdb=WIDE, bad=WIDE, AB=WIDE, BC=WIDE)


def tf_batched(ar, ai, br, bi):
    """The TF fast path for this config with ONE batched int16 dot_general.

    For (far=fai=fbr=fbi)=(3,4), ab/cd/ba=(5,4), abc..=(20,8), layers
    (20,8): the elementwise sums S1=ar+ai, S2=br+bi, S3=ai-ar fit int16;
    fA=fB=fC=8=fin frac, so every combine shift is 0 and
    re = dA - dB, im = dB - dC, one requantize into OUT.
    """
    a16 = (ar.astype(jnp.int16), ai.astype(jnp.int16))
    b16 = (br.astype(jnp.int16), bi.astype(jnp.int16))
    S1 = a16[0] + a16[1]
    S2 = b16[0] + b16[1]
    S3 = a16[1] - a16[0]
    L = jnp.stack([S1, a16[1], S3])          # [3, m, k] int16
    R = jnp.stack([b16[0], S2, b16[1]])      # [3, k, n] int16
    dots = jax.lax.dot_general(
        L, R, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)    # [3, m, n]
    dA, dB, dC = dots[0], dots[1], dots[2]
    re = dA - dB
    im = dB - dC
    rr = requantize_i32(re, 8, OUT[0]).astype(jnp.int8)
    ri = requantize_i32(im, 8, OUT[1]).astype(jnp.int8)
    return rr, ri


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    m = n = k = 2048
    rng = np.random.RandomState(0)

    def raws(shape):
        return jnp.asarray(rng.randint(F.raw_min, F.raw_max + 1, shape,
                                       dtype=np.int64).astype(np.int8))

    ar, ai, br, bi = raws((m, k)), raws((m, k)), raws((k, n)), raws((k, n))

    # --- correctness: batched == production bits (small shapes) -----------
    sar, sai = raws((8, 32)), raws((8, 32))
    sbr, sbi = raws((32, 8)), raws((32, 8))
    ref = cgemul(QComplexTensor(QTensor(sar, F), QTensor(sai, F)),
                 QComplexTensor(QTensor(sbr, F), QTensor(sbi, F)),
                 OUT, **CKW)
    gr, gi = jax.jit(tf_batched)(sar, sai, sbr, sbi)
    ok = (np.array_equal(np.asarray(gr), np.asarray(ref.real.raw())) and
          np.array_equal(np.asarray(gi), np.asarray(ref.imag.raw())))
    print(json.dumps({"check": "batched_bits_equal_production", "ok": ok}),
          flush=True)
    assert ok

    # --- arms: chained in-jit, EVERY a-side operand carry-tied ------------
    RG = 8

    @jax.jit
    def prod_arm(x, _unused):
        def body(i, acc):
            xt, ait, _ = jax.lax.optimization_barrier((x, ai, acc))
            c = cgemul(QComplexTensor(QTensor(xt, F), QTensor(ait, F)),
                       QComplexTensor(QTensor(br, F), QTensor(bi, F)),
                       OUT, **CKW)
            # consume BOTH parts: an unused imag lets XLA DCE the
            # imag-only matmuls and the arm times fewer dots than claimed
            return acc + c.real.data.astype(jnp.int32) \
                + c.imag.data.astype(jnp.int32)
        return jax.lax.fori_loop(0, RG, body, jnp.zeros((m, n), jnp.int32))

    @jax.jit
    def batch_arm(x, _unused):
        def body(i, acc):
            xt, ait, _ = jax.lax.optimization_barrier((x, ai, acc))
            rr, ri = tf_batched(xt, ait, br, bi)
            return acc + rr.astype(jnp.int32) + ri.astype(jnp.int32)
        return jax.lax.fori_loop(0, RG, body, jnp.zeros((m, n), jnp.int32))

    br16, bi16 = br.astype(jnp.int16), bi.astype(jnp.int16)

    @jax.jit
    def floor_arm(x, _unused):
        def body(i, acc):
            xt, ait, _ = jax.lax.optimization_barrier((x, ai, acc))
            xc, ac = xt.astype(jnp.int16), ait.astype(jnp.int16)
            d1 = jnp.matmul(xc, br16, preferred_element_type=jnp.int32)
            d2 = jnp.matmul(ac, br16, preferred_element_type=jnp.int32)
            d3 = jnp.matmul(xc, bi16, preferred_element_type=jnp.int32)
            return acc + d1 + d2 + d3
        return jax.lax.fori_loop(0, RG, body, jnp.zeros((m, n), jnp.int32))

    @jax.jit
    def floor8_arm(x, _unused):
        def body(i, acc):
            xt, ait, _ = jax.lax.optimization_barrier((x, ai, acc))
            d1 = jnp.matmul(xt, br, preferred_element_type=jnp.int32)
            d2 = jnp.matmul(ait, br, preferred_element_type=jnp.int32)
            d3 = jnp.matmul(ait, bi, preferred_element_type=jnp.int32)
            d4 = jnp.matmul(xt, bi, preferred_element_type=jnp.int32)
            return acc + d1 + d2 + d3 + d4
        return jax.lax.fori_loop(0, RG, body, jnp.zeros((m, n), jnp.int32))

    arms = {"production": prod_arm, "batched": batch_arm,
            "floor_3xint16": floor_arm, "floor_4xint8": floor8_arm}
    for name, fn in arms.items():
        t0 = time.time()
        np.asarray(fn(ar, None)[:8, :128])   # compile + warm
        print(f"compiled {name} in {time.time() - t0:.0f}s", flush=True)

    def dev_time(fn):
        p = device_busy(lambda: np.asarray(fn(ar, None)[:8, :128]))
        return (p["module_s"] / RG) if p and p.get("module_s") else None

    best = {name: float("inf") for name in arms}
    walls = {name: float("inf") for name in arms}
    for _ in range(3):                        # interleaved best-of
        for name, fn in arms.items():
            t = dev_time(fn)
            if t is not None:
                best[name] = min(best[name], t)
            t0 = time.perf_counter()
            np.asarray(fn(ar, None)[:8, :128])
            walls[name] = min(walls[name],
                              (time.perf_counter() - t0) / RG)

    timing = "device-trace" if best["production"] < float("inf") else "wall"
    if timing == "wall":
        best = walls
    ops = 3 * 2.0 * m * n * k
    for name in arms:
        print(json.dumps({
            "arm": name, "timing": timing,
            "iter_ms": round(best[name] * 1e3, 4),
            "gops": round(ops / best[name] / 1e9, 1),
        }), flush=True)
    print(json.dumps({
        "verdict": "batched_vs_production",
        "speedup": round(best["production"] / best["batched"], 4),
        "batched_vs_floor": round(best["floor_3xint16"] / best["batched"],
                                  4),
        "production_vs_floor16": round(best["floor_3xint16"]
                                       / best["production"], 4),
        "production_vs_floor8": round(best["floor_4xint8"]
                                      / best["production"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
