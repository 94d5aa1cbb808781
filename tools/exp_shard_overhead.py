#!/usr/bin/env python3
"""Measure the 1x1-mesh shard_map overhead vs the unsharded program on the
real chip (VERDICT r4 weak-3: anchor the scaling model's per-chip
constant).  Both programs run the identical int8 quantized GEMM; the
difference in device module time (and wall) is the shard_map/psum launch
overhead a single chip pays.  Writes SHARD1X1.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qublas_tpu.ops.gemm import qgemul
from qublas_tpu.parallel import make_mesh, shard_qgemul
from qublas_tpu.qformat import OverflowMode, qformat
from qublas_tpu.qtensor import QTensor, from_raw
from qublas_tpu.utils.profiling import device_busy

FA = qformat(3, 4)
WIDE = qformat(20, 8)
OUT = qformat(3, 4, overflow_mode=OverflowMode.SAT_ZERO)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    m = n = k = 2048
    rng = np.random.RandomState(0)
    a = from_raw(rng.randint(FA.raw_min, FA.raw_max + 1, (m, k)), FA)
    b = from_raw(rng.randint(FA.raw_min, FA.raw_max + 1, (k, n)), FA)
    mesh = make_mesh(dp=1, tp=1)

    def sharded():
        y = shard_qgemul(a, b, OUT, mesh, mul_to=WIDE, add_formats=(WIDE,),
                         strategy="k")
        np.asarray(y.data[:8, :128])

    @jax.jit
    def plain_fn(ad, bd):
        return qgemul(QTensor(ad, FA), QTensor(bd, FA), OUT,
                      mul_to=WIDE, add_formats=(WIDE,)).data

    def plain():
        np.asarray(plain_fn(a.data, b.data)[:8, :128])

    sharded(); plain()                     # compile + warm

    res = {}
    for name, fn in (("sharded_1x1", sharded), ("unsharded", plain)):
        wall = dev = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fn()
            wall = min(wall, time.perf_counter() - t0)
            p = device_busy(fn)
            if p and p.get("module_s"):
                dev = min(dev, p["module_s"])
        res[name] = {"wall_s": wall,
                     "device_module_s": None if dev == float("inf")
                     else dev}
    dev_over = None
    if all(res[x]["device_module_s"] for x in res):
        dev_over = max(res["sharded_1x1"]["device_module_s"]
                       - res["unsharded"]["device_module_s"], 0.0)
    doc = {
        "overhead_s": dev_over if dev_over is not None else
        max(res["sharded_1x1"]["wall_s"] - res["unsharded"]["wall_s"], 0.0),
        "timing": "device-trace" if dev_over is not None else "wall",
        "detail": res,
        "note": "1x1-mesh shard_map k-psum GEMM vs unsharded fast path, "
                "2048^3 int8; overhead_s = device module time delta "
                "(the scaling model's per-chip constant)",
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "SHARD1X1.json"
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc["detail"]))
    print(json.dumps({"overhead_s": doc["overhead_s"],
                      "timing": doc["timing"]}))


if __name__ == "__main__":
    main()
