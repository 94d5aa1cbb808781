"""Device tree reduction with per-layer requantization (Qreduce).

TPU-native re-design of the reference's ``Reducer`` (reference
``include/QuBLAS.h:4899-5018``): "tree-based reduction is a common operation
in asic design" (:4901).  The reference's recursion over static vector types
becomes a trace-time Python loop over jnp slices — depth ⌈log₂ n⌉, each layer
one fused elementwise add + requantize over the whole remaining vector, so
XLA sees a static log-depth DAG it can fuse and tile onto the VPU.

Semantics replicated exactly:

* Per layer, elements (2i, 2i+1) combine via ``Qadd`` quantized to the
  layer's format — ``TypeAt<min(layer, len(formats)-1)>`` (:4906-4921); with
  no formats the layer vector keeps the input element type (:4963-4966) and
  the add uses default AddMerger inference (identity for equal formats).
* An odd tail element is *copied* into the next layer — a converting
  assignment (= requantize) into the layer vector's element type
  (:4977-4980).
* N-D tensors reduce over their row-major flattening (:4992-5001).
* The reference's variadic entry point deviates for odd counts (tail added
  to the *final* result, :4943-4949); that form is host-only —
  :func:`qublas_tpu.hostops.qreduce_args`.  This module implements the
  vector path, which is also what Qgemul's dot products use.
"""

from __future__ import annotations

import os

import numpy as np

from .. import hostops
from ..qformat import QFormat, add_merge
from ..qtensor import QTensor, from_raw
from . import elementwise as ew

__all__ = ["qreduce", "qreduce_args", "layer_format"]

# late round 4: a VMEM Pallas reducer was rebuilt and measured DEVICE-TRUE
# (the round-2 "0.84x" wall verdict was tunnel-polluted either way): best
# tile 84 us/iter vs the XLA slice/add chain's 63 us on the 4096x1024
# bench config (BT 256/512 = 109/84 us; BT >= 1024 Mosaic HTTP 500), so
# XLA stays the default and the kernel is opt-in for future re-testing.
# The remaining gap to a plain int32 sum (~10x) is COMPUTE, not traffic:
# the per-layer requantize (RND_CONV rounding + SAT_ZERO clamp) costs
# ~20 int-ops per input element vs the sum's 1 add — the semantics put
# the op there, not the schedule.  QUBLAS_REDUCE_PALLAS=1 enables.
_USE_PALLAS = os.environ.get("QUBLAS_REDUCE_PALLAS", "0") == "1"


def qreduce_args(values, layer_formats=()):
    """Variadic-entry tree reduction over scalar QTensors (reference
    ``Qreduce(q1, q2, ...)``, QuBLAS.h:4924-4957).

    Deviates from the vector path for odd counts: the leftover element is
    added to the *final* result with the current layer's format
    (QuBLAS.h:4943-4949).  The reference restricts this form to scalars;
    evaluation is host-side via the golden model (it is an init-time
    convenience, not a hot path).
    """
    from ..qtensor import from_raw

    pairs = []
    for v in values:
        if v.size != 1:
            raise ValueError("qreduce_args takes scalar QTensors")
        pairs.append((int(np.asarray(v.raw(), dtype=object).reshape(())),
                      v.fmt))
    raw, fmt = hostops.qreduce_args(pairs, layer_formats)
    return from_raw(np.array(raw, dtype=object), fmt)


def layer_format(layer_formats, layer: int):
    """Per-layer output format: ``TypeAt<min(layer, len-1)>``
    (QuBLAS.h:4913)."""
    if not layer_formats:
        return None
    return layer_formats[min(layer, len(layer_formats) - 1)]


def _normalize(layer_formats):
    if layer_formats is None:
        return ()
    if isinstance(layer_formats, QFormat):
        return (layer_formats,)
    return tuple(layer_formats)


def qreduce(x: QTensor, layer_formats=(), axis=None) -> QTensor:
    """Tree-reduce a QTensor with per-layer requantization.

    ``axis=None`` reduces the row-major flattening to a scalar (the reference
    entry point, QuBLAS.h:4992-5001).  An integer ``axis`` reduces along that
    axis only — a batched extension the reference cannot express (its tensors
    reduce whole); this is what the GEMM path uses for dot products.

    The per-layer slice/add program is the production path on every
    backend: a fused Pallas VMEM reducer was built twice (round 2 wall-
    timed 0.84x; late round 4 DEVICE-TRACE timed 0.75x at its best tile)
    and loses both times — XLA's own fusion of the log-depth layer chain
    wins, so the kernel stays opt-in (``QUBLAS_REDUCE_PALLAS=1``,
    :func:`_qreduce_pallas`).  Reshape-based pairings were also measured
    7x WORSE than the stride-2 slices (device-trace, round 4) — don't
    "clean up" the slicing.
    """
    layer_formats = _normalize(layer_formats)
    if axis is None:
        x = QTensor(x.data.reshape(-1), x.fmt)
        axis = 0
    axis = axis % max(x.ndim, 1)
    n = x.shape[axis]
    if n == 0:
        raise ValueError("qreduce of empty axis")

    if x.is_host:
        return _qreduce_host(x, layer_formats, axis)

    # move the reduction axis to the front; everything after is batch
    cur = QTensor(_moveaxis(x.data, axis, 0), x.fmt)

    res = _qreduce_pallas(cur, layer_formats)
    if res is not None:
        return res

    layer = 0
    while cur.shape[0] > 1:
        m = cur.shape[0]
        fmt = layer_format(layer_formats, layer)
        a = cur[0 : (m // 2) * 2 : 2]
        b = cur[1 : (m // 2) * 2 : 2]
        s = ew.qadd(a, b, to=fmt)
        if s.is_host:
            # a layer outgrew the device lanes: finish exactly on the host,
            # continuing from the current layer (formats already consumed
            # stay consumed — TypeAt indexes the original layer number)
            return _qreduce_host(cur, layer_formats, 0, first_layer=layer)
        if m % 2:
            tail = cur[m - 1 : m]
            # converting assignment into the layer vector's element type
            tail = ew.qcast(tail, s.fmt)
            s = QTensor(_concat([s.data, tail.data]), s.fmt)
        cur = s
        layer += 1
    out = QTensor(cur.data[0], cur.fmt)
    return out


def _plan_reduce_lanes(fmt: QFormat, layer_formats, n: int):
    """Prove the whole tree's adds, requantizes, and odd-tail converting
    assignments fit int32 lanes (exact interval walk — the same proof shape
    as ``tree_gemm.plan_tree``'s layer loop, seeded with the input format's
    storage interval).  Returns the per-layer ``(cur_fmt, merge_fmt, m)``
    schedule and the final format, or None -> the slice/add XLA path."""
    from .widths import (dtype_for, fmt_interval, requant_out_interval,
                         route_requant, storage_kind)

    if storage_kind(fmt) != "lane":
        return None
    iv = fmt_interval(fmt)
    cur = fmt
    sched = []
    m = n
    layer = 0
    while m > 1:
        lf = layer_format(layer_formats, layer)
        if lf is None:
            lf = add_merge(cur, cur)
        s = iv + iv
        if not s.fits32:
            return None
        if route_requant(s, cur.frac_bits, lf) != "i32":
            return None
        pair_iv, _ = requant_out_interval(s, cur.frac_bits, lf)
        lo, hi = pair_iv.lo, pair_iv.hi
        if m % 2:
            if route_requant(iv, cur.frac_bits, lf) != "i32":
                return None
            tail_iv, _ = requant_out_interval(iv, cur.frac_bits, lf)
            lo, hi = min(lo, tail_iv.lo), max(hi, tail_iv.hi)
        from .widths import Interval

        iv = Interval(lo, hi)
        sched.append((cur, lf, m))
        cur = lf
        m = (m + 1) // 2
        layer += 1
    if dtype_for(cur) is None:
        return None
    return sched, cur


def _qreduce_pallas(cur: QTensor, layer_formats):
    """VMEM Pallas tree reducer (late round 4, opt-in): load each batch
    tile once, fold ALL layers in VMEM with the exact per-layer
    requantize, write one row.  Measured device-true SLOWER than the XLA
    slice/add chain (84 vs 63 us/iter at 4096x1024, best tile; see the
    ``_USE_PALLAS`` note) — kept behind QUBLAS_REDUCE_PALLAS=1 as the
    recorded negative result and for re-testing on future toolchains.

    Proof-gated by :func:`_plan_reduce_lanes`; taken for lane-storage
    inputs with a lane-tileable batch and a power-of-two reduction length
    (odd layer tails would need an in-kernel concat, which Mosaic does not
    lower — those configs keep the XLA path).  Returns None to fall
    through to the XLA path.
    """
    if not _USE_PALLAS:
        return None
    import jax

    backend = jax.default_backend()
    n = cur.shape[0]
    # odd tails need an in-kernel concat (unsupported); require halving to
    # stay even all the way down — i.e. n a power of two — and enough rows
    # for the fold to beat the load (tiny n is fusion-friendly in XLA)
    if n < 4 or n & (n - 1):
        return None
    planned = _plan_reduce_lanes(cur.fmt, layer_formats, n)
    if planned is None:
        return None
    sched, final_fmt = planned

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import wideint as W
    from .widths import dtype_for

    batch_shape = cur.shape[1:]
    bsz = 1
    for d in batch_shape:
        bsz *= d
    if bsz == 0 or bsz % 128:
        return None
    data = cur.data.reshape(n, bsz)
    BT = 512
    while BT > 128 and bsz % BT:
        BT //= 2
    if bsz % BT:
        return None
    out_dtype = dtype_for(final_fmt)

    def kernel(x_ref, o_ref):
        v = x_ref[...].astype(jnp.int32)           # (n, BT)
        for cur_fmt, lf, m in sched:
            half = m // 2
            v2 = v.reshape(half, 2, v.shape[-1])   # static pair fold
            v = W.requantize_i32(v2[:, 0] + v2[:, 1], cur_fmt.frac_bits, lf)
        o_ref[...] = v.astype(out_dtype)

    run = pl.pallas_call(
        kernel,
        grid=(bsz // BT,),
        in_specs=[pl.BlockSpec((n, BT), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BT), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bsz), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=backend != "tpu",
    )
    raw = run(data)[0].reshape(batch_shape)
    return QTensor(raw, final_fmt)


def _moveaxis(arr, src, dst):
    import jax.numpy as jnp

    from .limbint import LimbArray
    from .wideint import PairArray

    if isinstance(arr, PairArray):
        return PairArray(jnp.moveaxis(arr.hi, src, dst),
                         jnp.moveaxis(arr.lo, src, dst))
    if isinstance(arr, LimbArray):
        nd = arr.ndim
        return LimbArray(jnp.moveaxis(arr.limbs, src % nd + 1, dst % nd + 1))
    return jnp.moveaxis(arr, src, dst)


def _concat(parts):
    import jax.numpy as jnp

    from .limbint import LimbArray
    from .wideint import PairArray

    if isinstance(parts[0], PairArray):
        return PairArray(jnp.concatenate([p.hi for p in parts], axis=0),
                         jnp.concatenate([p.lo for p in parts], axis=0))
    if isinstance(parts[0], LimbArray):
        k = max(p.nlimbs for p in parts)
        from .limbint import lext

        return LimbArray(jnp.concatenate([lext(p.limbs, k) for p in parts],
                                         axis=1))
    return jnp.concatenate(parts, axis=0)


def _qreduce_host(x: QTensor, layer_formats, axis: int,
                  first_layer: int = 0) -> QTensor:
    """Exact host path for wide formats: per-lane golden-model reduction.
    ``first_layer`` offsets the layer index for TypeAt when resuming a
    reduction the device path started."""
    if first_layer:
        layer_formats = tuple(
            layer_format(layer_formats, first_layer + i)
            for i in range(max(len(layer_formats) - first_layer, 1))
        ) if layer_formats else ()
    arr = np.asarray(x.raw(), dtype=object)
    arr = np.moveaxis(arr, axis, -1)
    batch_shape = arr.shape[:-1]
    flat = arr.reshape(-1, arr.shape[-1])
    out_raws, out_fmt = [], None
    for lane in flat:
        r, out_fmt = hostops.qreduce_list(
            [(int(v), x.fmt) for v in lane], layer_formats)
        out_raws.append(r)
    return from_raw(np.array(out_raws, dtype=object).reshape(batch_shape),
                    out_fmt)
