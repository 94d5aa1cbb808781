"""Elementwise quantized tensor ops (Qadd/Qsub/Qmul/Qdiv/Qabs/Qneg/Qcmp/Qeq).

Replaces the reference's scalar ops + lazy expression templates
(QuBLAS.h:3142-3370 and 3741-4156).  The laziness is XLA's fusion; each op
here is a short jnp program — exact widened arithmetic on int32 lanes or
64-bit (hi, lo) pairs, followed by the fused round→saturate epilogue.

Dispatch is static (trace-time), driven by the width proofs in
:mod:`.widths`:

* ``i32``  — single int32 lane per element,
* ``pair`` — emulated 64-bit intermediates (:mod:`.wideint`),
* ``host`` — exact Python-int golden model for >64-bit configurations.

Host-path ops are eager only (they need concrete values); device-path ops
are fully jittable and shardable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import hostops
from ..qformat import QFormat, add_merge, mul_merge
from ..qtensor import QTensor, from_float, from_raw
from . import wideint as W
from .widths import (
    dtype_for,
    fmt_interval,
    route_addsub,
    route_div,
    route_mul,
    route_requant,
)

__all__ = ["qmul", "qadd", "qsub", "qdiv", "qabs", "qneg", "qcmp", "qeq",
           "qcast"]


def _coerce_pair(a, b):
    if not isinstance(a, QTensor) and isinstance(b, QTensor):
        a = from_float(a, b.fmt)
    if not isinstance(b, QTensor) and isinstance(a, QTensor):
        b = from_float(b, a.fmt)
    if not (isinstance(a, QTensor) and isinstance(b, QTensor)):
        raise TypeError("elementwise ops need at least one QTensor operand")
    return a, b


_NATIVE_OPS = {"qmul": ("mul", mul_merge), "qadd": ("add", add_merge),
               "qsub": ("sub", add_merge), "qdiv": ("div", add_merge)}


def _host_binary(fn, a: QTensor, b: QTensor, **kw) -> QTensor:
    fa, fb = a.fmt, b.fmt
    nat = _NATIVE_OPS.get(fn.__name__)
    if nat is not None:
        # native C++ host engine fast path (bit-identical by differential
        # tests); refuses and falls through when widths exceed its envelope
        from .. import native

        op, merger = nat
        out_fmt = merger(fa, fb, kw.get("to"), kw.get("full_prec", False))
        got = native.binary_op(op, a.raw(), b.raw(), fa, fb, out_fmt)
        if got is not None:
            return from_raw(got, out_fmt)
    A, B = np.broadcast_arrays(np.asarray(a.raw(), dtype=object),
                               np.asarray(b.raw(), dtype=object))
    out_raw, out_fmt = [], None
    for x, y in zip(A.reshape(-1), B.reshape(-1)):
        r, out_fmt = fn((int(x), fa), (int(y), fb), **kw)
        out_raw.append(r)
    return from_raw(np.array(out_raw, dtype=object).reshape(A.shape), out_fmt)


def _host_unary(fn, a: QTensor) -> QTensor:
    out_raw, out_fmt = [], None
    for x in np.asarray(a.raw(), dtype=object).reshape(-1):
        r, out_fmt = fn((int(x), a.fmt))
        out_raw.append(r)
    return from_raw(np.array(out_raw, dtype=object).reshape(a.shape), out_fmt)


def _finish(raw_i32, out_fmt: QFormat) -> QTensor:
    return QTensor(raw_i32.astype(dtype_for(out_fmt)), out_fmt)


def qmul(a, b, to=None, full_prec: bool = False) -> QTensor:
    """Quantized multiply: exact product → round → saturate
    (QuBLAS.h:3146-3171)."""
    a, b = _coerce_pair(a, b)
    out = mul_merge(a.fmt, b.fmt, to, full_prec)
    route, _, from_frac = route_mul(a.fmt, b.fmt, out)
    if a.is_host or b.is_host or route == "host" or dtype_for(out) is None:
        return _host_binary(hostops.qmul, a, b, to=to, full_prec=full_prec)
    x = a.data.astype(jnp.int32)
    y = b.data.astype(jnp.int32)
    if route == "i32":
        raw = W.requantize_i32(x * y, from_frac, out)
    elif route == "split":
        raw = W.requantize_split_mul(x, y, from_frac, out)
    else:
        raw = W.requantize_pair(W.mul32_wide(x, y), from_frac, out)
    return _finish(raw, out)


def _addsub(a, b, to, full_prec, sub: bool) -> QTensor:
    a, b = _coerce_pair(a, b)
    out = add_merge(a.fmt, b.fmt, to, full_prec)
    route, _, f = route_addsub(a.fmt, b.fmt, out, sub)
    host_fn = hostops.qsub if sub else hostops.qadd
    if a.is_host or b.is_host or route == "host" or dtype_for(out) is None:
        return _host_binary(host_fn, a, b, to=to, full_prec=full_prec)
    sa, sb = f - a.fmt.frac_bits, f - b.fmt.frac_bits
    x = a.data.astype(jnp.int32)
    y = b.data.astype(jnp.int32)
    if route == "i32":
        s = (x << sa) - (y << sb) if sub else (x << sa) + (y << sb)
        raw = W.requantize_i32(s, f, out)
    else:
        xp = W.pair_shl(W.widen(x), sa)
        yp = W.pair_shl(W.widen(y), sb)
        s = W.pair_sub(xp, yp) if sub else W.pair_add(xp, yp)
        # pair ops broadcast like their int32 lanes do
        raw = W.requantize_pair(s, f, out)
    return _finish(raw, out)


def qadd(a, b, to=None, full_prec: bool = False) -> QTensor:
    """Quantized add (QuBLAS.h:3177-3204)."""
    return _addsub(a, b, to, full_prec, sub=False)


def qsub(a, b, to=None, full_prec: bool = False) -> QTensor:
    """Quantized subtract (QuBLAS.h:3210-3235)."""
    return _addsub(a, b, to, full_prec, sub=True)


def qdiv(a, b, to=None, full_prec: bool = False) -> QTensor:
    """Quantized divide (QuBLAS.h:3241-3266).  Replicated reference warts:
    division by zero yields 0; quotient truncates toward zero with no
    rounding stage."""
    a, b = _coerce_pair(a, b)
    out = add_merge(a.fmt, b.fmt, to, full_prec)
    route, _, _ = route_div(a.fmt, b.fmt, out)
    if a.is_host or b.is_host or route == "host" or dtype_for(out) is None:
        return _host_binary(hostops.qdiv, a, b, to=to, full_prec=full_prec)
    sa = max(b.fmt.frac_bits - a.fmt.frac_bits, 0)
    sb = max(a.fmt.frac_bits - b.fmt.frac_bits, 0)
    x = a.data.astype(jnp.int32)
    y = b.data.astype(jnp.int32)
    s = sa + out.frac_bits
    num = x << s if s >= 0 else x >> (-s)
    den = y << sb
    safe_den = jnp.where(den == 0, jnp.int32(1), den)
    q = lax.div(num, safe_den)  # lax.div on ints truncates toward zero
    q = jnp.where(den == 0, jnp.int32(0), q)
    raw = W._overflow_i32(q, out)  # no frac stage, overflow only
    return _finish(raw, out)


def qabs(a: QTensor) -> QTensor:
    """Absolute value (QuBLAS.h:3273-3300): unsigned is identity; signed
    widens int_bits by one, no requantization."""
    if not a.fmt.signed:
        return a
    out = QFormat(a.fmt.int_bits + 1, a.fmt.frac_bits, a.fmt.signed,
                  a.fmt.round_mode, a.fmt.overflow_mode)
    if a.is_host or dtype_for(out) is None or not fmt_interval(a.fmt).fits32:
        return _host_unary(hostops.qabs, a)
    x = a.data.astype(jnp.int32)
    return _finish(jnp.where(x < 0, -x, x), out)


def qneg(a: QTensor) -> QTensor:
    """Negation (QuBLAS.h:3307-3317): widens int_bits by one."""
    out = QFormat(a.fmt.int_bits + 1, a.fmt.frac_bits, a.fmt.signed,
                  a.fmt.round_mode, a.fmt.overflow_mode)
    if a.is_host or dtype_for(out) is None or not fmt_interval(a.fmt).fits32:
        return _host_unary(hostops.qneg, a)
    return _finish(-a.data.astype(jnp.int32), out)


def _aligned(a: QTensor, b: QTensor):
    f = max(a.fmt.frac_bits, b.fmt.frac_bits)
    sa, sb = f - a.fmt.frac_bits, f - b.fmt.frac_bits
    ia = fmt_interval(a.fmt) << sa
    ib = fmt_interval(b.fmt) << sb
    if a.is_host or b.is_host or not (ia.fits64 and ib.fits64):
        return None
    x = a.data.astype(jnp.int32)
    y = b.data.astype(jnp.int32)
    if ia.fits32 and ib.fits32:
        return (x << sa, y << sb), "i32"
    return (W.pair_shl(W.widen(x), sa), W.pair_shl(W.widen(y), sb)), "pair"


def qcmp(a, b):
    """Three-way compare after exact alignment (QuBLAS.h:3332-3345).
    Returns an int8 array of -1/0/+1."""
    a, b = _coerce_pair(a, b)
    al = _aligned(a, b)
    if al is None:
        A, B = np.broadcast_arrays(np.asarray(a.raw(), dtype=object),
                                   np.asarray(b.raw(), dtype=object))
        out = [hostops.qcmp((int(x), a.fmt), (int(y), b.fmt))
               for x, y in zip(A.reshape(-1), B.reshape(-1))]
        return np.array(out, dtype=np.int8).reshape(A.shape)
    (x, y), kind = al
    if kind == "i32":
        return (x > y).astype(jnp.int8) - (x < y).astype(jnp.int8)
    lt = W.pair_lt(x, y)
    gt = W.pair_lt(y, x)
    return gt.astype(jnp.int8) - lt.astype(jnp.int8)


def qeq(a, b):
    """Equality after exact alignment (QuBLAS.h:3347-3359)."""
    a, b = _coerce_pair(a, b)
    al = _aligned(a, b)
    if al is None:
        A, B = np.broadcast_arrays(np.asarray(a.raw(), dtype=object),
                                   np.asarray(b.raw(), dtype=object))
        out = [hostops.qeq((int(x), a.fmt), (int(y), b.fmt))
               for x, y in zip(A.reshape(-1), B.reshape(-1))]
        return np.array(out, dtype=bool).reshape(A.shape)
    (x, y), kind = al
    if kind == "i32":
        return x == y
    return W.pair_eq(x, y)


def qcast(a: QTensor, fmt: QFormat) -> QTensor:
    """Cross-format conversion (requantize with destination modes) —
    reference converting copy ctor (QuBLAS.h:2758-2830)."""
    if a.fmt == fmt:
        return QTensor(a.data, fmt)
    route = route_requant(fmt_interval(a.fmt), a.fmt.frac_bits, fmt)
    if a.is_host or route == "host" or dtype_for(fmt) is None:
        return _host_unary(lambda v: hostops.convert(v, fmt), a)
    x = a.data.astype(jnp.int32)
    if route == "i32":
        raw = W.requantize_i32(x, a.fmt.frac_bits, fmt)
    else:
        raw = W.requantize_pair(W.widen(x), a.fmt.frac_bits, fmt)
    return _finish(raw, fmt)
