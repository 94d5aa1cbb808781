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
from . import limbint as L
from . import wideint as W
from .widths import (
    LIMB_INTER_MAX_BITS,
    Interval,
    dtype_for,
    fmt_interval,
    limb_count,
    requant_work_bits,
    route_addsub,
    route_div,
    route_mul,
    route_requant,
    storage_kind,
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
    if out_fmt is None:  # empty operands: probe the statically-known format
        _, out_fmt = fn((0, fa), (0, fb), **kw)
    return from_raw(np.array(out_raw, dtype=object).reshape(A.shape), out_fmt)


def _host_unary(fn, a: QTensor) -> QTensor:
    out_raw, out_fmt = [], None
    for x in np.asarray(a.raw(), dtype=object).reshape(-1):
        r, out_fmt = fn((int(x), a.fmt))
        out_raw.append(r)
    if out_fmt is None:  # empty operand: probe the statically-known format
        _, out_fmt = fn((0, a.fmt))
    return from_raw(np.array(out_raw, dtype=object).reshape(a.shape), out_fmt)


def _finish(raw, out_fmt: QFormat) -> QTensor:
    """Store a device result per the output format's storage kind: narrow
    to the single lane dtype, keep/widen into a (hi, lo) limb pair, or wrap
    stacked limbs."""
    kind = storage_kind(out_fmt)
    if kind == "lane":
        return QTensor(raw.astype(dtype_for(out_fmt)), out_fmt)
    if kind == "limb":
        if not isinstance(raw, L.LimbArray):
            raw = L.LimbArray(raw)
        return QTensor(raw, out_fmt)
    if isinstance(raw, tuple):
        return QTensor(W.PairArray(*raw), out_fmt)
    return QTensor(W.PairArray(*W.widen(raw)), out_fmt)


def _is_pair(t: QTensor) -> bool:
    return isinstance(t.data, W.PairArray)


def _is_limb(t: QTensor) -> bool:
    return isinstance(t.data, L.LimbArray)


def _load_i32(t: QTensor):
    """Load as a single int32 lane (caller proved values fit int32)."""
    assert not _is_pair(t) and not _is_limb(t)
    return t.data.astype(jnp.int32)


def _load_pair(t: QTensor):
    """Load as a 64-bit (hi, lo) pair regardless of storage kind."""
    if _is_pair(t):
        return t.data.hi, t.data.lo
    return W.widen(t.data.astype(jnp.int32))


def _load_limb(t: QTensor, K: int):
    """Load any device storage kind as K stacked uint32 limbs."""
    if _is_limb(t):
        return L.lext(t.data.limbs, K)
    if _is_pair(t):
        stacked = jnp.stack(
            [t.data.lo, lax.bitcast_convert_type(t.data.hi, jnp.uint32)],
            axis=0)
        return L.lext(stacked, K)
    x = t.data.astype(jnp.int32)
    return L.lext(lax.bitcast_convert_type(x, jnp.uint32)[None], K)


def _limb_work(*bit_counts) -> int:
    """Working limb count covering every listed bit width."""
    return L.bits_to_limbs(max(bit_counts))


def qmul(a, b, to=None, full_prec: bool = False) -> QTensor:
    """Quantized multiply: exact product → round → saturate
    (QuBLAS.h:3146-3171)."""
    a, b = _coerce_pair(a, b)
    out = mul_merge(a.fmt, b.fmt, to, full_prec)
    route, prod, from_frac = route_mul(a.fmt, b.fmt, out)
    if a.is_host or b.is_host or route == "host":
        return _host_binary(hostops.qmul, a, b, to=to, full_prec=full_prec)
    if route == "i32":
        raw = W.requantize_i32(_load_i32(a) * _load_i32(b), from_frac, out)
    elif route == "split":
        raw = W.requantize_split_mul(_load_i32(a), _load_i32(b), from_frac,
                                     out)
    elif route == "limb":
        K = _limb_work(prod.bits, requant_work_bits(prod, from_frac, out))
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        la = L.lbroadcast_elem(_load_limb(a, K), shape)
        lb = L.lbroadcast_elem(_load_limb(b, K), shape)
        raw = L.requantize_limb(L.lmul(la, lb, K), from_frac, out)
    else:
        if _is_pair(a) or _is_pair(b):
            p = W.pair_mul(_load_pair(a), _load_pair(b))
        else:
            p = W.mul32_wide(_load_i32(a), _load_i32(b))
        req = W.requantize_pair if storage_kind(out) == "lane" \
            else W.requantize_pair_keep
        raw = req(p, from_frac, out)
    return _finish(raw, out)


def _addsub(a, b, to, full_prec, sub: bool) -> QTensor:
    a, b = _coerce_pair(a, b)
    out = add_merge(a.fmt, b.fmt, to, full_prec)
    route, siv, f, ia, ib = route_addsub(a.fmt, b.fmt, out, sub)
    host_fn = hostops.qsub if sub else hostops.qadd
    if a.is_host or b.is_host or route == "host":
        return _host_binary(host_fn, a, b, to=to, full_prec=full_prec)
    sa, sb = f - a.fmt.frac_bits, f - b.fmt.frac_bits
    if route == "i32":
        x, y = _load_i32(a), _load_i32(b)
        s = (x << sa) - (y << sb) if sub else (x << sa) + (y << sb)
        raw = W.requantize_i32(s, f, out)
    elif route == "limb":
        # working width from the SAME intervals the route proof used
        K = _limb_work(ia.bits, ib.bits, siv.bits,
                       requant_work_bits(siv, f, out))
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        xs = L.lshl(L.lbroadcast_elem(_load_limb(a, K), shape), sa)
        ys = L.lshl(L.lbroadcast_elem(_load_limb(b, K), shape), sb)
        s = L.lsub(xs, ys) if sub else L.ladd(xs, ys)
        raw = L.requantize_limb(s, f, out)
    else:
        xp = W.pair_shl(_load_pair(a), sa)
        yp = W.pair_shl(_load_pair(b), sb)
        s = W.pair_sub(xp, yp) if sub else W.pair_add(xp, yp)
        # pair ops broadcast like their int32 lanes do
        req = W.requantize_pair if storage_kind(out) == "lane" \
            else W.requantize_pair_keep
        raw = req(s, f, out)
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
    route, num, den = route_div(a.fmt, b.fmt, out)
    if a.is_host or b.is_host or route == "host":
        return _host_binary(hostops.qdiv, a, b, to=to, full_prec=full_prec)
    sa = max(b.fmt.frac_bits - a.fmt.frac_bits, 0)
    sb = max(a.fmt.frac_bits - b.fmt.frac_bits, 0)
    s = sa + out.frac_bits
    if route == "limb":
        # bit-serial restoring division on stacked limbs (round 4):
        # completes the device-division story across every storage kind.
        # Working width from the SAME intervals the route proof used;
        # quotient magnitude is bounded by the numerator's, so ``num``
        # also sizes the quotient/epilogue interval.
        quot = Interval(-max(abs(num.lo), abs(num.hi)),
                        max(abs(num.lo), abs(num.hi)))
        K = _limb_work(num.bits, den.bits, quot.bits,
                       requant_work_bits(quot, out.frac_bits, out))
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        xs = L.lshl(L.lbroadcast_elem(_load_limb(a, K), shape), s)
        ys = L.lshl(L.lbroadcast_elem(_load_limb(b, K), shape), sb)
        q = L.ldiv_trunc(xs, ys, min(32 * K, num.bits))
        # divide-by-zero -> 0 wart (the divider returns all-ones there)
        zero_den = L.leq(ys, jnp.zeros_like(ys))
        q = L.lselect(zero_den, jnp.zeros_like(q), q)
        # no frac stage (d == 0 at out.frac_bits): overflow stage only
        return _finish(L.requantize_limb(q, out.frac_bits, out), out)
    if route == "pair":
        # 64-bit restoring long division on (hi, lo) pairs (round 4):
        # pair-storage operands / numerators past int32 no longer fall to
        # the per-element host loop.  The route proves num/den/quot fit
        # the signed 64-bit domain and the overflow-only epilogue runs
        # there too.
        xp = _load_pair(a)
        yp = _load_pair(b)
        num = W.pair_shl(xp, s) if s >= 0 else W.pair_shr(xp, -s)
        den = W.pair_shl(yp, sb)
        q = W.pair_div_trunc(num, den)
        zero_den = W.pair_eq(den, W.pair_const(0, shape=den[0].shape))
        zero = (jnp.zeros_like(q[0]), jnp.zeros_like(q[1]))
        q = W._pair_select(zero_den, zero, q)
        # no frac stage (d == 0 at out.frac_bits): overflow stage only
        if storage_kind(out) == "lane":
            return _finish(W.requantize_pair(q, out.frac_bits, out), out)
        return _finish(W.requantize_pair_keep(q, out.frac_bits, out), out)
    x = _load_i32(a)
    y = _load_i32(b)
    num = x << s if s >= 0 else x >> (-s)
    den = y << sb
    safe_den = jnp.where(den == 0, jnp.int32(1), den)
    q = lax.div(num, safe_den)  # lax.div on ints truncates toward zero
    q = jnp.where(den == 0, jnp.int32(0), q)
    raw = W._overflow_i32(q, out)  # no frac stage, overflow only
    return _finish(raw, out)


def _neg_storable(out: QFormat, bits: int) -> bool:
    """The exact (unwrapped) negation must fit ``out``'s physical device
    storage word — the oracle never wraps (hostops.qabs/qneg return the
    widened raw as-is), so a store that would truncate at the word (e.g.
    WRP_TCPL_SAT word-minimum raws, whose negation needs one bit more than
    the word) must route to host instead."""
    kind = storage_kind(out)
    if kind == "lane":
        return bits <= 32
    if kind == "pair":
        return bits <= 64
    return bits <= 32 * limb_count(out)


def qabs(a: QTensor) -> QTensor:
    """Absolute value (QuBLAS.h:3273-3300): unsigned is identity; signed
    widens int_bits by one, no requantization."""
    if not a.fmt.signed:
        return a
    out = QFormat(a.fmt.int_bits + 1, a.fmt.frac_bits, a.fmt.signed,
                  a.fmt.round_mode, a.fmt.overflow_mode)
    iv = fmt_interval(a.fmt)
    neg_iv = Interval(-iv.hi, -iv.lo)
    if a.is_host or storage_kind(out) is None or \
            max(iv.bits, neg_iv.bits) > LIMB_INTER_MAX_BITS or \
            not _neg_storable(out, max(iv.bits, neg_iv.bits)):
        return _host_unary(hostops.qabs, a)
    if iv.fits32 and neg_iv.fits32 and storage_kind(out) == "lane" \
            and not _is_pair(a) and not _is_limb(a):
        # neg_iv.fits32 guards -INT32_MIN lane overflow
        x = _load_i32(a)
        return _finish(jnp.where(x < 0, -x, x), out)
    if iv.fits64 and neg_iv.fits64 and storage_kind(out) in ("lane", "pair") \
            and not _is_limb(a):
        p = _load_pair(a)
        n = W.pair_neg(p)
        neg = W.pair_is_neg(p)
        raw = (jnp.where(neg, n[0], p[0]), jnp.where(neg, n[1], p[1]))
        if storage_kind(out) == "lane":
            return _finish(W.pair_to_int32(raw), out)
        return _finish(raw, out)
    K = _limb_work(iv.bits, neg_iv.bits)
    x = _load_limb(a, K)
    raw = L.store_limbs(L.lselect(L.lis_neg(x), L.lneg(x), x), out)
    return _finish(raw, out)


def qneg(a: QTensor) -> QTensor:
    """Negation (QuBLAS.h:3307-3317): widens int_bits by one."""
    out = QFormat(a.fmt.int_bits + 1, a.fmt.frac_bits, a.fmt.signed,
                  a.fmt.round_mode, a.fmt.overflow_mode)
    iv = fmt_interval(a.fmt)
    neg_iv = Interval(-iv.hi, -iv.lo)
    if a.is_host or storage_kind(out) is None or \
            max(iv.bits, neg_iv.bits) > LIMB_INTER_MAX_BITS or \
            not _neg_storable(out, max(iv.bits, neg_iv.bits)):
        return _host_unary(hostops.qneg, a)
    if iv.fits32 and neg_iv.fits32 and storage_kind(out) == "lane" \
            and not _is_pair(a) and not _is_limb(a):
        return _finish(-_load_i32(a), out)
    if iv.fits64 and neg_iv.fits64 and storage_kind(out) in ("lane", "pair") \
            and not _is_limb(a):
        raw = W.pair_neg(_load_pair(a))
        if storage_kind(out) == "lane":
            return _finish(W.pair_to_int32(raw), out)
        return _finish(raw, out)
    K = _limb_work(iv.bits, neg_iv.bits)
    raw = L.store_limbs(L.lneg(_load_limb(a, K)), out)
    return _finish(raw, out)


def _aligned(a: QTensor, b: QTensor):
    f = max(a.fmt.frac_bits, b.fmt.frac_bits)
    sa, sb = f - a.fmt.frac_bits, f - b.fmt.frac_bits
    ia = fmt_interval(a.fmt) << sa
    ib = fmt_interval(b.fmt) << sb
    if a.is_host or b.is_host or max(ia.bits, ib.bits) > LIMB_INTER_MAX_BITS:
        return None
    if ia.fits32 and ib.fits32 and not (_is_pair(a) or _is_pair(b)) \
            and not (_is_limb(a) or _is_limb(b)):
        return (_load_i32(a) << sa, _load_i32(b) << sb), "i32"
    if ia.fits64 and ib.fits64 and not (_is_limb(a) or _is_limb(b)):
        return (W.pair_shl(_load_pair(a), sa),
                W.pair_shl(_load_pair(b), sb)), "pair"
    K = _limb_work(ia.bits, ib.bits)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return (L.lshl(L.lbroadcast_elem(_load_limb(a, K), shape), sa),
            L.lshl(L.lbroadcast_elem(_load_limb(b, K), shape), sb)), "limb"


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
    if kind == "limb":
        lt = L.llt(x, y)
        gt = L.llt(y, x)
        return gt.astype(jnp.int8) - lt.astype(jnp.int8)
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
    if kind == "limb":
        return L.leq(x, y)
    return W.pair_eq(x, y)


def qcast(a: QTensor, fmt: QFormat) -> QTensor:
    """Cross-format conversion (requantize with destination modes) —
    reference converting copy ctor (QuBLAS.h:2758-2830)."""
    if a.fmt == fmt:
        return QTensor(a.data, fmt)
    iv = fmt_interval(a.fmt)
    route = route_requant(iv, a.fmt.frac_bits, fmt)
    if a.is_host or route == "host":
        return _host_unary(lambda v: hostops.convert(v, fmt), a)
    if route == "i32":
        raw = W.requantize_i32(_load_i32(a), a.fmt.frac_bits, fmt)
    elif route == "limb" or _is_limb(a):
        K = _limb_work(iv.bits, requant_work_bits(iv, a.fmt.frac_bits, fmt))
        raw = L.requantize_limb(_load_limb(a, K), a.fmt.frac_bits, fmt)
    else:
        req = W.requantize_pair if storage_kind(fmt) == "lane" \
            else W.requantize_pair_keep
        raw = req(_load_pair(a), a.fmt.frac_bits, fmt)
    return _finish(raw, fmt)
