"""ctypes bindings for the native C++ host engine (native/qublas_host.cpp).

The shared library is compiled on first use (g++, ~1 s) and cached next to
the source; if no toolchain is available every entry point reports
unavailable and callers fall back to the exact pure-Python model.  The
native kernels cover formats whose storage fits int64 and whose
intermediates fit 127 bits — the wrappers check this with the same width
proofs the device paths use and refuse otherwise (returning None).

Semantics: identical to :mod:`qublas_tpu.hostint` / :mod:`~.hostops`
(differential tests in tests/test_native.py sweep all mode combos).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

from .qformat import OverflowMode, QFormat, RoundMode

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "qublas_host.cpp"
_LIB = _SRC.parent / "libqublas_host.so"
_lock = threading.Lock()
_lib = None
_tried = False


class _Fmt(ctypes.Structure):
    _fields_ = [("int_bits", ctypes.c_int32), ("frac_bits", ctypes.c_int32),
                ("is_signed", ctypes.c_int32), ("round_mode", ctypes.c_int32),
                ("overflow_mode", ctypes.c_int32)]


def _fmt(f: QFormat) -> _Fmt:
    return _Fmt(f.int_bits, f.frac_bits, int(f.signed), int(f.round_mode),
                int(f.overflow_mode))


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    fp = ctypes.POINTER(_Fmt)
    lib.qh_requantize.argtypes = [i64p, i64p, ctypes.c_size_t,
                                  ctypes.c_int32, fp]
    lib.qh_double_to_raw.argtypes = [dp, i64p, ctypes.c_size_t, fp]
    lib.qh_mul.argtypes = [i64p, i64p, i64p, ctypes.c_size_t,
                           ctypes.c_int32, ctypes.c_int32, fp]
    lib.qh_addsub.argtypes = [i64p, i64p, i64p, ctypes.c_size_t,
                              ctypes.c_int32, ctypes.c_int32,
                              ctypes.c_int32, fp]
    lib.qh_div.argtypes = [i64p, i64p, i64p, ctypes.c_size_t,
                           ctypes.c_int32, ctypes.c_int32, fp]
    lib.qh_tree_gemm.argtypes = [i64p, i64p, i64p,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_int32,
                                 fp, fp, fp, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.c_int32, fp]
    lib.qh_cast.argtypes = [i64p, i64p, ctypes.c_size_t, ctypes.c_int32, fp]
    lib.qh_pack_bits.argtypes = [i64p, ctypes.c_char_p, ctypes.c_size_t,
                                 ctypes.c_int32]
    lib.qh_unpack_bits.argtypes = [ctypes.c_char_p, i64p, ctypes.c_size_t,
                                   ctypes.c_int32, ctypes.c_int32]
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.qh_w_limbs.restype = ctypes.c_int32
    lib.qh_w_requantize.argtypes = [u64p, u64p, ctypes.c_size_t,
                                    ctypes.c_int32, fp]
    lib.qh_w_mul.argtypes = [u64p, u64p, u64p, ctypes.c_size_t,
                             ctypes.c_int32, ctypes.c_int32, fp]
    lib.qh_w_addsub.argtypes = [u64p, u64p, u64p, ctypes.c_size_t,
                                ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int32, fp]
    lib.qh_w_shift.argtypes = [u64p, u64p, ctypes.c_size_t, ctypes.c_int32]
    lib.qh_w_tree_gemm.argtypes = [u64p, u64p, u64p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64,
                                   ctypes.c_int32, ctypes.c_int32,
                                   fp, fp, fp, ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int32, fp]
    lib.qh_abi_version.restype = ctypes.c_int32
    if lib.qh_abi_version() != 3 or lib.qh_w_limbs() != _NL:
        return None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            if os.environ.get("QUBLAS_NATIVE", "1") != "0":
                _lib = _build()
        return _lib


def available() -> bool:
    return get_lib() is not None


def _i64(a) -> Optional[np.ndarray]:
    arr = np.asarray(a)
    if arr.dtype == object:
        try:
            arr = arr.astype(np.int64)
        except (OverflowError, TypeError):
            return None
    return np.ascontiguousarray(arr, dtype=np.int64)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


_MAX_TOTAL_BITS = 126  # i128 headroom

# multiword engine envelope: 8x64-bit limbs; every intermediate (products,
# alignment shifts, +1 rounding carries) must fit 512 bits signed
_NL = 8
_W_MAX_BITS = 510


def _to_limbs(arr) -> Optional[np.ndarray]:
    """Object array of Python ints -> (n, NL) uint64 limb matrix (LE,
    two's complement mod 2^512).  None if any value needs > 511 bits.

    ``int.to_bytes`` does the split at C speed — the Python-level cost is
    one call per element, not one per limb."""
    flat = np.asarray(arr, dtype=object).reshape(-1)
    nbytes = 8 * _NL
    try:
        buf = b"".join(
            int(v).to_bytes(nbytes, "little", signed=True) for v in flat)
    except OverflowError:
        return None  # a value needs more than 512 signed bits
    return np.frombuffer(buf, dtype=np.uint64).reshape(-1, _NL).copy()


def _from_limbs(limbs: np.ndarray) -> np.ndarray:
    """(n, NL) uint64 limbs -> object array of signed Python ints."""
    n = limbs.shape[0]
    out = np.empty(n, dtype=object)
    raw = np.ascontiguousarray(limbs).tobytes()
    nbytes = 8 * _NL
    for i in range(n):
        out[i] = int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little",
                                signed=True)
    return out


def _uptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _w_requant_fits(src_bits: int, from_frac: int, to: QFormat) -> bool:
    d = from_frac - to.frac_bits
    width = src_bits + max(-d, 0) + 1
    word = 64 * ((to.storage_bits + 63) // 64)  # WRP_TCPL_SAT machine word
    return width <= _W_MAX_BITS and word <= _W_MAX_BITS


def _requant_fits(src_bits: int, from_frac: int, to: QFormat) -> bool:
    """Intermediates of frac_convert/int_convert must fit i128."""
    d = from_frac - to.frac_bits
    width = src_bits + max(-d, 0) + 1
    return width <= _MAX_TOTAL_BITS and to.storage_bits <= 64


def _eff_width(fmt: QFormat) -> int:
    """Width actually occupied by a value stored in ``fmt``: the declared
    storage, except WRP_TCPL_SAT (identity stub) where values wrap only at
    the machine word — int32 / int64 / 64·ceil(w/64) bits."""
    w = fmt.storage_bits
    if fmt.overflow_mode != OverflowMode.WRP_TCPL_SAT:
        return w
    return 32 if w <= 32 else 64 if w <= 64 else 64 * ((w + 63) // 64)


def _value_bits(arr) -> int:
    """Max two's-complement width of the actual values (the ``fill(int)``
    wart lets raws legally exceed their format's storage range, so envelope
    proofs must use real value widths, not declared ones)."""
    flat = np.asarray(arr, dtype=object).reshape(-1)
    if flat.size == 0:
        return 1
    bits = 1
    for v in flat:
        v = int(v)
        bits = max(bits, (v.bit_length() + 1) if v >= 0
                   else ((-v - 1).bit_length() + 1))
    return bits


def requantize(raws, from_fmt: QFormat, to: QFormat) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src_bits = max(_eff_width(from_fmt), _value_bits(raws))
    if src_bits <= 64 and _requant_fits(src_bits, from_fmt.frac_bits, to):
        a = _i64(raws)
        if a is not None:
            out = np.empty_like(a)
            lib.qh_requantize(_ptr(a), _ptr(out), a.size, from_fmt.frac_bits,
                              ctypes.byref(_fmt(to)))
            return out
    return requantize_wide(raws, from_fmt.frac_bits, to, src_bits)


def requantize_wide(raws, from_frac: int, to: QFormat,
                    src_bits: int) -> Optional[np.ndarray]:
    """Multiword (512-bit) compiled requantize; object-int in/out."""
    lib = get_lib()
    if lib is None or not _w_requant_fits(src_bits, from_frac, to):
        return None
    arr = np.asarray(raws, dtype=object)
    limbs = _to_limbs(arr)
    if limbs is None:
        return None
    out = np.empty_like(limbs)
    lib.qh_w_requantize(_uptr(limbs), _uptr(out), limbs.shape[0],
                        from_frac, ctypes.byref(_fmt(to)))
    return _from_limbs(out).reshape(arr.shape)


def double_to_raw(vals, fmt: QFormat) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or fmt.storage_bits > 64:
        return None
    if fmt.overflow_mode in (OverflowMode.WRP_TCPL, OverflowMode.WRP_TCPL_SAT):
        return None  # exact wrap of huge doubles needs arbitrary precision
    a = np.ascontiguousarray(np.asarray(vals, dtype=np.float64))
    out = np.empty(a.shape, dtype=np.int64)
    lib.qh_double_to_raw(a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                         _ptr(out), a.size, ctypes.byref(_fmt(fmt)))
    return out


def binary_op(op: str, a_raws, b_raws, fa: QFormat, fb: QFormat,
              to: QFormat) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    # envelope proofs use the ACTUAL value widths (max with the declared
    # storage): the fill(int) wart lets raws exceed their format's range
    ea = max(_eff_width(fa), _value_bits(a_raws))
    eb = max(_eff_width(fb), _value_bits(b_raws))
    if ea > 64 or eb > 64 or to.storage_bits > 64:
        return binary_op_wide(op, a_raws, b_raws, fa, fb, to,
                              sa_bits=ea, sb_bits=eb)
    a, b = _i64(a_raws), _i64(b_raws)
    if a is None or b is None:
        return binary_op_wide(op, a_raws, b_raws, fa, fb, to,
                              sa_bits=ea, sb_bits=eb)
    a, b = np.broadcast_arrays(a, b)
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    out = np.empty_like(a)
    if op == "mul":
        if not _requant_fits(ea + eb, fa.frac_bits + fb.frac_bits, to):
            return binary_op_wide(op, a_raws, b_raws, fa, fb, to,
                              sa_bits=ea, sb_bits=eb)
        lib.qh_mul(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                   fb.frac_bits, ctypes.byref(_fmt(to)))
    elif op in ("add", "sub"):
        f = max(fa.frac_bits, fb.frac_bits)
        src = max(ea + f - fa.frac_bits, eb + f - fb.frac_bits) + 1
        if not _requant_fits(src, f, to):
            return binary_op_wide(op, a_raws, b_raws, fa, fb, to,
                              sa_bits=ea, sb_bits=eb)
        lib.qh_addsub(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                      fb.frac_bits, 1 if op == "sub" else 0,
                      ctypes.byref(_fmt(to)))
    elif op == "div":
        sa = max(fb.frac_bits - fa.frac_bits, 0)
        sb = max(fa.frac_bits - fb.frac_bits, 0)
        if ea + sa + max(to.frac_bits, 0) > _MAX_TOTAL_BITS or \
                eb + sb > _MAX_TOTAL_BITS:
            return None
        lib.qh_div(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                   fb.frac_bits, ctypes.byref(_fmt(to)))
    else:
        raise ValueError(op)
    return out


def binary_op_wide(op: str, a_raws, b_raws, fa: QFormat, fb: QFormat,
                   to: QFormat, sa_bits: Optional[int] = None,
                   sb_bits: Optional[int] = None) -> Optional[np.ndarray]:
    """Compiled multiword elementwise ops — the reference's 200-bit test
    territory (test/ArbiInt grids) at C speed instead of the Python loop.

    ``sa_bits``/``sb_bits`` let :func:`binary_op` pass its already-computed
    value widths (``_value_bits`` is an O(n) Python pass over object raws —
    don't do it twice)."""
    lib = get_lib()
    if lib is None or op == "div":  # multiword division stays on Python ints
        return None
    if sa_bits is None:
        sa_bits = max(_eff_width(fa), _value_bits(a_raws))
    if sb_bits is None:
        sb_bits = max(_eff_width(fb), _value_bits(b_raws))
    if op == "mul":
        if not _w_requant_fits(sa_bits + sb_bits,
                               fa.frac_bits + fb.frac_bits, to):
            return None
    else:
        f = max(fa.frac_bits, fb.frac_bits)
        src = max(sa_bits + f - fa.frac_bits, sb_bits + f - fb.frac_bits) + 1
        if not _w_requant_fits(src, f, to):
            return None
    a = np.asarray(a_raws, dtype=object)
    b = np.asarray(b_raws, dtype=object)
    a, b = np.broadcast_arrays(a, b)
    la, lb = _to_limbs(a), _to_limbs(b)
    if la is None or lb is None:
        return None
    out = np.empty_like(la)
    if op == "mul":
        lib.qh_w_mul(_uptr(la), _uptr(lb), _uptr(out), la.shape[0],
                     fa.frac_bits, fb.frac_bits, ctypes.byref(_fmt(to)))
    else:
        lib.qh_w_addsub(_uptr(la), _uptr(lb), _uptr(out), la.shape[0],
                        fa.frac_bits, fb.frac_bits,
                        1 if op == "sub" else 0, ctypes.byref(_fmt(to)))
    return _from_limbs(out).reshape(a.shape)


def shift_wide(raws, shift: int) -> Optional[np.ndarray]:
    """Compiled multiword structural shift (left >= 0, arithmetic right
    < 0) — mirrors reference staticShiftLeft/Right value semantics."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.asarray(raws, dtype=object)
    limbs = _to_limbs(arr)
    if limbs is None:
        return None
    out = np.empty_like(limbs)
    lib.qh_w_shift(_uptr(limbs), _uptr(out), limbs.shape[0], shift)
    return _from_limbs(out).reshape(arr.shape)


_OPCODES = {"seed": 0, "convert": 1, "add": 2}


def tree_gemm_host(A, B, fa: QFormat, fb: QFormat, mul_fmt: QFormat,
                   add_formats, out_fmt: QFormat) -> Optional[np.ndarray]:
    """Exact host GEMM with per-product quantization and per-layer tree
    accumulation, on the C++ engine (streaming binary-carry — same
    association order as the reference's vector-path reducer; differential
    tests pin it to hostops.qgemul).  Returns int64 [m, n] raws at
    ``out_fmt``, or None outside the 64-bit envelope."""
    lib = get_lib()
    if lib is None:
        return None
    from .ops.tree_gemm import drain_ops, level_formats

    a = _i64(A)
    b = _i64(B)
    A_obj = np.asarray(A, dtype=object)
    if A_obj.ndim != 2 or np.asarray(B, dtype=object).ndim != 2:
        return None
    m, k = A_obj.shape
    n = np.asarray(B, dtype=object).shape[1]
    level_fmts, merge_fmts = level_formats(mul_fmt, add_formats, k)
    drain = drain_ops(k, len(merge_fmts))
    final_fmt = mul_fmt
    for op, l in drain:
        final_fmt = level_fmts[l] if op == "seed" else merge_fmts[l]

    # operand widths use ACTUAL values (fill(int) wart can exceed storage);
    # intermediate level widths use machine-word-aware effective widths
    # (WRP_TCPL_SAT stores beyond its declared storage)
    ea = max(_eff_width(fa), _value_bits(A_obj))
    eb = max(_eff_width(fb), _value_bits(B))
    narrow = a is not None and b is not None and ea <= 64 and eb <= 64 \
        and all(_eff_width(f) <= 64
                for f in [mul_fmt, out_fmt] + level_fmts + merge_fmts) \
        and _requant_fits(ea + eb, fa.frac_bits + fb.frac_bits, mul_fmt) \
        and all(_requant_fits(_eff_width(level_fmts[l]) + 1,
                              level_fmts[l].frac_bits, mf)
                for l, mf in enumerate(merge_fmts)) \
        and _requant_fits(_eff_width(final_fmt), final_fmt.frac_bits,
                          out_fmt)

    ops = np.array([v for op, l in drain for v in (_OPCODES[op], l)],
                   dtype=np.int32)
    lf_arr = (_Fmt * len(level_fmts))(*[_fmt(f) for f in level_fmts])
    mf_arr = (_Fmt * len(merge_fmts))(*[_fmt(f) for f in merge_fmts])
    if narrow:
        out = np.empty((m, n), dtype=np.int64)
        lib.qh_tree_gemm(
            _ptr(np.ascontiguousarray(a)), _ptr(np.ascontiguousarray(b)),
            _ptr(out), m, k, n, fa.frac_bits, fb.frac_bits,
            ctypes.byref(_fmt(mul_fmt)), lf_arr, mf_arr, len(merge_fmts),
            ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(drain),
            ctypes.byref(_fmt(out_fmt)))
        final = np.empty_like(out)
        lib.qh_cast(_ptr(out), _ptr(final), out.size, final_fmt.frac_bits,
                    ctypes.byref(_fmt(out_fmt)))
        return final

    # multiword engine: the reference's >64-bit GEMM territory compiled.
    # Envelope: products and every merge intermediate must fit 512 bits.
    if not _w_requant_fits(ea + eb, fa.frac_bits + fb.frac_bits, mul_fmt):
        return None
    for l, mf in enumerate(merge_fmts):
        if not _w_requant_fits(_eff_width(level_fmts[l]) + 1,
                               level_fmts[l].frac_bits, mf):
            return None
    if not _w_requant_fits(_eff_width(final_fmt), final_fmt.frac_bits,
                           out_fmt):
        return None
    la = _to_limbs(A_obj)
    lb = _to_limbs(np.asarray(B, dtype=object))
    if la is None or lb is None:
        return None
    out = np.empty((m * n, _NL), dtype=np.uint64)
    lib.qh_w_tree_gemm(
        _uptr(la), _uptr(lb), _uptr(out), m, k, n,
        fa.frac_bits, fb.frac_bits,
        ctypes.byref(_fmt(mul_fmt)), lf_arr, mf_arr, len(merge_fmts),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(drain),
        ctypes.byref(_fmt(out_fmt)))
    final = np.empty_like(out)
    lib.qh_w_requantize(_uptr(out), _uptr(final), m * n,
                        final_fmt.frac_bits, ctypes.byref(_fmt(out_fmt)))
    return _from_limbs(final).reshape(m, n)


def pack_bits(raws, width: int) -> Optional[str]:
    lib = get_lib()
    if lib is None or width > 64 or width <= 0:
        return None
    a = _i64(raws)
    if a is None:
        return None
    buf = ctypes.create_string_buffer(a.size * width)
    lib.qh_pack_bits(_ptr(a), buf, a.size, width)
    return buf.raw.decode("ascii")


def unpack_bits(bits: str, width: int,
                twos_complement: bool) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or width >= 64 or width <= 0 or len(bits) % width:
        return None
    n = len(bits) // width
    out = np.empty(n, dtype=np.int64)
    lib.qh_unpack_bits(bits.encode("ascii"), _ptr(out), n, width,
                       1 if twos_complement else 0)
    return out
