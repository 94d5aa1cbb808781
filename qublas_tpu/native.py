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
    lib.qh_abi_version.restype = ctypes.c_int32
    if lib.qh_abi_version() != 1:
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


def _requant_fits(src_bits: int, from_frac: int, to: QFormat) -> bool:
    """Intermediates of frac_convert/int_convert must fit i128."""
    d = from_frac - to.frac_bits
    width = src_bits + max(-d, 0) + 1
    return width <= _MAX_TOTAL_BITS and to.storage_bits <= 64


def requantize(raws, from_fmt: QFormat, to: QFormat) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or from_fmt.storage_bits > 64:
        return None
    if not _requant_fits(from_fmt.storage_bits, from_fmt.frac_bits, to):
        return None
    a = _i64(raws)
    if a is None:
        return None
    out = np.empty_like(a)
    lib.qh_requantize(_ptr(a), _ptr(out), a.size, from_fmt.frac_bits,
                      ctypes.byref(_fmt(to)))
    return out


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
    if lib is None or fa.storage_bits > 64 or fb.storage_bits > 64 \
            or to.storage_bits > 64:
        return None
    a, b = _i64(a_raws), _i64(b_raws)
    if a is None or b is None:
        return None
    a, b = np.broadcast_arrays(a, b)
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    out = np.empty_like(a)
    if op == "mul":
        if not _requant_fits(fa.storage_bits + fb.storage_bits,
                             fa.frac_bits + fb.frac_bits, to):
            return None
        lib.qh_mul(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                   fb.frac_bits, ctypes.byref(_fmt(to)))
    elif op in ("add", "sub"):
        f = max(fa.frac_bits, fb.frac_bits)
        src = max(fa.storage_bits + f - fa.frac_bits,
                  fb.storage_bits + f - fb.frac_bits) + 1
        if not _requant_fits(src, f, to):
            return None
        lib.qh_addsub(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                      fb.frac_bits, 1 if op == "sub" else 0,
                      ctypes.byref(_fmt(to)))
    elif op == "div":
        sa = max(fb.frac_bits - fa.frac_bits, 0)
        if fa.storage_bits + sa + max(to.frac_bits, 0) > _MAX_TOTAL_BITS:
            return None
        lib.qh_div(_ptr(a), _ptr(b), _ptr(out), a.size, fa.frac_bits,
                   fb.frac_bits, ctypes.byref(_fmt(to)))
    else:
        raise ValueError(op)
    return out


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
    if a is None or b is None or a.ndim != 2 or b.ndim != 2:
        return None
    m, k = a.shape
    _, n = b.shape
    level_fmts, merge_fmts = level_formats(mul_fmt, add_formats, k)
    for f in [fa, fb, mul_fmt, out_fmt] + level_fmts + merge_fmts:
        if f.storage_bits > 64:
            return None
    if not _requant_fits(fa.storage_bits + fb.storage_bits,
                         fa.frac_bits + fb.frac_bits, mul_fmt):
        return None
    for l, mf in enumerate(merge_fmts):
        if not _requant_fits(level_fmts[l].storage_bits + 1,
                             level_fmts[l].frac_bits, mf):
            return None
    drain = drain_ops(k, len(merge_fmts))
    final_fmt = mul_fmt
    for op, l in drain:
        final_fmt = level_fmts[l] if op == "seed" else merge_fmts[l]
    if not _requant_fits(final_fmt.storage_bits, final_fmt.frac_bits,
                         out_fmt):
        return None

    ops = np.array([v for op, l in drain for v in (_OPCODES[op], l)],
                   dtype=np.int32)
    lf_arr = (_Fmt * len(level_fmts))(*[_fmt(f) for f in level_fmts])
    mf_arr = (_Fmt * len(merge_fmts))(*[_fmt(f) for f in merge_fmts])
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
