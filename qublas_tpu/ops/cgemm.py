"""Complex quantized GEMM (TFComplexMul / BasicComplexMul per product).

BASELINE.json config 5 names "Qcomplex TFComplexMul complex GEMM"; the
reference itself has no GEMM at all (SURVEY.md §2.14), so the semantics
compose the two capabilities it *does* define exactly as the real GEMM
does:

* each scalar product A[i,p] * B[p,j] is a complex multiply — Basic
  4-mul/2-add (QuBLAS.h:3376-3446) or TF 3-mul/5-add (:3448-3535) — with the
  same per-step quantization tags (incl. the tag-default quirks);
* each dot product accumulates through the vector-path tree per part.
  Per-layer formats are (real_fmt, imag_fmt) pairs — a single QFormat
  applies to both parts.  (In the reference a complex ``Qadd<t>`` with a
  single bare format is uninstantiable, REFERENCE_DEFECTS.md D6; pairs map
  to its ``TypeList<Qu1, Qu2>`` → realT/imagT form, QuBLAS.h:3564-3567.)
* the result requantizes into C's per-part element formats (converting
  assignment).
"""

from __future__ import annotations

from typing import Optional

from ..qformat import QFormat
from ..qtensor import QTensor
from . import elementwise as ew
from .reduce import qreduce

__all__ = ["cgemul", "cgemv"]


def _part_formats(spec):
    if spec is None:
        return None, None
    if isinstance(spec, QFormat):
        return spec, spec
    real, imag = spec
    return real, imag


def _split_layers(add_formats):
    if isinstance(add_formats, QFormat) or (
            isinstance(add_formats, tuple) and len(add_formats) == 2
            and all(isinstance(x, QFormat) for x in add_formats)):
        add_formats = (add_formats,)
    reals, imags = [], []
    for spec in add_formats:
        r, i = _part_formats(spec)
        reals.append(r)
        imags.append(i)
    return tuple(reals), tuple(imags)


def cgemul(a, b, out_fmt, algo: str = "basic", add_formats=(),
           transpose_a: bool = False, transpose_b: bool = False,
           **mul_tags):
    """C = op(A) @ op(B) over complex fixed-point tensors.

    ``out_fmt`` is a QFormat (both parts) or a (real_fmt, imag_fmt) pair.
    ``algo`` selects the per-product multiply: ``"basic"`` or ``"tf"``;
    ``mul_tags`` are its per-step formats (``ac``/``bd``/... or
    ``ab``/``cd``/``ba``/...; tag-default propagation quirks included).
    """
    from ..complex import QComplexTensor, cmul, cmul_tf

    a = _ctranspose(a, transpose_a)
    b = _ctranspose(b, transpose_b)
    if a.shape[-1] != b.shape[-2]:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape}")
    orf, oif = _part_formats(out_fmt)
    r_layers, i_layers = _split_layers(add_formats)

    pa = QComplexTensor(QTensor(a.real.data[..., :, :, None], a.real.fmt),
                        QTensor(a.imag.data[..., :, :, None], a.imag.fmt))
    pb = QComplexTensor(QTensor(b.real.data[..., None, :, :], b.real.fmt),
                        QTensor(b.imag.data[..., None, :, :], b.imag.fmt))
    mulfn = cmul_tf if algo == "tf" else cmul
    prod = mulfn(pa, pb, **mul_tags)
    real = qreduce(prod.real, r_layers, axis=-2)
    imag = qreduce(prod.imag, i_layers, axis=-2)
    return QComplexTensor(ew.qcast(real, orf or real.fmt),
                          ew.qcast(imag, oif or imag.fmt))


def cgemv(a, x, out_fmt, algo: str = "basic", add_formats=(),
          transpose_a: bool = False, **mul_tags):
    """y = op(A) @ x, complex matrix-vector."""
    from ..complex import QComplexTensor

    col = QComplexTensor(QTensor(x.real.data[..., :, None], x.real.fmt),
                         QTensor(x.imag.data[..., :, None], x.imag.fmt))
    y = cgemul(a, col, out_fmt, algo, add_formats,
               transpose_a=transpose_a, **mul_tags)
    return QComplexTensor(QTensor(y.real.data[..., 0], y.real.fmt),
                          QTensor(y.imag.data[..., 0], y.imag.fmt))


def _ctranspose(c, flag: bool):
    if not flag:
        return c
    from ..complex import QComplexTensor

    def t(q: QTensor) -> QTensor:
        import numpy as np

        data = (np.swapaxes(q.data, -1, -2) if q.is_host
                else q.data.swapaxes(-1, -2))
        return QTensor(data, q.fmt)

    return QComplexTensor(t(c.real), t(c.imag))
