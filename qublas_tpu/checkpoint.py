"""Checkpoint / interchange for QTensor pytrees.

The reference's only persistence is the ``toMatlab`` text dump
(QuBLAS.h:2980-3036).  Here (SURVEY.md §5): a QTensor is raw ints + format
metadata, so checkpointing is trivial and *bit-exact by construction*:

* :func:`save` / :func:`load` — ``.npz`` container for any pytree of
  QTensor / QComplexTensor / arrays; wide (host) tensors serialize as exact
  decimal strings (every raw round-trips, including fill(int)-wart values
  outside the format's representable range).
* :func:`dumps_bits` / :func:`loads_bits` — the BitStream string itself as a
  self-describing interchange record (JSON header + bits), the natural
  format for exchanging golden vectors with other fixed-point tools.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from . import bitstream
from .complex import QComplexTensor
from .qformat import OverflowMode, QFormat, RoundMode
from .qtensor import QTensor, from_raw

__all__ = ["save", "load", "dumps_bits", "loads_bits"]


def _fmt_to_list(f: QFormat):
    return [f.int_bits, f.frac_bits, int(f.signed), int(f.round_mode),
            int(f.overflow_mode)]


def _fmt_from_list(v) -> QFormat:
    i, f, s, rm, om = (int(x) for x in v)
    return QFormat(i, f, bool(s), RoundMode(rm), OverflowMode(om))


def _encode(obj, arrays: dict):
    # array keys are a plain counter — the spec records each tensor's key,
    # so decode never reconstructs them.  (Path-derived keys collided:
    # {'a.b': t1, 'a': {'b': t2}} both produced 'ka.b.a' and one tensor
    # silently overwrote the other.)
    if isinstance(obj, QTensor):
        key = f"t{len(arrays)}"
        if obj.is_host or obj.is_limb:
            # exact decimal encoding: the BitStream wire format serializes
            # only the logical width, which is lossy for fill(int)-wart
            # raws outside the representable range — a checkpoint must
            # round-trip EVERY stored raw bit-for-bit.  Limb-stored device
            # tensors take the same path (object raws; from_raw rebuilds
            # the device limb storage on load)
            dec = ",".join(str(int(v))
                           for v in np.asarray(obj.raw(),
                                               dtype=object).reshape(-1))
            arrays[key] = np.frombuffer(dec.encode(), dtype=np.uint8)
            return {"__qt__": key, "fmt": _fmt_to_list(obj.fmt),
                    "shape": list(obj.shape), "wide": True, "enc": "dec"}
        arrays[key] = np.asarray(obj.raw())
        return {"__qt__": key, "fmt": _fmt_to_list(obj.fmt), "wide": False}
    if isinstance(obj, QComplexTensor):
        return {"__qc__": [_encode(obj.real, arrays),
                           _encode(obj.imag, arrays)]}
    if isinstance(obj, dict):
        return {"__d__": {k: _encode(v, arrays) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        enc = [_encode(v, arrays) for v in obj]
        return {"__l__": enc, "tuple": isinstance(obj, tuple)}
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return {"__v__": obj}
    arr = np.asarray(obj)
    key = f"t{len(arrays)}"
    arrays[key] = arr
    return {"__np__": key}


def _decode(spec, arrays: dict):
    if "__qt__" in spec:
        fmt = _fmt_from_list(spec["fmt"])
        data = arrays[spec["__qt__"]]
        if spec["wide"]:
            if spec.get("enc") == "dec":
                txt = bytes(data).decode()
                raws = [int(s) for s in txt.split(",")] if txt else []
                return from_raw(np.array(raws, dtype=object).reshape(
                    tuple(spec["shape"])), fmt)
            # legacy (round-1) checkpoints: BitStream-encoded
            bits = bytes(data).decode()
            return bitstream.from_bits(bits, fmt, tuple(spec["shape"]),
                                       twos_complement=True)
        from .ops.widths import storage_kind

        if storage_kind(fmt) == "pair":
            # rebuild the (hi, lo) limb-pair device storage from the saved
            # int64 raws
            return from_raw(data.astype(object), fmt)
        return QTensor(data, fmt)
    if "__qc__" in spec:
        r, i = spec["__qc__"]
        return QComplexTensor(_decode(r, arrays), _decode(i, arrays))
    if "__d__" in spec:
        return {k: _decode(v, arrays) for k, v in spec["__d__"].items()}
    if "__l__" in spec:
        vals = [_decode(v, arrays) for v in spec["__l__"]]
        return tuple(vals) if spec["tuple"] else vals
    if "__v__" in spec:
        return spec["__v__"]
    return arrays[spec["__np__"]]


def save(path: str, tree: Any) -> None:
    """Write a pytree of QTensor/QComplexTensor/arrays/scalars to ``path``
    (.npz).  Raw bits round-trip exactly; formats travel as metadata."""
    arrays: dict = {}
    spec = _encode(tree, arrays)
    arrays["__spec__"] = np.frombuffer(json.dumps(spec).encode(),
                                       dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)


def load(path: str) -> Any:
    """Inverse of :func:`save` (device tensors come back as host numpy raw
    arrays wrapped in QTensor — move with jnp.asarray as needed)."""
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    spec = json.loads(bytes(arrays.pop("__spec__")).decode())
    return _decode(spec, arrays)


def dumps_bits(t: QTensor, tensor_order=None, elem_order=None) -> str:
    """Self-describing BitStream record: one JSON header line, then the
    '0'/'1' stream — the wire format for cross-tool golden exchange."""
    header = {
        "fmt": _fmt_to_list(t.fmt),
        "shape": list(t.shape),
        "tensor_order": _order_to_json(tensor_order),
        "elem_order": _order_to_json(elem_order),
    }
    return json.dumps(header) + "\n" + bitstream.to_bits(
        t, tensor_order, elem_order)


def loads_bits(s: str) -> QTensor:
    head, bits = s.split("\n", 1)
    h = json.loads(head)
    return bitstream.from_bits(
        bits, _fmt_from_list(h["fmt"]), tuple(h["shape"]),
        _order_from_json(h["tensor_order"]), _order_from_json(h["elem_order"]),
        twos_complement=True)


def _order_to_json(o):
    if o is None or o is bitstream.l2r or isinstance(o, bitstream.l2r):
        return None
    return o.chunk if isinstance(o, bitstream.r2l) else 1


def _order_from_json(v):
    return None if v is None else bitstream.r2l(int(v))
