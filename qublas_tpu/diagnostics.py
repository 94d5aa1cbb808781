"""Observability: requantization saturation/rounding diagnostics.

The reference can only ``display()`` values (QuBLAS.h:2418-2431); an
accuracy simulator running at hardware speed can do better: these helpers
report how often a requantization step saturates or rounds, the standard
diagnostic when choosing fixed-point formats for an ASIC datapath
(SURVEY.md §5 "structured logging of requantization saturation counts").

All functions are jit-friendly (pure jnp) and return small stat pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .qformat import OverflowMode, QFormat
from .qtensor import QTensor

__all__ = ["RequantStats", "requant_stats", "format_range_report"]


class RequantStats(NamedTuple):
    """Counts over one requantization x -> fmt (jnp scalars under jit)."""

    total: object        # element count
    saturated: object    # elements clamped/zeroed/wrapped by int_convert
    rounded: object      # elements whose dropped fraction bits were nonzero
    max_abs: object      # max |raw| before overflow handling


def requant_stats(x: QTensor, fmt: QFormat) -> RequantStats:
    """Statistics of converting ``x`` into ``fmt`` (without performing it).

    Works on device-path tensors; host (wide) tensors are evaluated with
    Python ints.

    ``saturated`` counts elements whose *rounded* value falls outside the
    target's identity range (``_identity_bounds``) — i.e. elements that
    int_convert would clamp, zero, **or wrap**.  For WRP_TCPL / WRP_TCPL_SAT
    targets nothing is literally "saturated": the count is the number of
    wrapped elements, which is the quantity an ASIC datapath designer
    watches (a wrap is at least as destructive as a clamp).  The internal
    probe runs the rounding stage with a WRP_TCPL_SAT no-op overflow so the
    pre-overflow value is observable on device lanes.
    """
    d = x.fmt.frac_bits - fmt.frac_bits
    lo, hi = _identity_bounds(fmt)
    if x.is_host:
        raws = [int(v) for v in np.asarray(x.raw(), dtype=object).reshape(-1)]
        rounded_vals = []
        n_round = 0
        from . import hostint

        for r in raws:
            rv = hostint.frac_convert(r, x.fmt.frac_bits, fmt.frac_bits,
                                      fmt.round_mode)
            rounded_vals.append(rv)
            if d > 0 and (r & ((1 << d) - 1)):
                n_round += 1
        n_sat = sum(1 for rv in rounded_vals if not (lo <= rv <= hi))
        mx = max((abs(rv) for rv in rounded_vals), default=0)
        return RequantStats(len(raws), n_sat, n_round, mx)

    import jax.numpy as jnp

    from .ops import wideint as W
    from .ops.widths import fmt_interval, rounded_interval

    riv, inters = rounded_interval(fmt_interval(x.fmt), x.fmt.frac_bits, fmt)
    if not all(v.fits32 for v in inters + [riv]) or d > 31:
        # rounded values exceed int32 lanes, or the shift distance exceeds
        # what requantize_i32's lane path supports: evaluate on the host
        host = QTensor(np.asarray(x.raw()).astype(object), x.fmt)
        return requant_stats(host, fmt)

    xi = x.data.astype(jnp.int32)
    if d > 0:
        rounded_mask = (xi & jnp.int32((1 << d) - 1)) != 0
    else:
        rounded_mask = jnp.zeros(x.shape, dtype=bool)
    nosat = fmt.with_modes(overflow_mode=OverflowMode.WRP_TCPL_SAT)
    rv = W.requantize_i32(xi, x.fmt.frac_bits, nosat)
    sat_mask = (rv < lo) | (rv > hi)
    # magnitude in uint32: jnp.abs(INT32_MIN) wraps on int32 lanes
    mag = jnp.where(rv < 0, jnp.uint32(0) - rv.astype(jnp.uint32),
                    rv.astype(jnp.uint32))
    return RequantStats(
        x.size,
        jnp.sum(sat_mask),
        jnp.sum(rounded_mask),
        jnp.max(mag) if x.size else 0,
    )


def _identity_bounds(fmt: QFormat):
    hi = fmt.raw_max
    if not fmt.signed:
        lo = 0
    elif fmt.overflow_mode == OverflowMode.SAT_SMGN:
        lo = fmt.raw_min + 1
    else:
        lo = fmt.raw_min
    return lo, hi


def format_range_report(x: QTensor) -> dict:
    """Utilization of the format's dynamic range — a quick way to see
    whether int_bits/frac_bits are wasted or insufficient."""
    vals = np.asarray(x.to_double(), dtype=np.float64).reshape(-1)
    mx = float(np.max(np.abs(vals))) if vals.size else 0.0
    fmt = x.fmt
    full = fmt.raw_max * fmt.scale
    return {
        "fmt": repr(fmt),
        "max_abs": mx,
        "range_utilization": (mx / full) if full else 0.0,
        "zero_fraction": float(np.mean(vals == 0.0)) if vals.size else 0.0,
    }
