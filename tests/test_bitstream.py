"""BitStream serialization: orders, round-trips, reference warts."""

import numpy as np
import pytest

from qublas_tpu import bitstream as bs
from qublas_tpu.complex import complex_from_raw
from qublas_tpu.qformat import qformat
from qublas_tpu.qtensor import from_raw

rng = np.random.RandomState(7)


def test_elem_bits_low_width_two_complement():
    # raw -37 in a (4,3,signed) format: width 8, low bits of two's complement
    assert bs.elem_bits(-37, 8) == "11011011"
    assert bs.elem_bits(5, 8) == "00000101"
    assert bs.elem_bits(-1, 3) == "111"


def test_parse_unsigned_matches_reference_stoi():
    # reference stoi parses unsigned; fill() stores raw unmasked
    # (QuBLAS.h:4699, 2447-2452)
    assert bs.parse_elem("11011011") == 219
    assert bs.parse_elem("11011011", twos_complement=True) == -37


def test_l2r_roundtrip():
    f = qformat(6, 3)
    t = from_raw(rng.randint(f.raw_min, f.raw_max + 1, size=(2, 3)), f)
    s = bs.to_bits(t)
    assert len(s) == 6 * f.width
    back = bs.from_bits(s, f, (2, 3), twos_complement=True)
    np.testing.assert_array_equal(back.raw(), t.raw())


@pytest.mark.parametrize("tord,eord", [
    (bs.r2l(1), None), (None, bs.r2l(1)), (bs.r2l(3), bs.r2l(2)),
    (bs.r2l(2), bs.r2l(5)),
])
def test_order_roundtrip(tord, eord):
    f = qformat(6, 3)  # width 10 (divisible by 2 and 5)
    t = from_raw(rng.randint(f.raw_min, f.raw_max + 1, size=6), f)
    s = bs.to_bits(t, tord, eord)
    back = bs.from_bits(s, f, (6,), tord, eord, twos_complement=True)
    np.testing.assert_array_equal(back.raw(), t.raw())


def test_r2l_chunk_reversal_exact():
    # elements [e0..e5], r2l<3> -> chunks [e3,e4,e5],[e0,e1,e2]
    f = qformat(2, 0, signed=False)  # width 2
    t = from_raw([0, 1, 2, 3, 0, 1], f)
    s = bs.to_bits(t, bs.r2l(3))
    assert s == "110001" + "000110"


def test_scalar_bitstream_no_tensor_order():
    f = qformat(4, 3)
    t = from_raw(np.array(-37, dtype=object), f)
    assert bs.to_bits(t) == "11011011"
    assert bs.to_bits(t, elem_order=bs.r2l(1)) == "11011011"[::-1]


def test_unsigned_default_parse_wart():
    """Reference parity: parsing is unsigned, so negative raws come back
    shifted by 2^width (QuBLAS.h:4699 + fill, :2447-2452)."""
    f = qformat(2, 1)  # width 4
    t = from_raw([-3], f)
    s = bs.to_bits(t)
    back = bs.from_bits(s, f, (1,))
    assert int(back.raw()[0]) == -3 + 16


def test_wide_width_parses_exactly():
    """Extension over the reference: no 31-bit stoi limit."""
    f = qformat(40, 40)
    raws = np.array([(1 << 77) - 12345, -(1 << 79) + 999], dtype=object)
    t = from_raw(raws, f)
    s = bs.to_bits(t)
    back = bs.from_bits(s, f, (2,), twos_complement=True)
    assert list(back.raw()) == list(raws)


def test_complex_roundtrip_split_at_real_width():
    fr, fi = qformat(3, 2), qformat(4, 1)
    c = complex_from_raw(rng.randint(fr.raw_min, fr.raw_max + 1, 4),
                         rng.randint(fi.raw_min, fi.raw_max + 1, 4), fr, fi)
    s = bs.to_bits_complex(c, bs.r2l(2), None)
    assert len(s) == 4 * (fr.width + fi.width)
    back = bs.from_bits_complex(s, fr, fi, (4,), bs.r2l(2), None,
                                twos_complement=True)
    np.testing.assert_array_equal(back.real.raw(), c.real.raw())
    np.testing.assert_array_equal(back.imag.raw(), c.imag.raw())


def test_reinterpret_real_as_complex():
    """The main.cpp demo: serialize a 2x3 real tensor, parse the same bits
    as a complex 3-vector (main.cpp:8-18)."""
    f = qformat(5, 0)
    t = from_raw([1, 2, 3, 4, 5, 6], f)
    s = bs.to_bits(t, bs.r2l(1))
    z = bs.from_bits_complex(s, f, f, (3,))
    # r2l(1) reverses the six elements: 6,5,4,3,2,1 -> pairs (6,5),(4,3),(2,1)
    assert [int(v) for v in z.real.raw()] == [6, 4, 2]
    assert [int(v) for v in z.imag.raw()] == [5, 3, 1]


def test_nonbinary_chars_filtered():
    # QuBLAS.h:4768-4771: only '0'/'1' survive
    f = qformat(2, 1)  # width 4
    back = bs.from_bits("01 10_, x1110", f, (2,))
    assert [int(v) for v in back.raw()] == [0b0110, 0b1110]


def test_fuzz_roundtrip_representable():
    """Round-trip holds for any width-representable raws, random formats
    (incl. negative int/frac bits) and chunk orders."""
    from qublas_tpu.qformat import qformat as qf

    r = np.random.RandomState(424242)
    for _ in range(120):
        i, f_ = int(r.randint(-4, 30)), int(r.randint(-4, 30))
        if i + f_ < 1:
            continue
        fmt = qf(i, f_, bool(r.randint(0, 2)))
        w = fmt.width
        if w <= 0:
            continue
        lo, hi = ((-(1 << (w - 1)), (1 << (w - 1)) - 1) if fmt.signed
                  else (0, (1 << w) - 1))
        n = int(r.randint(1, 12))
        raws = np.array([int(r.randint(lo, hi + 1)) for _ in range(n)],
                        dtype=object)
        x = from_raw(raws, fmt)
        ct = int(r.choice([c for c in range(1, n + 1) if n % c == 0]))
        ce = int(r.choice([c for c in range(1, w + 1) if w % c == 0]))
        s = bs.to_bits(x, bs.r2l(ct), bs.r2l(ce))
        back = bs.from_bits(s, fmt, (n,), bs.r2l(ct), bs.r2l(ce),
                            twos_complement=fmt.signed)
        assert [int(v) for v in back.raw()] == [int(v) for v in raws], \
            (fmt, n, ct, ce)


def test_qtensor_to_bits_method():
    f = qformat(6, 3)
    t = from_raw(rng.randint(f.raw_min, f.raw_max + 1, size=4), f)
    assert t.to_bits() == bs.to_bits(t)


def test_unsigned_round_trip_with_twos_complement_flag():
    """twos_complement=True must not fabricate negative raws for unsigned
    formats (their logical width has no sign bit) — deep-fuzz regression;
    checkpoint.load used this path for wide unsigned tensors."""
    for f in (qformat(17, 1, signed=False), qformat(50, 8, signed=False),
              qformat(8, 5, signed=False)):
        rng = np.random.RandomState(f.storage_bits)
        raws = np.array([0, 1, int(f.raw_max), int(f.raw_max) - 1,
                         (int(f.raw_max) + 1) // 2], dtype=object)
        t = from_raw(raws, f)
        bits = bs.to_bits(t)
        back = bs.from_bits(bits, f, t.shape, twos_complement=True)
        np.testing.assert_array_equal(
            np.asarray(back.raw(), dtype=object).astype(object),
            raws)


def test_checkpoint_wide_unsigned_round_trip(tmp_path):
    from qublas_tpu import checkpoint

    f = qformat(100, 40, signed=False)  # wide unsigned -> bitstream path
    raws = np.array([int(f.raw_max), 1, (int(f.raw_max) + 1) // 2],
                    dtype=object)
    t = from_raw(raws, f)
    assert t.is_limb  # 140-bit storage is device-limb-resident
    p = str(tmp_path / "wu.npz")
    checkpoint.save(p, t)
    back = checkpoint.load(p)
    np.testing.assert_array_equal(
        np.asarray(back.raw(), dtype=object).astype(object), raws)


def test_misaligned_chunk_raises_like_reference():
    """r2l(chunk) on a length not divisible by chunk throws — exact parity
    with SingleString_s<r2l<n>>::convert (QuBLAS.h:4594-4599)."""
    f = qformat(11, 12, signed=False)  # width 23
    t = from_raw([1, 2], f)
    with pytest.raises(ValueError):
        bs.to_bits(t, None, bs.r2l(3))
