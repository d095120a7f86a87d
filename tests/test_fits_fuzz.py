"""FITS reader fuzz corpus: malformed and edge-case files through BOTH
readers (pure-numpy utils/fits.py and the C++ native tile reader).

Contract under fuzz (reference counterpart: fitsio's hardened parser,
used at reference utils.py:340-418): a reader either returns correct
data or a clean failure (None / error code) — never a crash, never an
out-of-bounds access, never silent garbage.  Where both readers accept
a file they must agree bit-for-bit (the native reader found a real OOB
heap write and a D-exponent mis-parse in earlier reviews; this corpus
pins the whole class).
"""

import numpy as np
import pytest

from caesar_yolo_tpu.utils import fits_native
from caesar_yolo_tpu.utils.fits import (get_fits_header, read_fits,
                                        read_fits_crop)

NATIVE = fits_native.available()


def _header_bytes(cards):
    head = "".join(c.ljust(80) for c in cards).encode("ascii")
    return head + b" " * (-len(head) % 2880)


def _card(key, val):
    return f"{key:<8}= {val:>20}"


def _basic_cards(bitpix, nx, ny, extra=(), naxis=2, dims_extra=()):
    cards = [_card("SIMPLE", "T"), _card("BITPIX", bitpix),
             _card("NAXIS", naxis), _card("NAXIS1", nx),
             _card("NAXIS2", ny)]
    for i, d in enumerate(dims_extra, start=3):
        cards.append(_card(f"NAXIS{i}", d))
    cards.extend(extra)
    cards.append("END")
    return cards


def _write(path, cards, body: bytes, pad=True):
    if pad:
        body = body + b"\x00" * (-len(body) % 2880)
    with open(path, "wb") as f:
        f.write(_header_bytes(cards) + body)
    return str(path)


def _native_full(path, nx, ny):
    if not NATIVE:
        return None
    tiles = fits_native.read_tiles_batch(str(path), [[0, nx, 0, ny]])
    return None if tiles is None else tiles[0]


# ---------------------------------------------------------------- corpus


def test_blank_int_pixels_zeroed_both_readers(tmp_path):
    """BLANK sentinel in int16 data -> 0 (NaN convention), not the huge
    scaled value; python and native agree."""
    raw = np.arange(-8, 8, dtype=np.int16).reshape(4, 4)
    raw[1, 2] = -32768
    cards = _basic_cards(16, 4, 4, extra=[
        _card("BSCALE", "2.0"), _card("BZERO", "100.0"),
        _card("BLANK", "-32768")])
    p = _write(tmp_path / "blank.fits", cards, raw.astype(">i2").tobytes())
    out, _, _ = read_fits(p)
    expect = raw.astype(np.float32) * 2.0 + 100.0
    expect[1, 2] = 0.0
    np.testing.assert_allclose(out, expect)
    if NATIVE:
        np.testing.assert_allclose(_native_full(p, 4, 4), expect)


def test_blank_ignored_for_float_data(tmp_path):
    """BLANK is only defined for integer data; float files with a BLANK
    card keep their values."""
    data = np.linspace(-1, 1, 16, dtype=np.float32).reshape(4, 4)
    cards = _basic_cards(-32, 4, 4, extra=[_card("BLANK", "0")])
    p = _write(tmp_path / "blankf.fits", cards,
               data.astype(">f4").tobytes())
    out, _, _ = read_fits(p)
    np.testing.assert_allclose(out, data, rtol=1e-6)
    if NATIVE:
        np.testing.assert_allclose(_native_full(p, 4, 4), data, rtol=1e-6)


def test_absurd_bscale_overflows_to_zero_not_crash(tmp_path):
    """BSCALE=1e300 overflows f32 -> non-finite -> 0 in both readers."""
    raw = np.full((4, 4), 1000, dtype=np.int32)
    cards = _basic_cards(32, 4, 4, extra=[_card("BSCALE", "1.0E300")])
    p = _write(tmp_path / "huge.fits", cards, raw.astype(">i4").tobytes())
    out, _, _ = read_fits(p)
    assert np.isfinite(out).all() and (out == 0).all()
    if NATIVE:
        nat = _native_full(p, 4, 4)
        np.testing.assert_array_equal(nat, out)


def test_nonsense_bscale_string_no_crash(tmp_path):
    raw = np.ones((4, 4), dtype=np.int16)
    cards = _basic_cards(16, 4, 4, extra=[
        f"{'BSCALE':<8}= {'banana':>20}", _card("BLANK", "'x'")])
    p = _write(tmp_path / "bad.fits", cards, raw.astype(">i2").tobytes())
    res = read_fits(p)  # malformed numeric cards: clean result or None
    if res is not None:
        assert np.isfinite(res[0]).all()
    if NATIVE:
        _native_full(p, 4, 4)  # must not crash


def test_endless_header_fails_cleanly(tmp_path):
    cards = _basic_cards(16, 4, 4)[:-1]  # drop END
    head = "".join(c.ljust(80) for c in cards).encode("ascii")
    head += b" " * (-len(head) % 2880)
    p = tmp_path / "noend.fits"
    p.write_bytes(head + np.ones((4, 4), ">i2").tobytes())
    assert read_fits(str(p)) is None
    assert read_fits_crop(str(p), 0, 2, 0, 2) is None
    assert get_fits_header(str(p)) is None
    if NATIVE:
        assert fits_native.read_tiles_batch(str(p), [[0, 4, 0, 4]]) is None


def test_truncated_header_block(tmp_path):
    p = tmp_path / "trunchead.fits"
    p.write_bytes(_header_bytes(_basic_cards(16, 4, 4))[:1000])
    assert read_fits(str(p)) is None
    if NATIVE:
        assert fits_native.read_tiles_batch(str(p), [[0, 4, 0, 4]]) is None


def test_truncated_data_block_windowed(tmp_path):
    """Data section shorter than NAXIS promises: full read fails cleanly;
    windowed reads inside the available bytes still succeed (the native
    reader preads per row), out-of-data windows fail cleanly."""
    raw = np.arange(64, dtype=np.int16).reshape(8, 8)
    cards = _basic_cards(16, 8, 8)
    p = _write(tmp_path / "truncdata.fits", cards,
               raw.astype(">i2").tobytes()[:64], pad=False)  # 4 rows only
    assert read_fits(p) is None
    if NATIVE:
        ok = fits_native.read_tiles_batch(p, [[0, 8, 0, 4]])
        assert ok is not None
        np.testing.assert_array_equal(ok[0], raw[:4].astype(np.float32))
        assert fits_native.read_tiles_batch(p, [[0, 8, 4, 8]]) is None


def test_naxis3_nondegenerate_rejected(tmp_path):
    """A real cube (NAXIS=3, NAXIS3=4) is unsupported by design: clean
    rejection, not a mis-shaped array."""
    raw = np.ones((4, 4, 4), dtype=np.float32)
    cards = _basic_cards(-32, 4, 4, naxis=3, dims_extra=(4,))
    p = _write(tmp_path / "cube.fits", cards, raw.astype(">f4").tobytes())
    assert read_fits(p) is None
    assert read_fits_crop(p, 0, 2, 0, 2) is None
    if NATIVE:
        assert fits_native.read_tiles_batch(p, [[0, 4, 0, 4]]) is None


def test_naxis4_nondegenerate_semantics(tmp_path):
    """Non-degenerate NAXIS=4: full read returns plane [0,0] (REFERENCE
    PARITY — reference utils.py:208-216 takes data[0,0,:,:] for any 4D
    cube); windowed reads reject it (both the numpy crop reader and the
    native tile reader), since a window into an arbitrary plane of a
    real cube would be ambiguous."""
    raw = np.stack([np.full((4, 4), k, np.float32) for k in range(4)])
    raw = raw.reshape(2, 2, 4, 4)
    cards = _basic_cards(-32, 4, 4, naxis=4, dims_extra=(2, 2))
    p = _write(tmp_path / "cube4.fits", cards, raw.astype(">f4").tobytes())
    out, _, _ = read_fits(p)
    np.testing.assert_array_equal(out, raw[0, 0])
    assert read_fits_crop(p, 0, 2, 0, 2) is None
    if NATIVE:
        assert fits_native.read_tiles_batch(p, [[0, 4, 0, 4]]) is None


def test_naxis4_degenerate_accepted_both(tmp_path):
    data = np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 1, 4, 4)
    cards = _basic_cards(-32, 4, 4, naxis=4, dims_extra=(1, 1))
    p = _write(tmp_path / "deg4.fits", cards, data.astype(">f4").tobytes())
    out, _, _ = read_fits(p)
    np.testing.assert_allclose(out, data[0, 0], rtol=1e-6)
    if NATIVE:
        np.testing.assert_allclose(_native_full(p, 4, 4), data[0, 0],
                                   rtol=1e-6)


def test_continue_long_string_cards(tmp_path):
    """OGIP long-string convention: value split over CONTINUE cards is
    reassembled; a stray CONTINUE without a pending '&' is ignored."""
    data = np.zeros((2, 2), dtype=np.float32)
    cards = [_card("SIMPLE", "T"), _card("BITPIX", -32),
             _card("NAXIS", 2), _card("NAXIS1", 2), _card("NAXIS2", 2),
             f"{'LONGSTR':<8}= 'first part of a ve&'",
             f"{'CONTINUE':<8}  'ry long string va&'",
             f"{'CONTINUE':<8}  'lue' / with a comment",
             f"{'CONTINUE':<8}  'orphan continue'",
             f"{'AFTER':<8}= {7:>20}",
             "END"]
    p = _write(tmp_path / "cont.fits", cards, data.astype(">f4").tobytes())
    out, header, _ = read_fits(p)
    assert header["LONGSTR"] == "first part of a very long string value"
    assert header["AFTER"] == 7
    np.testing.assert_array_equal(out, data)
    if NATIVE:  # numeric keys unaffected by CONTINUE cards
        np.testing.assert_array_equal(_native_full(p, 2, 2), data)


def test_zero_sized_axes_no_crash(tmp_path):
    for nx, ny in [(0, 4), (4, 0), (0, 0)]:
        cards = _basic_cards(16, nx, ny)
        p = _write(tmp_path / f"z{nx}{ny}.fits", cards, b"")
        res = read_fits(p)
        if res is not None:
            assert res[0].size == 0
        if NATIVE:
            assert fits_native.read_tiles_batch(p, [[0, 4, 0, 4]]) is None


def test_negative_axis_sizes_no_crash(tmp_path):
    cards = _basic_cards(16, -4, 4)
    p = _write(tmp_path / "neg.fits", cards, b"\x00" * 64)
    assert read_fits(p) is None
    if NATIVE:
        assert fits_native.read_tiles_batch(p, [[0, 4, 0, 4]]) is None


def test_random_mutation_fuzz_no_crash(tmp_path):
    """200 seeded random corruptions of a valid file (byte flips,
    truncations, block deletions): every read returns data or None —
    never raises, never crashes the native library."""
    rng = np.random.default_rng(0)
    raw = rng.integers(-500, 500, (16, 16), dtype=np.int16)
    cards = _basic_cards(16, 16, 16, extra=[
        _card("BSCALE", "0.5"), _card("BZERO", "10.0"),
        _card("BLANK", "-400")])
    base = _write(tmp_path / "base.fits", cards,
                  raw.astype(">i2").tobytes())
    blob = bytearray(open(base, "rb").read())
    p = tmp_path / "mut.fits"
    for trial in range(200):
        mut = bytearray(blob)
        kind = trial % 4
        if kind == 0:  # flip a few bytes anywhere
            for _ in range(int(rng.integers(1, 8))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256))
        elif kind == 1:  # truncate
            mut = mut[:int(rng.integers(0, len(mut)))]
        elif kind == 2:  # corrupt header cards with random ASCII
            for _ in range(int(rng.integers(1, 5))):
                off = int(rng.integers(0, 2880 - 80))
                mut[off:off + 80] = bytes(rng.integers(32, 127, 80,
                                                       dtype=np.uint8))
        else:  # splice random binary into the data section
            off = 2880 + int(rng.integers(0, max(1, len(mut) - 2900)))
            mut[off:off + 16] = bytes(rng.integers(0, 256, 16,
                                                   dtype=np.uint8))
        p.write_bytes(bytes(mut))
        res = read_fits(str(p))
        if res is not None:
            data = res[0]
            assert isinstance(data, np.ndarray)
            assert np.isfinite(data).all()
        res2 = read_fits_crop(str(p), 1, 9, 2, 12)
        if res2 is not None:
            assert np.isfinite(res2[0]).all()
        if NATIVE:
            t = fits_native.read_tiles_batch(str(p), [[1, 9, 2, 12]])
            if t is not None:
                assert np.isfinite(t[0]).all()


@pytest.mark.skipif(not NATIVE, reason="native library not built")
def test_mutation_fuzz_parity_where_both_succeed(tmp_path):
    """Header-mutation fuzz where BOTH readers still accept the file:
    they must agree exactly (the format-authority contract)."""
    rng = np.random.default_rng(7)
    raw = rng.integers(-500, 500, (12, 12), dtype=np.int16)
    agreements = 0
    for trial in range(60):
        bscale = float(rng.choice([1.0, 0.25, 3.0, 1e-3]))
        bzero = float(rng.choice([0.0, 50.0, -7.5]))
        blank = int(rng.integers(-500, 500))
        cards = _basic_cards(16, 12, 12, extra=[
            _card("BSCALE", f"{bscale!r}"), _card("BZERO", f"{bzero!r}"),
            _card("BLANK", str(blank))])
        p = _write(tmp_path / f"par{trial}.fits", cards,
                   raw.astype(">i2").tobytes())
        full = read_fits(p)
        nat = _native_full(p, 12, 12)
        if full is not None and nat is not None:
            np.testing.assert_allclose(nat, full[0].astype(np.float32),
                                       rtol=1e-6, atol=1e-6)
            agreements += 1
    assert agreements >= 50
