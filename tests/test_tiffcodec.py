"""TIFF codec: matrix roundtrips, TIFF-LZW early-change hand cases,
PackBits spec cases, predictor, multi-page, and error contracts."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.imagecodec import Raster, decode, sniff_format
from pasardassist_spark.operators.tiffcodec import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
    sniff_tiff,
)


def _synth(w: int, h: int, ch: int, seed: int = 0) -> Raster:
    px = bytes(
        (x * 7 + y * 13 + c * 29 + seed) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )
    return Raster(w, h, ch, px)


@pytest.mark.parametrize("bo", ["II", "MM"])
@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("ch", [1, 3])
def test_tiff_matrix_roundtrip(bo, comp, pred, ch):
    r = _synth(21, 17, ch, seed=5)
    payload = encode_tiff(
        [r], byte_order=bo, compression=comp, predictor=pred, rows_per_strip=5
    )
    assert sniff_tiff(payload) and sniff_format(payload) == "tiff"
    assert decode_tiff(payload) == r
    assert decode(payload) == r  # through the shared dispatcher


def test_tiff_multi_page_chain():
    pages = [_synth(9, 7, 3, s) for s in range(4)]
    got = decode_tiff_pages(encode_tiff(pages, compression=5, rows_per_strip=3))
    assert got == pages


def test_tiff_white_is_zero_inverts():
    r = _synth(8, 6, 1, 1)
    p = bytearray(encode_tiff([r], byte_order="II"))
    (ifd,) = struct.unpack_from("<I", p, 4)
    (n,) = struct.unpack_from("<H", p, ifd)
    for i in range(n):
        pos = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", p, pos)[0]
        if tag == 262:
            struct.pack_into("<H", p, pos + 8, 0)
    got = decode_tiff(bytes(p))
    assert got.pixels == bytes(255 - b for b in r.pixels)


def test_tiff_lzw_early_change_vs_gif():
    """TIFF LZW widens at 2^n - 1 (one code EARLIER than GIF's LSB-first
    variant) — a stream long enough to cross the 9->10-bit boundary
    roundtrips only if encoder and decoder agree on the bump point."""
    data = bytes((i * 31 + (i * i) % 97) % 256 for i in range(5000))
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), 5000) == data


def test_tiff_lzw_table_reset_path():
    data = bytes((i * 7 + i // 3) % 256 for i in range(30000))
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), 30000) == data


def test_tiff_lzw_error_contracts():
    good = _lzw_encode_tiff(b"abcabcabc")
    with pytest.raises(ValueError, match="EOI"):
        _lzw_decode_tiff(good[:2], 9)
    with pytest.raises(ValueError, match="overrun"):
        _lzw_decode_tiff(good, 3)


def test_packbits_spec_example():
    """The Apple spec's canonical example roundtrips."""
    raw = bytes.fromhex("aaaaaa80002aaaaaaaaaaa80002a22aaaaaaaaaaaaaaaaaaaa")
    enc = _packbits_encode(raw)
    assert _packbits_decode(enc, len(raw)) == raw
    # canonical greedy encoding: 3-run, 3-literal, 5-run, 4-literal, 10-run
    want = bytes.fromhex("fe aa 02 80 00 2a fc aa 03 80 00 2a 22 f7 aa".replace(" ", ""))
    assert enc == want


def test_packbits_error_contracts():
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="expected"):
        _packbits_decode(_packbits_encode(b"abc"), 5)


def test_tiff_strip_boundaries_not_row_aligned_to_image():
    """rows_per_strip that doesn't divide the height exercises the short
    final strip."""
    r = _synth(10, 11, 3, 2)
    for comp in (1, 5, 32773):
        assert decode_tiff(
            encode_tiff([r], compression=comp, rows_per_strip=4)
        ) == r


def test_tiff_unsupported_paths_raise_by_name():
    r = _synth(6, 5, 1, 0)
    p = bytearray(encode_tiff([r], byte_order="II"))
    (ifd,) = struct.unpack_from("<I", p, 4)
    (n,) = struct.unpack_from("<H", p, ifd)

    def patch(tag, value):
        q = bytearray(p)
        for i in range(n):
            pos = ifd + 2 + 12 * i
            t = struct.unpack_from("<H", q, pos)[0]
            if t == tag:
                struct.pack_into("<H", q, pos + 8, value)
        return bytes(q)

    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        decode_tiff(patch(258, 16))
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(patch(259, 7))  # JPEG-in-TIFF
    # photometric 3 without a ColorMap is now MALFORMED, not a seam
    # (palette decode is real since round 14)
    with pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(patch(262, 3))


def test_tiff_truncation_and_garbage_raise():
    payload = encode_tiff([_synth(12, 9, 3, 1)], compression=5)
    for cut in (3, 6, 30, len(payload) // 2):
        with pytest.raises(ValueError):
            decode_tiff(payload[:cut])
    with pytest.raises(ValueError):
        decode_tiff(b"II+\x00garbage")


# ------------------------------------------------- round 14: tiles/palette


def test_tiled_roundtrip_full_matrix():
    """16x16 tile grid across both endians, all compressions, both
    predictors, gray+RGB, with edge tiles in both dimensions (26x24
    over 16x16 -> 2x2 grid, right and bottom padding discarded)."""
    for bo in ("II", "MM"):
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                for ch in (1, 3):
                    pages = [_synth(26, 24, ch, s) for s in (3, 40)]
                    payload = encode_tiff(
                        pages, byte_order=bo, compression=comp,
                        predictor=pred, tile=(16, 16),
                    )
                    assert decode_tiff_pages(payload) == pages


def test_palette_roundtrip_maps_colormap():
    from pasardassist_spark.operators.tiffcodec import PALETTE_MAP

    for layout in (dict(rows_per_strip=5), dict(tile=(16, 16))):
        gray = _synth(19, 17, 1, 7)
        payload = encode_tiff([gray], compression=5, palette=True, **layout)
        (got,) = decode_tiff_pages(payload)
        assert (got.width, got.height, got.channels) == (19, 17, 3)
        expected = b"".join(bytes(PALETTE_MAP[v]) for v in gray.pixels)
        assert got.pixels == expected


def test_tile_grid_errors():
    pages = [_synth(26, 24, 1, 3)]
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(pages, tile=(10, 16))
    payload = bytearray(encode_tiff(pages, tile=(16, 16)))
    (ifd,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd)
    for i in range(n):
        pos = ifd + 2 + 12 * i
        if struct.unpack_from("<H", payload, pos)[0] == 322:
            struct.pack_into("<H", payload, pos + 8, 24)  # not 16-multiple
    with pytest.raises(ValueError, match="tile size"):
        decode_tiff(bytes(payload))


def test_palette_requires_single_channel():
    with pytest.raises(ValueError, match="single-channel"):
        encode_tiff([_synth(8, 8, 3, 0)], palette=True)
