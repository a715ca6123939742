"""VP8L (lossless WebP) codec: lossless round-trips across the full
transform/feature matrix, hand-checkable entropy primitives, and the
loud unsupported seams (lossy VP8, VP8X, meta-prefix)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pasardassist_spark.operators import webpcodec as W
from pasardassist_spark.operators.imagecodec import Raster, decode, sniff_format


def synth(w: int, h: int, seed: int) -> Raster:
    x = np.arange(w)
    y = np.arange(h).reshape(h, 1)
    base = (x * 7 + y * 13 + seed) % 256
    rgb = np.stack(
        [base, (base + 29) % 256, (base + 58) % 256], axis=-1
    ).astype(np.uint8)
    return Raster(w, h, 3, rgb.tobytes())


FEATURE_MATRIX = [
    dict(),
    dict(subtract_green=True),
    dict(cache_bits=4),
    dict(use_runs=True),
    dict(subtract_green=True, cache_bits=6, use_runs=True),
    dict(predictor_mode=7),
    dict(color_transform=(32, 16, 8)),
    dict(predictor_mode=11, color_transform=(255, 1, 128), subtract_green=True),
]


@pytest.mark.parametrize("kw", FEATURE_MATRIX)
@pytest.mark.parametrize("w,h,seed", [(17, 11, 3), (1, 1, 9), (40, 30, 1)])
def test_lossless_roundtrip_feature_matrix(w, h, seed, kw):
    rast = synth(w, h, seed)
    p = W.encode_webp_lossless(rast, **kw)
    got = W.decode_webp(p)
    assert (got.width, got.height, got.channels) == (w, h, 3)
    assert got.pixels == rast.pixels


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes_roundtrip(mode):
    rast = synth(20, 14, 5)
    p = W.encode_webp_lossless(rast, predictor_mode=mode)
    assert W.decode_webp(p).pixels == rast.pixels


@pytest.mark.parametrize("ncol,w,h", [(200, 30, 10), (12, 25, 9), (3, 17, 6), (2, 9, 4)])
def test_palette_roundtrip_including_bundling(ncol, w, h):
    """Color-indexing with sub-byte bundling: palettes of 2/3/12 colors
    pack 8/4/2 indices per green byte; 200 colors stay unbundled."""
    vals = np.array([(i * 37) % ncol for i in range(w * h)]).reshape(h, w)
    pal = np.array(
        [[(c * 11) % 256, (c * 29) % 256, (c * 53) % 256] for c in range(ncol)],
        dtype=np.uint8,
    )
    rast = Raster(w, h, 3, pal[vals].tobytes())
    p = W.encode_webp_lossless(rast, palette=True)
    assert W.decode_webp(p).pixels == rast.pixels


def test_palette_plus_predictor_inverse_uses_coded_width():
    """Spec-legal ordering: a predictor transform applied AFTER color
    indexing (encode side) operates on the palette-narrowed coded plane,
    so its inverse must run at the coded width — this used to IndexError.

    Builds the coded plane by hand: target bundled indices → predictor
    residuals via the forward relation, then asserts the full inverse
    chain reproduces the palette expansion."""
    w, h = 8, 2
    pal = np.array(
        [0xFF000000 | (c << 16) | ((c * 7) << 8) | (c * 31) for c in (1, 2, 3)],
        dtype=np.uint32,
    )
    # 3 colors → wbits=2, 4 indices per green byte, coded width = 2
    idx = np.array([[0, 1, 2, 0, 1, 2, 0, 1], [2, 1, 0, 2, 1, 0, 2, 1]])
    packed = np.zeros((h, 2), dtype=np.uint32)
    for k in range(4):
        packed |= (idx[:, k::4].astype(np.uint32) & 0x3) << np.uint32(8 + k * 2)
    # predictor tile grid (1,1), mode 2 = T, stored in the green byte
    mode_data = np.array([[2 << 8]], dtype=np.uint32)
    resid = np.zeros_like(packed)
    for y in range(h):
        for x in range(2):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(packed[y, x - 1])
            elif x == 0:
                pred = int(packed[y - 1, x])
            else:
                L, T, TL = (int(packed[y, x - 1]), int(packed[y - 1, x]),
                            int(packed[y - 1, x - 1]))
                TR = int(packed[y - 1, x + 1]) if x + 1 < 2 else int(packed[y, 0])
                pred = W._predict(2, L, T, TL, TR)
            resid[y, x] = W._sub_pixels(int(packed[y, x]), pred)
    # read order [color-indexing, predictor] → inverse runs predictor first
    out = W._apply_inverse_transforms(
        resid, [(3, pal, 0), (0, mode_data, 2)], w, h
    )
    assert out.shape == (h, w)
    assert (out == pal[idx]).all()


def test_lz77_runs_and_cache_compress_flat_color():
    flat = Raster(50, 20, 3, bytes([9, 200, 77]) * 1000)
    p = W.encode_webp_lossless(flat, use_runs=True, cache_bits=3)
    assert W.decode_webp(p).pixels == flat.pixels
    assert len(p) < 100  # a 3000-byte raster collapses into runs


def test_sniff_and_dispatch():
    rast = synth(9, 7, 2)
    p = W.encode_webp_lossless(rast)
    assert sniff_format(p) == "webp"
    got = decode(p)
    assert got.pixels == rast.pixels


def test_prefixed_int_roundtrip_exhaustive():
    """_prefix_of_int must invert _read_prefixed_int over the whole
    LZ77 length/distance range the 24/40-symbol alphabets cover."""
    for value in list(range(1, 2000)) + [2**14, 2**19, 2**20 - 1]:
        sym, extra, extra_val = W._prefix_of_int(value)
        w = W._LsbWriter()
        w.write(extra_val, extra)
        r = W._LsbReader(bytes(w.out) or b"\x00")
        assert W._read_prefixed_int(r, sym) == value, value


def test_plane_code_table_shape():
    """120 distinct in-window offsets, distance-sorted, (1,0) and (0,1)
    in the first two slots (the only cross-impl anchor certain from the
    spec prose)."""
    t = W.PLANE_CODES
    assert len(t) == 120 and len(set(t)) == 120
    assert set(t[:2]) == {(0, 1), (1, 0)}
    d2 = [dx * dx + dy * dy for dx, dy in t]
    assert d2 == sorted(d2)
    assert all(0 <= dy <= 7 for _, dy in t)


def test_equal_weight_lengths_complete():
    # n=1 is the spec's zero-bit single-symbol special case, exempt from
    # Kraft completeness
    assert W._equal_weight_lengths(1) == [1]
    for n in (2, 3, 5, 17, 256, 280, 300):
        lens = W._equal_weight_lengths(n)
        assert len(lens) == n
        assert abs(sum(2.0 ** -v for v in lens) - 1.0) < 1e-12, n


def test_prefix_code_write_read_roundtrip():
    """The code-length-coded tree transmission: sparse maps with interior
    zero runs (both 17- and 18-coded) and trailing zeros."""
    cases = [
        {0: 1, 255: 1},
        dict(zip(range(256), W._equal_weight_lengths(256))),
        {5: 2, 6: 2, 100: 2, 200: 2},  # big interior gaps
        {i: ln for i, ln in zip(range(0, 40, 2), W._equal_weight_lengths(20))},
    ]
    for lengths in cases:
        w = W._LsbWriter()
        W._write_prefix_code(w, lengths, 280)
        dec = W._read_prefix_code(W._LsbReader(bytes(w.out)), 280)
        codes = W._canonical_codes(lengths)
        for sym, (code, ln) in codes.items():
            w2 = W._LsbWriter()
            w2.write_code(code, ln)
            assert dec.decode(W._LsbReader(bytes(w2.out))) == sym


def test_unsupported_raise_by_name():
    rast = synth(8, 8, 1)
    p = bytearray(W.encode_webp_lossless(rast))
    lossy = bytearray(p)
    i = lossy.find(b"VP8L")
    lossy[i : i + 4] = b"VP8 "
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp(bytes(lossy))
    with pytest.raises(ValueError):
        W.decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        W.decode_webp(b"not riff at all")
    with pytest.raises(ValueError):
        W.decode_webp(bytes(p)[: len(p) - 4])  # truncated chunk


def test_dimension_bomb_guard():
    rast = synth(8, 8, 1)
    p = bytearray(W.encode_webp_lossless(rast))
    i = p.find(b"VP8L") + 8
    assert p[i] == 0x2F
    # forge 14-bit width/height = 16384 x 16384 > the shared pixel cap
    forged = (16383) | (16383 << 14)
    p[i + 1 : i + 5] = struct.pack("<I", forged | (p[i + 4] & 0xF0) << 24)[:4]
    with pytest.raises(ValueError, match="decompression-bomb"):
        W.decode_webp(bytes(p))


def test_subtract_green_is_exact_inverse():
    """Channel math spot check: r/b shift by g mod 256 both ways."""
    rast = Raster(2, 1, 3, bytes([250, 200, 10, 3, 7, 255]))
    p = W.encode_webp_lossless(rast, subtract_green=True)
    assert W.decode_webp(p).pixels == rast.pixels
