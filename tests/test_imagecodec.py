"""Pure-Python image codec tests: known-byte fixtures, forward-filtered PNG
streams (the test applies spec filters forward; the decoder must invert
them), BMP layout variants, and the real decode/resize Spark stages checked
against independent arithmetic."""

from __future__ import annotations

import struct
import zlib

import pytest

from pasardassist_spark.operators import imagecodec as C


RGB_2x2 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])


def test_ppm_p6_roundtrip():
    r = C.Raster(2, 2, 3, RGB_2x2)
    payload = C.encode_ppm(r)
    assert payload.startswith(b"P6\n2 2\n255\n")
    d = C.decode(payload)
    assert d == r
    assert C.sniff_format(payload) == "ppm"


def test_pgm_p5_roundtrip():
    r = C.Raster(3, 2, 1, bytes([0, 128, 255, 1, 2, 3]))
    d = C.decode(C.encode_ppm(r))
    assert d == r


def test_ppm_ascii_p3_with_comments():
    payload = b"P3\n# a comment\n2 1\n# another\n255\n10 20 30  40 50 60\n"
    d = C.decode_ppm(payload)
    assert d == C.Raster(2, 1, 3, bytes([10, 20, 30, 40, 50, 60]))


def test_pgm_ascii_p2_maxval_scaling():
    # maxval 15 scales to 0..255 via v*255//15
    payload = b"P2\n2 1\n15\n0 15\n"
    d = C.decode_ppm(payload)
    assert d == C.Raster(2, 1, 1, bytes([0, 255]))


def test_ppm_truncated_raster_raises():
    with pytest.raises(ValueError):
        C.decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)


def test_bmp_roundtrip_bottom_up_with_padding():
    # width 3 -> 9-byte rows padded to 12: exercises stride logic
    px = bytes(range(3 * 2 * 3))
    r = C.Raster(3, 2, 3, px)
    payload = C.encode_bmp(r)
    assert C.sniff_format(payload) == "bmp"
    assert C.decode(payload) == r


def test_bmp_top_down_and_32bpp():
    # hand-built: 2x2 top-down 32bpp BGRA
    w, h = 2, 2
    pixels_rgb = RGB_2x2
    raster = bytearray()
    for y in range(h):  # top-down: rows in display order
        for x in range(w):
            p = (y * w + x) * 3
            rr, gg, bb = pixels_rgb[p], pixels_rgb[p + 1], pixels_rgb[p + 2]
            raster += bytes((bb, gg, rr, 0xFF))  # BGRA
    data_off = 54
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(raster), 0, 0, 0, 0)
    d = C.decode_bmp(header + info + bytes(raster))
    assert d == C.Raster(w, h, 3, pixels_rgb)


def test_bmp_unknown_compression_rejected():
    payload = bytearray(C.encode_bmp(C.Raster(1, 1, 3, b"\x01\x02\x03")))
    struct.pack_into("<I", payload, 30, 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError):
        C.decode_bmp(bytes(payload))
    # RLE8 is read since r15 but REQUIRES 8 bpp — a 24-bpp RLE header
    # is malformed, not a seam
    struct.pack_into("<I", payload, 30, 1)
    with pytest.raises(ValueError, match="requires 8 bpp"):
        C.decode_bmp(bytes(payload))


def test_bmp_indexed_roundtrips_all_depths():
    """r15: 1/4/8-bit indexed BMPs with BGRX color tables, packed rows
    padded to 4-byte boundaries, decoded through the palette."""
    import numpy as np

    rng = np.random.default_rng(11)
    for w, h, bpp in [(9, 8, 8), (16, 5, 4), (33, 7, 1), (3, 2, 8)]:
        ncol = min(1 << bpp, 7)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w))
        r = C.Raster(w, h, 3, pal[idx].astype(np.uint8).tobytes())
        payload = C.encode_bmp_indexed(r, bpp)
        assert C.sniff_format(payload) == "bmp"
        assert C.decode(payload) == r


def test_bmp_rle8_roundtrip_and_escapes():
    """BI_RLE8 encoded runs + EOL/EOD escapes roundtrip; delta and
    absolute-mode escapes decode from a hand-built stream."""
    import numpy as np

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = np.repeat(rng.integers(0, 5, (6, 4)), 3, axis=1)  # runs
    r = C.Raster(12, 6, 3, pal[idx].astype(np.uint8).tobytes())
    assert C.decode(C.encode_bmp_indexed(r, 8, rle=True)) == r
    # hand-built 4x2 stream: absolute run, delta skip, EOL, run, EOD
    pal2 = bytes((0, 0, 0, 0)) + bytes((10, 20, 30, 0))  # BGRX x2
    rle = bytes(
        [0, 3, 1, 1, 1, 0,  # absolute: 3 literals + pad
         0, 2, 1, 0,        # delta dx=1 (skipped pixel = index 0)
         0, 0,              # EOL
         4, 1,              # run of 4 x index 1
         0, 1]              # EOD
    )
    data_off = 14 + 40 + len(pal2)
    header = struct.pack("<2sIHHI", b"BM", data_off + len(rle), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle), 0, 0, 2, 0
    )
    d = C.decode_bmp(header + info + pal2 + rle)
    import numpy as np

    got = np.frombuffer(d.pixels, dtype=np.uint8).reshape(2, 4, 3)
    # bottom row: 3 literal index-1 + 1 skipped (index 0)
    assert got[1].tolist() == [[30, 20, 10]] * 3 + [[0, 0, 0]]
    assert got[0].tolist() == [[30, 20, 10]] * 4


def test_bmp_rle8_torn_raises():
    r = C.Raster(4, 2, 3, bytes(24))
    payload = C.encode_bmp_indexed(r, 8, rle=True)
    with pytest.raises(ValueError, match="torn BMP RLE8"):
        C.decode_bmp(payload[:-3])


def test_bmp_index_beyond_palette_raises():
    r = C.Raster(2, 1, 3, bytes((1, 1, 1, 2, 2, 2)))
    payload = bytearray(C.encode_bmp_indexed(r, 8))
    struct.pack_into("<I", payload, 46, 1)  # colors_used -> 1
    with pytest.raises(ValueError, match="beyond the color table|beyond color table|beyond"):
        C.decode_bmp(bytes(payload))


def _apply_filter(ftype: int, line: bytes, prev: bytes, bypp: int) -> bytes:
    """FORWARD PNG filter (spec §9) — independent of the decoder's inverse."""
    out = bytearray()
    for i, v in enumerate(line):
        a = line[i - bypp] if i >= bypp else 0
        b = prev[i] if prev else 0
        c = prev[i - bypp] if (prev and i >= bypp) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(w, h, channels, pixels, filters):
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = bytearray()
    prev = b""
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filters[y])
        raw += _apply_filter(filters[y], line, prev, channels)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        C.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_rgb():
    # 4x5 RGB, one row per filter type; test applies filters FORWARD, the
    # decoder must invert every one of them byte-exactly
    w, h = 4, 5
    pixels = bytes((x * 31 + y * 57 + c * 13) % 256
                   for y in range(h) for x in range(w) for c in range(3))
    payload = _png_with_filters(w, h, 3, pixels, [0, 1, 2, 3, 4])
    assert C.sniff_format(payload) == "png"
    assert C.decode(payload) == C.Raster(w, h, 3, pixels)


def test_png_gray_and_alpha_drop():
    gray = bytes([5, 250, 100, 7])
    assert C.decode(_png_with_filters(2, 2, 1, gray, [0, 4])) == C.Raster(2, 2, 1, gray)
    # RGBA: alpha channel must be stripped on decode
    rgba = bytes([1, 2, 3, 9, 4, 5, 6, 8])
    assert C.decode(_png_with_filters(2, 1, 4, rgba, [1])) == C.Raster(
        2, 1, 3, bytes([1, 2, 3, 4, 5, 6])
    )
    # gray+alpha (color type 4)
    ga = bytes([11, 200, 22, 100])
    assert C.decode(_png_with_filters(2, 1, 2, ga, [0])) == C.Raster(
        2, 1, 1, bytes([11, 22])
    )


def test_png_roundtrip_via_own_encoder():
    px = bytes((i * 7) % 256 for i in range(6 * 4 * 3))
    r = C.Raster(6, 4, 3, px)
    assert C.decode(C.encode_png(r)) == r


def test_png_adam7_interlace_roundtrip():
    """Adam7 is now decoded for real: the interlaced encoding of a raster
    must decode identically to the non-interlaced one, across sizes that
    exercise empty and partial passes."""
    import numpy as np

    for w, h in [(1, 1), (3, 2), (8, 8), (13, 9), (17, 5)]:
        px = bytes((x * 7 + y * 13 + 3) % 256 for y in range(h) for x in range(w * 3))
        r = C.Raster(w, h, 3, px)
        plain = C.decode_png(C.encode_png(r))
        inter = C.decode_png(C.encode_png(r, interlace=True))
        assert plain.pixels == px == inter.pixels, (w, h)
    # grayscale too
    g = C.Raster(9, 6, 1, bytes(range(54)))
    assert C.decode_png(C.encode_png(g, interlace=True)).pixels == g.pixels


def test_png_palette_all_depths():
    import numpy as np

    pal = bytes(b for c in range(16) for b in ((c * 11) % 256, (c * 29) % 256, (c * 53) % 256))
    for depth, ncol in ((1, 2), (2, 4), (4, 16), (8, 16)):
        w, h = 11, 5
        idx = bytes((x + y) % ncol for y in range(h) for x in range(w))
        p = C.encode_png_palette(idx, w, h, pal[: ncol * 3], depth=depth)
        r = C.decode_png(p)
        assert r.channels == 3
        want = bytes(
            b
            for i in idx
            for b in pal[i * 3 : i * 3 + 3]
        )
        assert r.pixels == want, depth


def test_png_16bit_msb_normalization():
    """16-bit samples normalize to their most significant byte."""
    w, h = 3, 2
    hi = bytes([10, 20, 30, 40, 50, 60])
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter none
        for x in range(w):
            raw += bytes([hi[y * w + x], 0xAB])  # MSB, LSB
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    p = C.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(raw))
    ) + chunk(b"IEND", b"")
    r = C.decode_png(p)
    assert (r.width, r.height, r.channels) == (w, h, 1)
    assert r.pixels == hi


def test_png_subbyte_gray_scales_to_full_range():
    """Depth-1 grayscale: bit 1 -> 255, bit 0 -> 0 (spec sample scaling)."""
    w, h = 10, 2
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1] * 2
    packed = bytearray()
    for y in range(h):
        packed.append(0)
        row = bits[y * w : (y + 1) * w] + [0] * 6  # pad to byte
        for i in range(0, 16, 8):
            b = 0
            for j in range(8):
                b = (b << 1) | row[i + j]
            packed.append(b)
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    p = C.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(packed))
    ) + chunk(b"IEND", b"")
    r = C.decode_png(p)
    assert list(r.pixels) == [255 if b else 0 for b in bits]


def test_png_palette_guards():
    pal = bytes(range(12))  # 4 colors
    with pytest.raises(ValueError, match="index out of range"):
        C.encode_png_palette(bytes([0, 5]), 2, 1, pal, depth=8)
    p = bytearray(C.encode_png_palette(bytes([0, 3]), 2, 1, pal, depth=8))
    # strip PLTE: decoder must demand it
    i = p.find(b"PLTE") - 4
    (ln,) = struct.unpack_from(">I", p, i)
    del p[i : i + 12 + ln]
    with pytest.raises(ValueError, match="missing PLTE"):
        C.decode_png(bytes(p))


def test_resize_nearest_known_grid():
    # 4x4 grid downsampled to 2x2: nearest picks source (0,0),(2,0),(0,2),(2,2)
    px = bytes(range(4 * 4))  # gray values 0..15 row-major
    out = C.resize_nearest(C.Raster(4, 4, 1, px), 2, 2)
    assert out == C.Raster(2, 2, 1, bytes([0, 2, 8, 10]))
    # upsample 1x1 -> 3x2 replicates the single pixel
    up = C.resize_nearest(C.Raster(1, 1, 3, b"\x09\x08\x07"), 3, 2)
    assert up.pixels == b"\x09\x08\x07" * 6


def test_sniff_rejects_text():
    assert C.sniff_format(b"hello world, plain text payload") is None
    assert C.sniff_format(b"Paragraph starting with P") is None
    with pytest.raises(NotImplementedError):
        C.decode(b"not an image")


def test_decode_image_entrypoint_real(spark):
    """operators/multimodal.decode_image is no longer a stub: it parses
    real bytes for every supported container."""
    from pasardassist_spark.operators.multimodal import decode_image

    r = C.Raster(5, 3, 3, bytes((i * 3) % 256 for i in range(45)))
    for payload in (C.encode_ppm(r), C.encode_bmp(r), C.encode_png(r)):
        assert decode_image(payload) == (5, 3)


def test_extract_features_falls_back_on_image_lookalike_text(spark):
    """Text payloads can legitimately start with an image magic ('BMW
    engines', 'P5 form'): the sniff routes them to the real decoder,
    whose header parse fails — the stage must fall back to the digest
    path, not crash (review finding, round 8)."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        fake_decode,
    )

    texts = [
        "BMW engines are great and this is just text",
        "P5 form submitted yesterday",
        "P6\nnot really a pixmap 999",
        "plain text with no magic at all",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in extract_features(attach_payload(df)).collect()}
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        w, h = fake_decode(t.encode())
        assert (rows[i].width, rows[i].height) == (w, h)


def test_real_decode_stage_matches_arithmetic(spark):
    """attach_image_payload → decode_images on Spark: dims and raster
    checksum must equal the closed-form derivation from doc_id."""
    from pasardassist_spark.operators.multimodal import (
        attach_image_payload,
        decode_images,
        synth_raster,
    )

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r for r in decode_images(attach_image_payload(df)).collect()}
    assert len(rows) == 30
    for doc_id in range(30):
        w, h, px = synth_raster(doc_id)
        r = rows[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["pixel_sum"] == sum(px)
        assert r["kind"].startswith("image/")


def test_real_resize_stage_thumbs_decodable(spark):
    from pasardassist_spark.operators.multimodal import (
        attach_image_payload,
        resize_images,
        synth_raster,
    )

    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    for r in resize_images(attach_image_payload(df), max_side=16).collect():
        w, h, px = synth_raster(r["doc_id"])
        assert (r["width"], r["height"]) == (w, h)
        assert max(r["out_w"], r["out_h"]) <= 16
        t = C.decode(r["thumb"])
        assert (t.width, t.height) == (r["out_w"], r["out_h"])
        # spot-check the resampling grid: thumb pixel (x,y) equals source
        # pixel at ((x*w)//out_w, (y*h)//out_h)
        for x, y in [(0, 0), (r["out_w"] - 1, r["out_h"] - 1)]:
            sx, sy = (x * w) // r["out_w"], (y * h) // r["out_h"]
            src = px[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
            got = t.pixels[(y * t.width + x) * 3 : (y * t.width + x) * 3 + 3]
            assert got == src
