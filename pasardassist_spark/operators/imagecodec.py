"""Pure-Python image codecs — the real decode path behind the multimodal
stages (reference parity: src/modules/utils/utils.service.ts
metadata/thumbnail handling; re-expressed as Spark mapInPandas stages in
operators/multimodal).

No image library exists in this container, so the decoders are written
against the public format specs using only the stdlib for FORMAT PARSING;
per-pixel arithmetic (resampling, DIB<->RGB layout, PNG unfiltering,
alpha strip) is vectorized with numpy — it's plain byte-array math, and
the pure-Python loops it replaced were the measured hot spot of the whole
bench (VERDICT r9: mm_resize_real 16 s of Python-bound per-pixel work):

- PPM/PGM (netpbm): P2/P3 ASCII and P5/P6 binary rasters, maxval <= 255.
- BMP: BITMAPINFOHEADER / BITMAPV4/V5, uncompressed (BI_RGB) 24- and
  32-bit, bottom-up or top-down rows, 4-byte row padding.
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
  6 (RGBA), non-interlaced; IDAT inflated with stdlib zlib and all five
  scanline filters (None/Sub/Up/Average/Paeth) reversed.

Everything operates on in-memory ``bytes`` so it drops straight into the
Arrow-batched ``mapInPandas`` stages: decode cost is per-payload CPU with
zero shuffle, which is exactly how a PIL/libvips build would behave at
100 TB — swap the body, keep the plumbing.

Rasters are a plain tuple ``(width, height, channels, pixels)`` with
``pixels`` a row-major bytes object (RGB triplets or single-channel gray),
alpha dropped on decode so every format normalizes to 1 or 3 channels.
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

import numpy as np


class Raster(NamedTuple):
    width: int
    height: int
    channels: int  # 1 = gray, 3 = RGB
    pixels: bytes  # row-major, width*height*channels bytes


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard: a crafted header ("P6 999999999 999999999")
# must not allocate terabytes in an executor. 2^26 pixels = a 8192x8192
# RGB frame (~200 MB decoded) — far above any payload this engine stores
# inline; larger assets belong in object storage with pointer columns.
MAX_PIXELS = 1 << 26


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0:
        raise ValueError(f"bad image dimensions {w}x{h}")
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"image dimensions {w}x{h} exceed the {MAX_PIXELS}-pixel "
            "inline-decode cap (decompression-bomb guard)"
        )


def sniff_format(payload: bytes) -> str | None:
    """Identify a supported image container from its magic bytes."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6") and (
        len(payload) > 2 and payload[2:3] in b" \t\r\n#"
    ):
        return "ppm"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


def decode(payload: bytes) -> Raster:
    """Decode any supported format. Error surface is EXACTLY ValueError
    (malformed input — including short/garbled headers and corrupt
    compressed streams, which the parsers underneath surface as
    struct.error/zlib.error) or NotImplementedError (unsupported
    container/feature); callers' fallback logic relies on that closure."""
    fmt = sniff_format(payload)
    try:
        if fmt == "ppm":
            return decode_ppm(payload)
        if fmt == "bmp":
            return decode_bmp(payload)
        if fmt == "png":
            return decode_png(payload)
        if fmt == "gif":
            # local import: gifcodec imports Raster/_check_dims from here
            from pasardassist_spark.operators.gifcodec import decode_gif

            return decode_gif(payload)
        if fmt == "jpeg":
            # local import: jpegcodec imports Raster/_check_dims from here
            from pasardassist_spark.operators.jpegcodec import decode_jpeg

            return decode_jpeg(payload)
        if fmt == "webp":
            # local import: webpcodec imports Raster/_check_dims from here
            from pasardassist_spark.operators.webpcodec import decode_webp

            return decode_webp(payload)
        if fmt == "tiff":
            # local import: tiffcodec imports Raster/_check_dims from here
            from pasardassist_spark.operators.tiffcodec import decode_tiff

            return decode_tiff(payload)
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"malformed {fmt} payload: {exc}") from exc
    raise NotImplementedError("unrecognized image container")


# ---------------------------------------------------------------- netpbm --

def _pnm_tokens(payload: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integers, skipping '#' comments."""
    out: list[int] = []
    i = pos
    ln = len(payload)
    while len(out) < n:
        while i < ln and payload[i : i + 1] in b" \t\r\n":
            i += 1
        if i < ln and payload[i : i + 1] == b"#":
            while i < ln and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < ln and payload[j : j + 1] not in b" \t\r\n#":
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        out.append(int(payload[i:j]))
        i = j
    return out, i


def decode_ppm(payload: bytes) -> Raster:
    """P2/P3 (ASCII) and P5/P6 (binary) netpbm rasters, maxval <= 255."""
    magic = payload[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a supported netpbm magic: {magic!r}")
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), pos = _pnm_tokens(payload, 3, 2)
    _check_dims(w, h)
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    n = w * h * channels
    if magic in (b"P5", b"P6"):
        # exactly one whitespace byte separates header from raster
        raster = payload[pos + 1 : pos + 1 + n]
        if len(raster) != n:
            raise ValueError("truncated netpbm raster")
    else:
        vals, _ = _pnm_tokens(payload, n, pos)
        if any(v < 0 or v > maxval for v in vals):
            raise ValueError("netpbm sample out of range")
        raster = bytes(vals)
    if maxval != 255:
        scaled = (
            np.frombuffer(raster, dtype=np.uint8).astype(np.uint32) * 255
        ) // maxval
        raster = scaled.astype(np.uint8).tobytes()
    return Raster(w, h, channels, raster)


def encode_ppm(r: Raster) -> bytes:
    """Binary netpbm writer (P5 for gray, P6 for RGB) — the thumbnail
    container for the resize stage (uncompressed, so payload size is a
    pure function of dimensions and SQL-checkable)."""
    if r.channels == 3:
        head = b"P6\n%d %d\n255\n" % (r.width, r.height)
    elif r.channels == 1:
        head = b"P5\n%d %d\n255\n" % (r.width, r.height)
    else:
        raise ValueError(f"unsupported channel count {r.channels}")
    if len(r.pixels) != r.width * r.height * r.channels:
        raise ValueError("raster size mismatch")
    return head + r.pixels


# ------------------------------------------------------------------- BMP --

def dib_to_rgb(data: bytes, off: int, w: int, h: int, bypp: int, top_down: bool) -> bytes:
    """Decode an uncompressed DIB pixel array (BGR(A), 4-byte row stride,
    bottom-up unless ``top_down``) to row-major RGB — shared by the BMP
    decoder and the AVI frame decoder (operators/videocodec.py), which
    carry the identical layout."""
    stride = ((w * bypp + 3) // 4) * 4
    if len(data) < off + stride * h:
        raise ValueError("truncated DIB pixel array")
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    px = arr.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return rgb.tobytes()


def rgb_to_dib(r: Raster) -> bytes:
    """Encode an RGB raster as a bottom-up 24-bit DIB pixel array (the
    BMP/AVI shared layout; gray promotes to RGB)."""
    px = np.frombuffer(r.pixels, dtype=np.uint8)
    if r.channels == 1:
        px = np.repeat(px, 3)
    rgb = px.reshape(r.height, r.width, 3)
    bgr = rgb[::-1, :, [2, 1, 0]]  # bottom-up rows, RGB -> BGR
    stride = ((r.width * 3 + 3) // 4) * 4
    out = np.zeros((r.height, stride), dtype=np.uint8)
    out[:, : r.width * 3] = bgr.reshape(r.height, r.width * 3)
    return out.tobytes()


def decode_bmp(payload: bytes) -> Raster:
    """Uncompressed (BI_RGB) 24/32-bit BMP with BITMAPINFOHEADER+."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1:
        raise ValueError(f"bad BMP plane count {planes}")
    # A malformed data_off (0, or pointing inside the headers) would pass
    # dib_to_rgb's length check and silently decode header bytes as pixels.
    if not 14 + hdr_size <= data_off <= len(payload):
        raise ValueError(f"bad BMP pixel-data offset {data_off}")
    if compression not in (0, 1):
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP bpp {bpp} unsupported")
    if compression == 1 and bpp != 8:
        raise ValueError(f"BI_RLE8 requires 8 bpp, got {bpp}")
    top_down = h < 0
    h = abs(h)
    _check_dims(w, h)
    if bpp in (1, 4, 8):
        # indexed color (r15): BGRX palette follows the info header
        (colors_used,) = struct.unpack_from("<I", payload, 46)
        n_colors = colors_used or (1 << bpp)
        if n_colors > (1 << bpp):
            raise ValueError(f"BMP declares {n_colors} colors at {bpp} bpp")
        pal_off = 14 + hdr_size
        pal = payload[pal_off : pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError("torn BMP color table")
        if compression == 1:
            idx = _bmp_rle8(payload, data_off, w, h, top_down)
        else:
            idx = _bmp_unpack_indexed(payload, data_off, w, h, bpp, top_down)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP pixel index beyond color table")
        table = np.frombuffer(pal, dtype=np.uint8).reshape(n_colors, 4)
        rgb = table[idx][:, :, [2, 1, 0]]  # BGRX -> RGB
        return Raster(w, h, 3, rgb.tobytes())
    bypp = bpp // 8
    return Raster(w, h, 3, dib_to_rgb(payload, data_off, w, h, bypp, top_down))


def _bmp_unpack_indexed(
    payload: bytes, data_off: int, w: int, h: int, bpp: int, top_down: bool
) -> "np.ndarray":
    """(h, w) uint8 index matrix, top-down, from packed 1/4/8-bit rows
    (rows padded to 4-byte boundaries, bottom-up unless h was
    negative)."""
    stride = ((w * bpp + 31) // 32) * 4
    raw = payload[data_off : data_off + stride * h]
    if len(raw) != stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if bpp == 8:
        idx = rows[:, :w]
    elif bpp == 4:
        hi = rows >> 4
        lo = rows & 0x0F
        idx = np.empty((h, stride * 2), dtype=np.uint8)
        idx[:, 0::2] = hi
        idx[:, 1::2] = lo
        idx = idx[:, :w]
    else:  # 1-bit
        idx = np.unpackbits(rows, axis=1)[:, :w]
    return idx if top_down else idx[::-1]


def _bmp_rle8(
    payload: bytes, data_off: int, w: int, h: int, top_down: bool
) -> "np.ndarray":
    """(h, w) uint8 index matrix from a BI_RLE8 stream: encoded runs
    (count, value), escapes 0x00 00 end-of-line / 0x00 01 end-of-bitmap
    / 0x00 02 dx,dy delta (skipped pixels read index 0) / 0x00 n>=3
    absolute mode (n literals, word-aligned).  RLE streams are
    bottom-up per the format; a run overflowing its row is torn."""
    idx = np.zeros((h, w), dtype=np.uint8)
    pos = data_off
    x = y = 0  # y counts from the BOTTOM row
    n = len(payload)
    while True:
        if pos + 2 > n:
            raise ValueError("torn BMP RLE8 stream")
        c, v = payload[pos], payload[pos + 1]
        pos += 2
        if c > 0:
            if y >= h or x + c > w:
                raise ValueError("BMP RLE8 run overflows row")
            idx[h - 1 - y, x : x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if pos + 2 > n:
                raise ValueError("torn BMP RLE8 delta")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta out of bounds")
        else:  # absolute mode: v literal indices, word-aligned
            if y >= h or x + v > w:
                raise ValueError("BMP RLE8 absolute run overflows row")
            lit = payload[pos : pos + v]
            if len(lit) != v:
                raise ValueError("torn BMP RLE8 absolute run")
            idx[h - 1 - y, x : x + v] = np.frombuffer(lit, dtype=np.uint8)
            x += v
            pos += v + (v & 1)  # pad to word
    return idx[::-1] if top_down else idx


def encode_bmp_indexed(
    r: Raster, bpp: int = 8, *, rle: bool = False
) -> bytes:
    """Indexed-color BMP writer (r15 fixture generator): builds the
    palette from the raster's distinct colors (<= 2^bpp required) and
    packs 1/4/8-bit rows bottom-up, optionally BI_RLE8-compressed
    (8 bpp only; encoded runs + one absolute-mode run per row start
    when profitable is NOT attempted — fixtures emit simple runs)."""
    if bpp not in (1, 4, 8):
        raise ValueError(f"indexed BMP bpp must be 1/4/8, got {bpp}")
    if rle and bpp != 8:
        raise ValueError("BI_RLE8 requires 8 bpp")
    px = np.frombuffer(r.pixels, dtype=np.uint8)
    if r.channels == 1:
        px = np.repeat(px, 3)
    rgb = px.reshape(r.height, r.width, 3)
    colors, inverse = np.unique(
        rgb.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > (1 << bpp):
        raise ValueError(
            f"{len(colors)} distinct colors exceed {1 << bpp}-entry palette"
        )
    idx = inverse.reshape(r.height, r.width).astype(np.uint8)
    pal = b"".join(
        bytes((int(c[2]), int(c[1]), int(c[0]), 0)) for c in colors
    )
    if rle:
        body = bytearray()
        for row in idx[::-1]:  # bottom-up
            x = 0
            while x < r.width:
                run = 1
                while (
                    x + run < r.width
                    and row[x + run] == row[x]
                    and run < 255
                ):
                    run += 1
                body += bytes((run, int(row[x])))
                x += run
            body += b"\x00\x00"  # end of line
        body += b"\x00\x01"  # end of bitmap
        raster = bytes(body)
        compression = 1
    else:
        stride = ((r.width * bpp + 31) // 32) * 4
        rows = np.zeros((r.height, stride), dtype=np.uint8)
        if bpp == 8:
            rows[:, : r.width] = idx[::-1]
        elif bpp == 4:
            flip = idx[::-1]
            padded_w = stride * 2
            wide = np.zeros((r.height, padded_w), dtype=np.uint8)
            wide[:, : r.width] = flip
            rows = (wide[:, 0::2] << 4) | wide[:, 1::2]
        else:
            flip = idx[::-1]
            wide = np.zeros((r.height, stride * 8), dtype=np.uint8)
            wide[:, : r.width] = flip
            rows = np.packbits(wide, axis=1)
        raster = rows.tobytes()
        compression = 0
    data_off = 14 + 40 + len(pal)
    file_size = data_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, r.width, r.height, 1, bpp, compression,
        len(raster), 2835, 2835, len(colors), 0,
    )
    return header + info + pal + raster


def encode_bmp(r: Raster) -> bytes:
    """24-bit bottom-up BI_RGB writer (test fixture generator). Gray
    rasters promote to RGB inside rgb_to_dib."""
    raster = rgb_to_dib(r)
    data_off = 14 + 40
    file_size = data_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, r.width, r.height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + info + raster


# ------------------------------------------------------------------- PNG --

def _png_unfilter(raw: bytes, stride: int, h: int, bypp: int) -> bytes:
    """Reverse PNG scanline filters (spec §9: None/Sub/Up/Average/Paeth).

    Vectorization: rows are inherently sequential (Up/Average/Paeth read
    the previous OUTPUT row), but within a row None is a copy, Up is one
    uint8 add (wrapping = mod 256), and Sub — out[i] = line[i] + out[i-bypp]
    — is a per-byte-lane modular prefix sum, i.e. ``np.cumsum`` with a
    uint8 accumulator. Average/Paeth carry a left-neighbor dependency on
    the output itself (nonlinear via >>1 / the Paeth predictor), so those
    rows stay per-byte Python — they never appear in this repo's own
    filter-0 writer and are exercised only by the conformance tests."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    lines = arr[:, 1:]
    bad = ftypes > 4
    if bad.any():
        raise ValueError(f"unknown PNG filter type {int(ftypes[bad][0])}")
    if not ftypes.any():  # every row filter 0 — the common fast path
        return lines.tobytes()
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(ftypes[y])
        line = lines[y]
        if ftype == 0:  # None
            row = line.copy()
        elif ftype == 1:  # Sub: modular prefix sum per byte lane
            row = np.cumsum(
                line.reshape(-1, bypp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif ftype == 2:  # Up (uint8 add wraps = & 0xFF)
            row = line + prev
        else:  # Average / Paeth: sequential left dependency
            row = np.zeros(stride, dtype=np.uint8)
            li = line.tolist()
            pv = prev.tolist()
            ro = row.tolist()
            if ftype == 3:
                for i in range(stride):
                    a = ro[i - bypp] if i >= bypp else 0
                    ro[i] = (li[i] + ((a + pv[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = ro[i - bypp] if i >= bypp else 0
                    b = pv[i]
                    c = pv[i - bypp] if i >= bypp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    ro[i] = (li[i] + pred) & 0xFF
            row = np.asarray(ro, dtype=np.uint8)
        out[y] = row
        prev = row
    return out.tobytes()


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_pass_dims(w: int, h: int, interlace: bool):
    """(x0, y0, dx, dy, pw, ph) per pass; a single full pass when not
    interlaced. Empty passes are dropped (they carry no filter bytes)."""
    if not interlace:
        return [(0, 0, 1, 1, w, h)]
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _png_extract_samples(flat: bytes, pw: int, ph: int, ch: int, depth: int) -> np.ndarray:
    """Unfiltered pass bytes -> (ph, pw, ch) uint8 samples. Depth 16 keeps
    the most significant byte (the standard 8-bit normalization); sub-byte
    depths unpack MSB-first along x (palette indices / gray levels)."""
    if depth == 8:
        return np.frombuffer(flat, dtype=np.uint8).reshape(ph, pw, ch)
    if depth == 16:
        a = np.frombuffer(flat, dtype=np.uint8).reshape(ph, pw, ch, 2)
        return a[..., 0].copy()  # big-endian MSB
    # depth 1/2/4, single channel only (gray or palette index)
    stride = (pw * depth + 7) // 8
    rows = np.frombuffer(flat, dtype=np.uint8).reshape(ph, stride)
    bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(ph, pw, depth) * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(ph, pw, 1)


def decode_png(payload: bytes) -> Raster:
    """PNG decode covering the real-world matrix: color types 0/2/3/4/6,
    bit depths 1/2/4 (gray + palette), 8, and 16 (MSB-normalized to
    8-bit), PLTE palette expansion, and Adam7 interlacing — alpha dropped
    so output normalizes to 1 or 3 channels."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    w = h = 0
    depth = 8
    color_type = -1
    interlace = 0
    plte = None
    idat = bytearray()
    ln = len(payload)
    while pos + 8 <= ln:
        clen, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            _check_dims(w, h)
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type} unsupported")
            ok_depths = {
                0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                4: (8, 16), 6: (8, 16),
            }[color_type]
            if depth not in ok_depths:
                raise NotImplementedError(
                    f"PNG bit depth {depth} invalid for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
            if comp or filt:
                raise ValueError("bad PNG compression/filter method")
        elif ctype == b"PLTE":
            if clen % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if not w or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    src_ch = _PNG_CHANNELS[color_type]
    passes = _png_pass_dims(w, h, bool(interlace))

    def pass_stride(pw: int) -> int:
        return (pw * src_ch * depth + 7) // 8

    bypp = max(1, (src_ch * depth) // 8)
    # bounded inflate: the raster size is known from IHDR, so cap the
    # decompressor there — a zlib bomb (tiny IDAT inflating to GB) stops
    # at expected+1 bytes and is rejected, instead of exhausting memory.
    # The eof check preserves what plain zlib.decompress() verified:
    # stream completeness + adler32 — a truncated IDAT that happens to
    # yield exactly `expected` bytes before the cut must still fail.
    expected = sum(ph * (pass_stride(pw) + 1) for _, _, _, _, pw, ph in passes)
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError(
            f"PNG IDAT inflates to {len(raw)}+ bytes, expected {expected}"
        )
    if d.unconsumed_tail:
        # the cap left input unread; a valid stream has only the adler32
        # trailer here — any further OUTPUT means the stream overruns
        if d.decompress(d.unconsumed_tail, 1):
            raise ValueError(f"PNG IDAT inflates beyond {expected} bytes")
    if not d.eof:
        raise ValueError("PNG IDAT stream incomplete (truncated/unverified)")

    img = np.zeros((h, w, src_ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        stride = pass_stride(pw)
        size = ph * (stride + 1)
        flat = _png_unfilter(raw[off : off + size], stride, ph, bypp)
        off += size
        img[y0::dy, x0::dx] = _png_extract_samples(flat, pw, ph, src_ch, depth)

    if color_type == 3:
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        return Raster(w, h, 3, plte[idx].tobytes())
    if color_type == 0:
        if depth in (1, 2, 4):  # scale gray levels to full 8-bit range
            img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return Raster(w, h, 1, img.tobytes())
    if color_type == 2:
        return Raster(w, h, 3, img.tobytes())
    # strip alpha (vectorized column slice)
    keep = src_ch - 1
    return Raster(w, h, keep if keep == 3 else 1, img[..., :keep].tobytes())


def encode_png(r: Raster, interlace: bool = False) -> bytes:
    """Minimal PNG writer (filter 0 scanlines, one IDAT; optional Adam7
    interlacing) — fixture generator for the decode tests and the
    synthetic payload builder."""
    color_type = 2 if r.channels == 3 else 0
    arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(
        r.height, r.width, r.channels
    )
    raw = bytearray()
    for x0, y0, dx, dy, pw, ph in _png_pass_dims(r.width, r.height, interlace):
        sub = arr[y0::dy, x0::dx].reshape(ph, pw * r.channels)
        rows = np.zeros((ph, pw * r.channels + 1), dtype=np.uint8)
        rows[:, 1:] = sub
        raw += rows.tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", r.width, r.height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: bytes, w: int, h: int, palette: bytes, depth: int = 8
) -> bytes:
    """Palette (color type 3) PNG writer: ``indices`` is one byte per
    pixel (values < len(palette)//3), packed down to ``depth`` bits
    MSB-first per scanline; ``palette`` is RGB triplets. Fixture
    generator for the palette/sub-byte decode paths."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette PNG depth {depth} invalid")
    idx = np.frombuffer(indices, dtype=np.uint8).reshape(h, w)
    if int(idx.max(initial=0)) >= len(palette) // 3:
        raise ValueError("palette index out of range")
    if depth == 8:
        packed = idx
    else:
        bits = (
            (idx[..., None] >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(h, w * depth).astype(np.uint8)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        packed = np.packbits(bits, axis=1)
    rows = np.zeros((h, packed.shape[1] + 1), dtype=np.uint8)
    rows[:, 1:] = packed

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- resize --

def resize_nearest(r: Raster, out_w: int, out_h: int) -> Raster:
    """Nearest-neighbor resample (real pixel work, stdlib-only). Source
    coordinate = floor(dst * src / out): the standard point-sampling grid,
    deterministic and SQL-oracle-friendly."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("bad target dimensions")
    ch = r.channels
    src = np.frombuffer(r.pixels, dtype=np.uint8).reshape(r.height, r.width, ch)
    sy = (np.arange(out_h, dtype=np.int64) * r.height) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * r.width) // out_w
    return Raster(out_w, out_h, ch, src[sy][:, sx].tobytes())
