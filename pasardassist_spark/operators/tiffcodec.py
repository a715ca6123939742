"""Pure-Python TIFF codec — the scan/scientific member of the multimodal
decode family (reference parity: opaque media payloads,
src/modules/utils/utils.service.ts; codec-seam precedent
operators/imagecodec.py / gifcodec.py / jpegcodec.py).

What is REAL here:

- both byte orders (``II`` little- and ``MM`` big-endian) through every
  header, IFD entry, and inline value;
- the IFD walk: 12-byte entries with SHORT/LONG values inline when they
  fit in 4 bytes and offset-indirect otherwise, and the next-IFD chain —
  multi-PAGE documents (fax/scan TIFFs) decode page by page;
- strip assembly (StripOffsets / StripByteCounts / RowsPerStrip) — each
  strip decompresses independently, which at cluster scale is exactly
  why TIFF strips exist;
- Compression 1 (none), 32773 (PackBits, the Macintosh RLE), and 5
  (TIFF-LZW: MSB-first variable 9→12-bit codes with the EARLY-CHANGE
  width bump at 2^n - 1, ClearCode 256 / EOI 257 — deliberately a
  different bit discipline from GIF's LSB-first LZW in gifcodec.py);
- Predictor 2 (horizontal differencing) undone per row per channel —
  per TILE row inside tiles;
- grayscale (Photometric 0/1, with 0 = WhiteIsZero inverted) and RGB,
  8 bits per sample, chunky planar layout;
- TILED layout (round 14 — scanned-document TIFFs are frequently
  tiled): TileWidth/TileLength (16-multiples per spec) over
  TileOffsets/TileByteCounts, every tile a full padded raster whose
  edge padding the blit discards, each tile an independent decompress
  unit (the cluster-parallel layout, TIFF 6.0 §15);
- PALETTE images (round 14, Photometric 3): 3 x 256-plane 16-bit
  ColorMap lookup (high byte) expanding to RGB.

Out-of-scope-by-name: planar configuration 2, 16-bit samples,
JPEG-in-TIFF, Deflate/CCITT compressions, and BigTIFF raise
``NotImplementedError``; malformed structure raises ``ValueError``.

The writer synthesizes conforming fixtures across the full supported
matrix (both endians × three compressions × predictor × strip/TILE ×
gray/RGB/PALETTE × multi-page) so every decode path runs on genuine
files.
"""

from __future__ import annotations

import struct

from pasardassist_spark.operators.imagecodec import Raster, _check_dims

__all__ = ["decode_tiff", "decode_tiff_pages", "encode_tiff", "sniff_tiff"]


def sniff_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


# ----------------------------------------------------------------- LZW ----
# TIFF-LZW (spec section 13): MSB-first bit packing, codes widen at
# 2^n - 1 ("early change"), dictionary resets on ClearCode.

_CLEAR, _EOI = 256, 257


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream ended without EOI")
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"bad TIFF LZW start code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table")
        out += entry
        if len(out) > expected:
            raise ValueError("TIFF LZW output overruns the strip size")
        prev = entry
        # early change: width bumps one code EARLIER than GIF
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    buf = 0
    nbits = 0
    # The code width for EVERY emission comes from a simulation of the
    # decoder's schedule (append-entry-then-check on its one-entry-stale
    # table count).  Deriving the width from the encoder's own table
    # count agrees with the decoder mid-stream (the stale count cancels
    # the post-insert off-by-one) but desyncs on trailing emissions with
    # no insert between them — a flush or EOI landing exactly on a
    # 2^w boundary was read at the wrong width (round-13 bug, hit by
    # 1-in-hundreds of real text payloads).  Simulating the reader makes
    # consistency hold by construction for every code, boundaries
    # included, without touching the decoder real files depend on.
    dec_width = 9
    dec_len = 258
    dec_prev = False

    def emit(code: int) -> None:
        nonlocal buf, nbits, dec_width, dec_len, dec_prev
        buf = (buf << dec_width) | code
        nbits += dec_width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        # advance the decoder simulation past this code
        if code == _CLEAR:
            dec_width, dec_len, dec_prev = 9, 258, False
            return
        if code == _EOI:
            return
        if dec_prev:
            dec_len += 1
        dec_prev = True
        if dec_len + 1 >= (1 << dec_width) and dec_width < 12:
            dec_width += 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
        else:
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            if next_code >= 4094:
                emit(_CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
            w = c
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits ---


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            lit = data[pos : pos + h + 1]
            if len(lit) != h + 1:
                raise ValueError("truncated PackBits literal run")
            out += lit
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if pos >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"PackBits strip decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:  # literal: until next run of >=3 or 128 bytes
            start = i
            i += 1
            while (
                i < n
                and i - start < 128
                and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
            ):
                i += 1
            out.append(i - start - 1)
            out += data[start:i]
    return bytes(out)


# ----------------------------------------------------------------- IFD ----

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_entry_values(buf: bytes, bo: str, etype: int, count: int, vdata: bytes):
    size = _TYPE_SIZES.get(etype)
    if size is None:
        raise ValueError(f"TIFF IFD entry type {etype} unsupported")
    total = size * count
    if total <= 4:
        raw = vdata[:total]
    else:
        (off,) = struct.unpack(bo + "I", vdata)
        raw = buf[off : off + total]
        if len(raw) != total:
            raise ValueError("TIFF IFD value offset out of range")
    if etype == 3:
        return list(struct.unpack(bo + "%dH" % count, raw))
    if etype == 4:
        return list(struct.unpack(bo + "%dI" % count, raw))
    if etype == 1:
        return list(raw)
    if etype == 5:  # RATIONAL — resolution tags; value unused downstream
        vals = struct.unpack(bo + "%dI" % (2 * count), raw)
        return [vals[i] / max(vals[i + 1], 1) for i in range(0, len(vals), 2)]
    return list(raw)  # ASCII


def _parse_ifd(buf: bytes, bo: str, off: int) -> tuple[dict[int, list], int]:
    if off + 2 > len(buf):
        raise ValueError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", buf, off)
    tags: dict[int, list] = {}
    pos = off + 2
    if pos + 12 * n_entries + 4 > len(buf):
        raise ValueError("truncated TIFF IFD")
    for _ in range(n_entries):
        tag, etype, count = struct.unpack_from(bo + "HHI", buf, pos)
        tags[tag] = _read_entry_values(
            buf, bo, etype, count, buf[pos + 8 : pos + 12]
        )
        pos += 12
    (next_off,) = struct.unpack_from(bo + "I", buf, pos)
    return tags, next_off


def _decode_ifd_raster(buf: bytes, bo: str, tags: dict[int, list]) -> Raster:
    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    _check_dims(w, h)
    spp = one(277, 1)
    photometric = one(262)
    compression = one(259, 1)
    predictor = one(317, 1)
    planar = one(284, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} unsupported (8 only)")
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2 unsupported")
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photometric} unsupported")
    if photometric == 3 and spp != 1:
        raise ValueError("palette TIFF must have one sample per pixel")
    if photometric == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples per pixel")
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} unsupported (none/LZW/PackBits)"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")

    def _decompress(chunk: bytes, expected: int) -> bytes:
        if compression == 1:
            if len(chunk) < expected:
                raise ValueError("uncompressed TIFF segment too short")
            return chunk[:expected]
        if compression == 5:
            data = _lzw_decode_tiff(chunk, expected)
            if len(data) != expected:
                raise ValueError("TIFF LZW segment size mismatch")
            return data
        return _packbits_decode(chunk, expected)

    row_bytes = w * spp
    if 322 in tags or 323 in tags:
        # tile grid walk (TIFF 6.0 §15): every tile is a full tw x tl
        # raster — edge tiles carry padding the blit discards.  The
        # predictor resets per tile ROW at tile width.
        tw, tl = one(322), one(323)
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError(f"bad TIFF tile size {tw}x{tl}")
        offsets = tags.get(324)
        counts = tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                "TIFF tile offsets/byte-counts missing or mismatched"
            )
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offsets) != across * down:
            raise ValueError("TIFF tile count does not match the grid")
        tile_row = tw * spp
        px = bytearray(h * row_bytes)
        for ti, (toff, tcnt) in enumerate(zip(offsets, counts)):
            chunk = buf[toff : toff + tcnt]
            if len(chunk) != tcnt:
                raise ValueError("TIFF tile exceeds file bounds")
            tile = bytearray(_decompress(chunk, tl * tile_row))
            if predictor == 2:
                for y in range(tl):
                    base = y * tile_row
                    for x in range(spp, tile_row):
                        tile[base + x] = (
                            tile[base + x] + tile[base + x - spp]
                        ) & 0xFF
            ty, tx = divmod(ti, across)
            x0, y0 = tx * tw, ty * tl
            n_cols = min(tw, w - x0) * spp
            for y in range(min(tl, h - y0)):
                dst = (y0 + y) * row_bytes + x0 * spp
                src = y * tile_row
                px[dst : dst + n_cols] = tile[src : src + n_cols]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                "TIFF strip offsets/byte-counts missing or mismatched"
            )
        rows_per_strip = one(278, h)
        raster = bytearray()
        for si, (soff, scnt) in enumerate(zip(offsets, counts)):
            strip = buf[soff : soff + scnt]
            if len(strip) != scnt:
                raise ValueError("TIFF strip exceeds file bounds")
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            if n_rows <= 0:
                raise ValueError("TIFF has more strips than rows")
            raster += _decompress(strip, n_rows * row_bytes)
        if len(raster) != h * row_bytes:
            raise ValueError("TIFF strips do not cover the image")
        px = bytearray(raster)
        if predictor == 2:  # horizontal differencing: undo per row/channel
            for y in range(h):
                base = y * row_bytes
                for x in range(spp, row_bytes):
                    px[base + x] = (px[base + x] + px[base + x - spp]) & 0xFF
    if photometric == 0:  # WhiteIsZero
        px = bytearray(255 - b for b in px)
    if photometric == 3:
        # ColorMap (tag 320): 3 x 2^bits 16-bit planes, all red then all
        # green then all blue; 8-bit output takes the high byte
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF ColorMap missing or wrong size")
        out = bytearray(w * h * 3)
        for i in range(w * h):
            v = px[i]
            out[3 * i] = cmap[v] >> 8
            out[3 * i + 1] = cmap[256 + v] >> 8
            out[3 * i + 2] = cmap[512 + v] >> 8
        return Raster(w, h, 3, bytes(out))
    channels = 3 if photometric == 2 else 1
    if photometric == 2 and spp > 3:  # drop extra samples (alpha)
        out = bytearray(w * h * 3)
        for i in range(w * h):
            out[3 * i : 3 * i + 3] = px[spp * i : spp * i + 3]
        px = out
    return Raster(w, h, channels, bytes(px))


def decode_tiff_pages(payload: bytes) -> list[Raster]:
    """Decode every page (IFD chain) of a TIFF document."""
    if not sniff_tiff(payload):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    try:
        (first_ifd,) = struct.unpack_from(bo + "I", payload, 4)
        pages: list[Raster] = []
        off = first_ifd
        seen: set[int] = set()
        while off:
            if off in seen or len(pages) > 4096:
                raise ValueError("cyclic TIFF IFD chain")
            seen.add(off)
            tags, off = _parse_ifd(payload, bo, off)
            pages.append(_decode_ifd_raster(payload, bo, tags))
    except struct.error as exc:
        raise ValueError(f"malformed TIFF payload: {exc}") from exc
    if not pages:
        raise ValueError("TIFF has no pages")
    return pages


def decode_tiff(payload: bytes) -> Raster:
    """First page only — the single-image contract of imagecodec.decode."""
    return decode_tiff_pages(payload)[0]


# --------------------------------------------------------------- writer ---


#: deterministic 256-entry fixture palette: red ramps, green/blue walk
#: coprime strides so neighbors differ in every plane
PALETTE_MAP = tuple(
    (i, (i * 37) % 256, (i * 91) % 256) for i in range(256)
)


def encode_tiff(
    pages: list[Raster],
    byte_order: str = "II",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """Multi-page TIFF writer over the supported matrix (fixture
    generator).  Each page becomes one IFD with real strip layout — or
    a real TILE GRID when ``tile=(tw, tl)`` is given (spec: multiples
    of 16; edge tiles zero-padded to full size, predictor per tile
    row).  ``palette=True`` writes 1-channel pages as photometric-3
    with the deterministic 16-bit PALETTE_MAP ColorMap (value*257),
    which decodes to the mapped RGB raster."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if not pages:
        raise ValueError("TIFF needs at least one page")
    if tile is not None and (tile[0] % 16 or tile[1] % 16 or min(tile) <= 0):
        raise ValueError(f"TIFF tile size must be multiples of 16, got {tile}")
    if palette and any(r.channels != 1 for r in pages):
        raise ValueError("palette TIFF pages must be single-channel")
    bo = "<" if byte_order == "II" else ">"
    out = bytearray(
        b"II*\x00" if byte_order == "II" else b"MM\x00*"
    ) + bytearray(4)  # first-IFD offset patched at the end
    ifd_offsets: list[int] = []
    for r in pages:
        w, h, spp = r.width, r.height, r.channels
        rps = rows_per_strip or h
        row_bytes = w * spp

        def _compress(raw: bytes) -> bytes:
            if compression == 5:
                return _lzw_encode_tiff(raw)
            if compression == 32773:
                return _packbits_encode(raw)
            return raw

        def _diff(buf: bytearray, width_bytes: int, n_rows: int) -> None:
            for y in range(n_rows):
                base = y * width_bytes
                for x in range(width_bytes - 1, spp - 1, -1):
                    buf[base + x] = (buf[base + x] - buf[base + x - spp]) & 0xFF

        segments: list[bytes] = []
        if tile is None:
            px = bytearray(r.pixels)
            if predictor == 2:
                _diff(px, row_bytes, h)
            for y0 in range(0, h, rps):
                n_rows = min(rps, h - y0)
                segments.append(_compress(
                    bytes(px[y0 * row_bytes : (y0 + n_rows) * row_bytes])
                ))
        else:
            tw, tl = tile
            tile_row = tw * spp
            src = r.pixels
            for y0 in range(0, h, tl):
                for x0 in range(0, w, tw):
                    buf = bytearray(tl * tile_row)
                    n_cols = min(tw, w - x0) * spp
                    for y in range(min(tl, h - y0)):
                        s = (y0 + y) * row_bytes + x0 * spp
                        buf[y * tile_row : y * tile_row + n_cols] = (
                            src[s : s + n_cols]
                        )
                    if predictor == 2:
                        _diff(buf, tile_row, tl)
                    segments.append(_compress(bytes(buf)))
        seg_offsets = []
        for s in segments:
            seg_offsets.append(len(out))
            out += s
            if len(out) & 1:
                out += b"\x00"  # word alignment

        def arr_or_inline(values: list[int], etype: int) -> tuple[int, bytes]:
            size = _TYPE_SIZES[etype]
            fmt = "H" if etype == 3 else "I"
            raw = struct.pack(bo + fmt * len(values), *values)
            if len(raw) <= 4:
                return len(values), raw + b"\x00" * (4 - len(raw))
            off = len(out)
            out.extend(raw)
            if len(out) & 1:
                out.extend(b"\x00")
            return len(values), struct.pack(bo + "I", off)

        entries: list[tuple[int, int, int, bytes]] = []

        def add(tag: int, etype: int, values: list[int]) -> None:
            count, vdata = arr_or_inline(values, etype)
            entries.append((tag, etype, count, vdata))

        add(256, 4, [w])
        add(257, 4, [h])
        add(258, 3, [8] * spp)
        add(259, 3, [compression])
        add(262, 3, [3 if palette else (2 if spp == 3 else 1)])
        add(277, 3, [spp])
        if tile is None:
            add(273, 4, seg_offsets)
            add(278, 4, [rps])
            add(279, 4, [len(s) for s in segments])
        else:
            add(322, 4, [tile[0]])
            add(323, 4, [tile[1]])
            add(324, 4, seg_offsets)
            add(325, 4, [len(s) for s in segments])
        if palette:
            add(320, 3, [c * 257 for plane in range(3)
                         for c in (e[plane] for e in PALETTE_MAP)])
        if predictor != 1:
            add(317, 3, [predictor])
        entries.sort()  # spec: entries in ascending tag order
        ifd_offsets.append(len(out))
        out += struct.pack(bo + "H", len(entries))
        for tag, etype, count, vdata in entries:
            out += struct.pack(bo + "HHI", tag, etype, count) + vdata
        out += b"\x00\x00\x00\x00"  # next-IFD patched below
    # chain the IFDs and patch the header
    struct.pack_into(bo + "I", out, 4, ifd_offsets[0])
    for i, off in enumerate(ifd_offsets):
        (n_entries,) = struct.unpack_from(bo + "H", out, off)
        next_pos = off + 2 + 12 * n_entries
        nxt = ifd_offsets[i + 1] if i + 1 < len(ifd_offsets) else 0
        struct.pack_into(bo + "I", out, next_pos, nxt)
    return bytes(out)
