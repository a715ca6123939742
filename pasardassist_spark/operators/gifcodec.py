"""Pure-Python GIF codec — fourth image container next to PPM/BMP/PNG in
operators/imagecodec.py (reference parity: src/modules/utils/utils.service.ts
media/thumbnail handling; GIF is the one legacy web format a crawl corpus
still carries in volume).

Stdlib-only against the public GIF89a specification: header + logical
screen descriptor, global/local color tables, one image descriptor, and the
variable-code-width LZW stream (9→12 bits, CLEAR/EOI, KwKwK case, 4096-slot
dictionary reset). Decoded frames land in the same ``Raster`` type as every
other codec, so dHash/resize/feature stages compose unchanged. Supported:
single-frame GIF87a/89a with an 8-bit color table, ANIMATION (frame
compositing with disposal methods and transparency), and — round 14 — the
Appendix E four-pass INTERLACE row order on both the single-frame and
animated paths (de-interlaced by a vectorized row scatter). Extension
blocks (graphic control, comment, application) are handled or skipped per
spec.

The LZW width-change pairing follows giflib: the ENCODER widens when the
next free slot exceeds ``1 << width`` (slot 513 is the first 10-bit
assignment), the DECODER when its next free slot reaches ``1 << width`` —
the decoder trails the encoder's dictionary by exactly one entry at each
read, so the rules meet at the same code index. Round-trips crossing the
512/1024/2048 boundaries and a forced 4096 reset are property-tested in
tests/test_gifcodec.py.
"""

from __future__ import annotations

import struct

import numpy as np

from pasardassist_spark.operators.imagecodec import Raster, _check_dims

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_CLEAR_BASE = 256  # for 8-bit min code size
_MAX_CODE = 4096


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in GIF_MAGICS


def _interlace_order(h: int) -> "np.ndarray":
    """Display-row indices in STORAGE order — the GIF89a Appendix E
    four-pass interlace (rows 0,8,16.. then 4,12,20.. then 2,6,10..
    then the odd rows).  De-interlacing assigns stored rows back to
    these display positions; the writer gathers them in this order."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])



# ------------------------------------------------------------------ LZW --


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Decode a GIF LZW stream (already de-sub-blocked) to index bytes.

    ``n_expected`` bounds the output (w*h, already bomb-checked by the
    caller): a crafted stream cannot expand past the declared raster."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()

    # bit reader, LSB-first per spec
    acc = 0
    nbits = 0
    pos = 0

    def read_code() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, prev, width
        table = [bytes((i,)) for i in range(clear)] + [b"", b""]
        prev = None
        width = min_code_size + 1

    reset()
    while True:
        code = read_code()
        if code is None:
            raise ValueError("truncated GIF LZW stream (no EOI)")
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError(f"bad first GIF LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW code {code} beyond dictionary")
        out += entry
        if len(out) > n_expected:
            raise ValueError("GIF LZW stream overruns declared raster size")
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            # decoder trails the encoder by one entry: widen when the next
            # free slot reaches the width limit (see module docstring)
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """Real GIF LZW compressor (dictionary growth, variable width,
    4096-slot reset) — the fixture generator AND the round-trip partner
    that proves the decoder against dictionary dynamics, not just the
    all-literals degenerate stream."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def flush() -> None:
        nonlocal acc, nbits
        if nbits:
            out.append(acc & 0xFF)
            acc = 0
            nbits = 0

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    cur = b""
    for b in indices:
        cand = cur + bytes((b,))
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        if nxt < _MAX_CODE:
            table[cand] = nxt
            nxt += 1
            if nxt > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes((i,)): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        cur = bytes((b,))
    if cur:
        emit(table[cur])
    emit(eoi)
    flush()
    return bytes(out)


# ------------------------------------------------------------ container --


def decode_gif(payload: bytes) -> Raster:
    """Decode a single-frame non-interlaced GIF to an RGB Raster."""
    try:
        return _decode_gif(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed GIF payload: {exc}") from exc


def _decode_gif(payload: bytes) -> Raster:
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = payload[pos : pos + 3 * n]
        if len(global_table) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n

    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF missing image descriptor")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1  # label
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension block")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            interlaced = bool(iflags & 0x40)
            table = global_table
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = payload[pos : pos + 3 * n]
                if len(table) != 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            if not table:
                raise ValueError("GIF image has no color table")
            _check_dims(w, h)
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise ValueError(f"bad GIF LZW min code size {min_code}")
            chunks = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF image data sub-blocks")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                chunk = payload[pos : pos + sz]
                if len(chunk) != sz:
                    raise ValueError("truncated GIF image data sub-block")
                chunks.append(chunk)
                pos += sz
            # animation guard: skip trailing extensions, accept the trailer
            # (or EOF — some writers omit it); a second image descriptor is
            # an animation
            p2 = pos
            while p2 < len(payload):
                b2 = payload[p2]
                p2 += 1
                if b2 == 0x3B:
                    break
                if b2 == 0x21:
                    p2 += 1
                    while p2 < len(payload) and payload[p2] != 0:
                        p2 += payload[p2] + 1
                    p2 += 1
                    continue
                if b2 == 0x2C:
                    raise NotImplementedError("animated GIF unsupported")
                raise ValueError(f"unknown GIF block {b2:#x}")
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if len(idx) != w * h:
                raise ValueError(
                    f"GIF index stream has {len(idx)} pixels, raster needs {w * h}"
                )
            n_colors = len(table) // 3
            # vectorized palette expansion: index -> RGB triplet lookup
            ia = np.frombuffer(idx, dtype=np.uint8)
            if int(ia.max(initial=0)) >= n_colors:
                bad = int(ia[ia >= n_colors][0])
                raise ValueError(f"GIF index {bad} beyond color table")
            pal = np.frombuffer(table, dtype=np.uint8).reshape(n_colors, 3)
            if interlaced:
                stored = ia.reshape(h, w)
                disp = np.empty_like(stored)
                disp[_interlace_order(h)] = stored
                ia = disp.reshape(-1)
            return Raster(w, h, 3, pal[ia].tobytes())
        raise ValueError(f"unknown GIF block {block:#x}")


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a writer: 256-entry global color table (palette
    padded), real LZW stream in <=255-byte sub-blocks.  ``interlace``
    stores rows in the Appendix E four-pass order and sets the
    descriptor flag."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if len(palette) % 3 or not 0 < len(palette) <= 768:
        raise ValueError("palette must be 1..256 RGB triplets")
    if interlace:
        indices = (
            np.frombuffer(indices, dtype=np.uint8)
            .reshape(height, width)[_interlace_order(height)]
            .tobytes()
        )
    pal = palette + b"\x00" * (768 - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += pal
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(8)  # LZW min code size
    data = _lzw_encode(indices, 8)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# -------------------------------------------------------------- animation --

def decode_gif_frames(payload: bytes) -> tuple[int, int, list[Raster]]:
    """Decode an ANIMATED (or single-frame) GIF into the sequence of
    composited canvas snapshots — "the image as displayed" after each
    frame, which is what a frame-sampling pipeline consumes.

    Full GIF89a animation semantics: per-frame Graphic Control Extension
    (transparency index — transparent pixels leave the canvas untouched —
    and disposal method: 0/1 keep, 2 restore-to-background, 3
    restore-to-previous), sub-rectangle frames composited at their
    (x, y) offsets, local color tables overriding the global one. The
    canvas starts as the background color (the spec's initial state;
    black when the header names no usable background).

    Returns (canvas_w, canvas_h, [Raster per frame]). Raises ValueError
    on malformed streams, NotImplementedError on interlaced frames."""
    try:
        return _decode_gif_frames(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed GIF payload: {exc}") from exc


def _decode_gif_frames(payload: bytes) -> tuple[int, int, list[Raster]]:
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", payload, 6)
    _check_dims(max(sw, 1), max(sh, 1))
    pos = 13
    global_table = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = payload[pos : pos + 3 * n]
        if len(global_table) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    if global_table and bg_idx < len(global_table) // 3:
        bg = tuple(global_table[bg_idx * 3 : bg_idx * 3 + 3])
    else:
        bg = (0, 0, 0)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    frames: list[Raster] = []
    # pending GCE state for the NEXT image descriptor
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            subs = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension block")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                subs.append(payload[pos : pos + sz])
                pos += sz
            if label == 0xF9 and subs:  # Graphic Control Extension
                gflags = subs[0][0]
                disposal = (gflags >> 2) & 0x07
                transparent = subs[0][3] if gflags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#x}")
        fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        interlaced = bool(iflags & 0x40)
        if fx + fw > sw or fy + fh > sh:
            raise ValueError("GIF frame rectangle exceeds the canvas")
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) != 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if not table:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunk = payload[pos : pos + sz]
            if len(chunk) != sz:
                raise ValueError("truncated GIF image data sub-block")
            chunks.append(chunk)
            pos += sz
        idx = _lzw_decode(b"".join(chunks), min_code, fw * fh)
        if len(idx) != fw * fh:
            raise ValueError(
                f"GIF index stream has {len(idx)} pixels, frame needs {fw * fh}"
            )
        n_colors = len(table) // 3
        ia = np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
        if interlaced:
            disp = np.empty_like(ia)
            disp[_interlace_order(fh)] = ia
            ia = disp
        opaque = (
            ia != transparent if transparent is not None
            else np.ones_like(ia, dtype=bool)
        )
        if int(ia[opaque].max(initial=0)) >= n_colors:
            raise ValueError("GIF index beyond color table")
        pal = np.frombuffer(table, dtype=np.uint8).reshape(n_colors, 3)
        saved = canvas[fy : fy + fh, fx : fx + fw].copy()  # for disposal 3
        region = canvas[fy : fy + fh, fx : fx + fw]
        region[opaque] = pal[ia[opaque]]
        frames.append(Raster(sw, sh, 3, canvas.tobytes()))
        if disposal == 2:  # restore region to background
            canvas[fy : fy + fh, fx : fx + fw] = bg
        elif disposal == 3:  # restore to previous canvas content
            canvas[fy : fy + fh, fx : fx + fw] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF has no frames")
    return sw, sh, frames


def encode_gif_animated(
    frames: list[tuple[int, int, int, int, bytes]],
    canvas_w: int,
    canvas_h: int,
    palette: bytes,
    disposals: list[int] | None = None,
    transparent_idx: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Animated GIF89a writer (fixture generator): ``frames`` is a list of
    (x, y, w, h, indices) sub-rectangles composited in order; one global
    color table; per-frame Graphic Control Extensions carry the given
    disposal methods (default 1 = keep) and an optional shared
    transparency index."""
    if len(palette) % 3 or not 0 < len(palette) <= 768:
        raise ValueError("palette must be 1..256 RGB triplets")
    pal = palette + b"\x00" * (768 - len(palette))
    disposals = disposals or [1] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", canvas_w, canvas_h, 0xF7, 0, 0)
    out += pal
    for (fx, fy, fw, fh, indices), disp in zip(frames, disposals):
        if len(indices) != fw * fh:
            raise ValueError("frame index buffer does not match dimensions")
        gflags = (disp & 7) << 2
        tidx = 0
        if transparent_idx is not None:
            gflags |= 1
            tidx = transparent_idx
        out += b"\x21\xf9\x04" + bytes((gflags, 0, 0, tidx)) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", fx, fy, fw, fh, 0x40 if interlace else 0
        )
        out.append(8)
        if interlace:
            indices = (
                np.frombuffer(indices, dtype=np.uint8)
                .reshape(fh, fw)[_interlace_order(fh)]
                .tobytes()
            )
        data = _lzw_encode(indices, 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
