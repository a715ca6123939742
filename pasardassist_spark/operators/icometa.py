"""ICO / CUR (Windows icon & cursor) directory metadata — per-entry
dimensions, bit depth and payload format WITHOUT decoding pixels.

Reference parity: favicons are the single most-fetched image class on
the web (every site root links one), and crawls index them by the
directory metadata alone — the same no-decode shape as
operators/heifmeta.py.  From the public ICONDIR layout (the format
ships no magic string — the reserved/type/count prefix IS the sniff):

- ICONDIR: reserved u16 (MUST be 0), type u16 (1 = icon, 2 = cursor),
  count u16;
- ICONDIRENTRY x count (16 bytes): width u8, height u8 (0 MEANS 256 —
  the classic favicon trap), colorCount u8, reserved u8, planes/bpp
  u16 x2 (for cursors these are the hotspot instead), bytesInRes u32,
  imageOffset u32;
- each image payload is EITHER a PNG (full magic, dimensions from
  IHDR) or a headerless DIB (BITMAPINFOHEADER whose biHeight counts
  the XOR **and** AND masks — the real height is HALF the declared
  one, the second classic trap).

The reader takes dimensions from the embedded image header (PNG IHDR
/ DIB header), using the directory bytes only as the 256 sentinel
cross-check; entries whose payload overruns the file, overlapping
garbage offsets, or a DIB with an odd biHeight raise ValueError.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

__all__ = ["IcoEntry", "IcoMeta", "parse_ico_meta", "encode_ico"]


class IcoEntry(NamedTuple):
    width: int
    height: int
    bpp: int
    fmt: str  # 'png' | 'dib'
    size_bytes: int


class IcoMeta(NamedTuple):
    kind: str  # 'icon' | 'cursor'
    n_entries: int
    entries: tuple[IcoEntry, ...]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_ico(payload: bytes) -> bool:
    if len(payload) < 6:
        return False
    res, typ, cnt = struct.unpack_from("<HHH", payload, 0)
    return res == 0 and typ in (1, 2) and 1 <= cnt <= 64


def parse_ico_meta(payload: bytes) -> IcoMeta:
    if len(payload) < 6:
        raise ValueError("torn ICONDIR")
    res, typ, cnt = struct.unpack_from("<HHH", payload, 0)
    if res != 0 or typ not in (1, 2):
        raise ValueError("not an ICO/CUR payload")
    if cnt == 0:
        raise ValueError("ICO directory declares zero images")
    if 6 + 16 * cnt > len(payload):
        raise ValueError("torn ICONDIRENTRY table")
    entries: list[IcoEntry] = []
    claimed: list[tuple[int, int, int]] = []  # (img_off, end, entry idx)
    for k in range(cnt):
        off = 6 + 16 * k
        dw, dh, _colors, _res, _p1, p2, size, img_off = struct.unpack_from(
            "<BBBBHHII", payload, off
        )
        if img_off < 6 + 16 * cnt or img_off + size > len(payload):
            raise ValueError(f"ICO entry {k} payload out of bounds")
        claimed.append((img_off, img_off + size, k))
        body = payload[img_off : img_off + size]
        if body[:8] == _PNG_MAGIC:
            if len(body) < 24 or body[12:16] != b"IHDR":
                raise ValueError(f"ICO entry {k}: torn embedded PNG")
            w, h = struct.unpack_from(">II", body, 16)
            depth, color_type = body[24], body[25]
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            if ch is None:
                raise ValueError(
                    f"ICO entry {k}: bad PNG color type {color_type}"
                )
            bpp = depth * ch
            fmt = "png"
        else:
            if len(body) < 16:
                raise ValueError(f"ICO entry {k}: torn DIB header")
            hdr_size, w, h2 = struct.unpack_from("<Iii", body, 0)
            if hdr_size < 40:
                raise ValueError(
                    f"ICO entry {k}: DIB header size {hdr_size}"
                )
            (bpp,) = struct.unpack_from("<H", body, 14)
            if h2 % 2:
                raise ValueError(
                    f"ICO entry {k}: DIB height {h2} not twice the "
                    "image height (missing AND mask)"
                )
            h = abs(h2) // 2
            fmt = "dib"
        # directory cross-check: 0 means 256, otherwise must agree
        for declared, actual, axis in ((dw, w, "width"), (dh, h, "height")):
            want = 256 if declared == 0 else declared
            if actual != want:
                raise ValueError(
                    f"ICO entry {k}: directory {axis} {want} != "
                    f"image {axis} {actual}"
                )
        entries.append(IcoEntry(int(w), int(h), int(bpp), fmt, size))
    # PARTIAL-overlap check, O(n log n) (cnt is attacker-controlled up to
    # 65535 — the per-pair scan was quadratic): sort claimed ranges and
    # compare neighbors. Entries ALIASING the exact same bytes (identical
    # offset+size — deduplicating encoders emit these) are legal; only a
    # partial overlap is corrupt.
    distinct = sorted({(lo, hi) for lo, hi, _ in claimed})
    by_range = {}
    for lo, hi, k in claimed:
        by_range.setdefault((lo, hi), k)
    for (alo, ahi), (blo, bhi) in zip(distinct, distinct[1:]):
        if blo < ahi:
            raise ValueError(
                f"ICO entry {by_range[(blo, bhi)]} payload [{blo}, {bhi}) "
                f"overlaps entry {by_range[(alo, ahi)]}'s [{alo}, {ahi})"
            )
    return IcoMeta("icon" if typ == 1 else "cursor", cnt, tuple(entries))


# ---------------------------------------------------------------- writer ---


def _dib_entry(w: int, h: int, bpp: int) -> bytes:
    """Headerless DIB: BITMAPINFOHEADER with doubled height, zeroed
    XOR pixels and AND mask (metadata fixtures — the walk never reads
    them)."""
    xor_stride = ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    body = bytes(xor_stride * h + and_stride * h)
    pal = bytes(4 * (1 << bpp)) if bpp <= 8 else b""
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, bpp, 0, len(body), 0, 0, 0, 0
    )
    return info + pal + body


def _png_entry(w: int, h: int, depth: int = 8, color_type: int = 6) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([depth, color_type, 0, 0, 0])
    import zlib

    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    # IHDR + a deliberately-empty IDAT + IEND: the metadata walk reads
    # only the header; a pixel decoder would reject this stub
    idat = b""
    out = (
        _PNG_MAGIC
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", crc)
        + struct.pack(">I", len(idat)) + b"IDAT" + idat
        + struct.pack(">I", zlib.crc32(b"IDAT" + idat) & 0xFFFFFFFF)
        + struct.pack(">I", 0) + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
    return out


def encode_ico(
    entries: list[tuple[int, int, int, str]], *, kind: str = "icon"
) -> bytes:
    """ICO/CUR fixture writer: ``entries`` rows are (width, height,
    bpp, 'png'|'dib'); 256 is written as the 0 sentinel in the
    directory, per spec."""
    typ = 1 if kind == "icon" else 2
    bodies = []
    for w, h, bpp, fmt in entries:
        bodies.append(
            _png_entry(w, h) if fmt == "png" else _dib_entry(w, h, bpp)
        )
    out = bytearray(struct.pack("<HHH", 0, typ, len(entries)))
    off = 6 + 16 * len(entries)
    for (w, h, bpp, fmt), body in zip(entries, bodies):
        out += struct.pack(
            "<BBBBHHII",
            0 if w == 256 else w,
            0 if h == 256 else h,
            (1 << bpp) if fmt == "dib" and bpp < 8 else 0,  # 0 = >=256
            0,
            1,
            bpp,
            len(body),
            off,
        )
        off += len(body)
    for body in bodies:
        out += body
    return bytes(out)
