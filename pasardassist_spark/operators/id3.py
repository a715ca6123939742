"""ID3v2 tag reader/writer — audio metadata WITHOUT audio decode.

MP3 audio itself stays a named ffmpeg seam in this repo (synthesis
filterbanks are out of pure-Python scope), but the metadata a crawl
actually indexes — title/artist/album/year/track — lives in an ID3v2
tag PREPENDED to the MPEG stream and never touches a single audio
frame.  From the public id3.org specifications:

- Header: ``ID3`` + version (major, revision) + flags + 28-bit
  SYNCSAFE size (7 bits per byte, MSB clear — so the size can never
  contain a false frame-sync byte 0xFF).
- Frames: 4-char id + 4-byte size + 2 flag bytes + body.  v2.3 frame
  sizes are plain big-endian uint32; v2.4 frame sizes are syncsafe —
  the classic parser bug this pair of writers exists to pin.
- Text frames: leading encoding byte — 0x00 latin-1, 0x01 UTF-16 with
  BOM (the v2.3 Windows default), 0x03 UTF-8 (v2.4 only).
- Zero padding after the last frame, inside the declared tag size.

The parser walks header + frames only: O(tag bytes) per file no matter
how long the audio runs.
"""

from __future__ import annotations

import struct

_TEXT_FRAMES = ("TIT2", "TPE1", "TALB", "TYER", "TDRC", "TRCK")
# ID3v2.2 uses 3-character frame ids; map them onto the v2.3+ names so
# one readout covers all tag generations (id3v2-00 spec §4.2)
_V22_FRAMES = {
    "TT2": "TIT2", "TP1": "TPE1", "TAL": "TALB",
    "TYE": "TYER", "TRK": "TRCK",
}


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("syncsafe overflow")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe byte in syncsafe field")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _encode_text(s: str, encoding: int) -> bytes:
    if encoding == 0x00:
        return b"\x00" + s.encode("latin-1") + b"\x00"
    if encoding == 0x01:
        return b"\x01" + s.encode("utf-16")  # emits BOM
    if encoding == 0x03:
        return b"\x03" + s.encode("utf-8") + b"\x00"
    raise ValueError(f"unsupported ID3 text encoding {encoding}")


def _unsync_escape(data: bytes) -> bytes:
    """Apply ID3v2 unsynchronisation: insert 0x00 after any 0xFF that a
    naive MPEG sync scanner could misread (next byte 0x00 or 111xxxxx),
    per id3.org id3v2.4.0-structure 6.1."""
    out = bytearray()
    n = len(data)
    for i, b in enumerate(data):
        out.append(b)
        if b == 0xFF and (
            i + 1 == n or data[i + 1] == 0x00 or data[i + 1] & 0xE0 == 0xE0
        ):
            out.append(0x00)
    return bytes(out)


def _unsync_remove(data: bytes) -> bytes:
    """Reverse unsynchronisation: drop every 0x00 directly after 0xFF
    (single left-to-right pass — exactly bytes.replace semantics)."""
    return data.replace(b"\xff\x00", b"\xff")


def encode_id3v2(
    *,
    version: int,
    encoding: int,
    frames: dict[str, str],
    padding: int = 16,
    unsync: bool = False,
    extended_header: bool = False,
) -> bytes:
    """Build a complete ID3v2.{3,4} tag.  ``frames`` maps 4-char text
    frame ids to values; ``encoding`` is the text-encoding byte (UTF-8
    is rejected for v2.3, per spec).  ``unsync`` applies tag-level
    unsynchronisation for v2.3 and frame-level (format flag 0x02, with
    the tag-level announce bit) for v2.4 — the version split the spec
    mandates; ``extended_header`` prepends the version's minimal
    extended header (v2.3: 4-byte plain size excluding itself + flags
    + padding-size; v2.4: syncsafe size including itself + flag-count
    + flag byte)."""
    if version not in (2, 3, 4):
        raise ValueError("only ID3v2.2 / v2.3 / v2.4 supported")
    if encoding == 0x03 and version != 4:
        raise ValueError("UTF-8 text encoding requires ID3v2.4")
    if version == 2:
        if unsync or extended_header:
            raise ValueError(
                "v2.2 fixtures: unsync/extended header not modeled"
            )
        inv = {v: k for k, v in _V22_FRAMES.items()}
        body = b""
        for fid, value in frames.items():
            fid22 = inv.get(fid, fid[:3])
            payload = _encode_text(value, encoding)
            body += (
                fid22.encode("ascii")
                + len(payload).to_bytes(3, "big")
                + payload
            )
        body += b"\x00" * padding
        return b"ID3" + bytes([2, 0, 0]) + _syncsafe(len(body)) + body
    body = b""
    for fid, value in frames.items():
        payload = _encode_text(value, encoding)
        fmt_flag = 0
        if unsync and version == 4:
            payload = _unsync_escape(payload)
            fmt_flag = 0x02
        size = _syncsafe(len(payload)) if version == 4 else struct.pack(
            ">I", len(payload)
        )
        body += fid.encode("ascii") + size + bytes([0, fmt_flag]) + payload
    body += b"\x00" * padding
    flags = 0
    if extended_header:
        flags |= 0x40
        if version == 3:
            ext = struct.pack(">IHI", 6, 0, 0)  # size(excl) + flags + pad
        else:
            ext = _syncsafe(6) + bytes([1, 0])  # size(incl) + nflags + flags
        body = ext + body
    if unsync:
        flags |= 0x80
        if version == 3:
            body = _unsync_escape(body)
    return b"ID3" + bytes([version, 0, flags]) + _syncsafe(len(body)) + body


def id3_tag_span(payload: bytes) -> int:
    """Byte offset just past a leading ID3v2 tag (0 when there is none):
    header (10) + syncsafe size + the 10-byte footer when the footer
    flag (0x10) is set — the spec excludes both header and footer from
    the declared size.  This is where the MPEG audio stream begins
    (operators/mp3meta.py)."""
    if payload[:3] != b"ID3":
        return 0
    if len(payload) < 10:
        raise ValueError("truncated ID3 header")
    span = 10 + _unsyncsafe(payload[6:10])
    if payload[5] & 0x10:
        span += 10
    if span > len(payload):
        raise ValueError("ID3 tag size exceeds file")
    return span


def parse_id3(payload: bytes) -> dict | None:
    """Extract text frames from an ID3v2.3/2.4 tag; None when the file
    carries no tag (common — not an error).  Unknown frames and the
    audio stream after the tag are never materialized."""
    if payload[:3] != b"ID3":
        return None
    if len(payload) < 10:
        raise ValueError("truncated ID3 header")
    version = payload[3]
    if version not in (2, 3, 4):
        raise ValueError(f"unsupported ID3v2.{version} tag")
    flags = payload[5]
    tag_size = _unsyncsafe(payload[6:10])
    end = 10 + tag_size
    if end > len(payload):
        raise ValueError("ID3 tag size exceeds file")
    # r15 (ADVICE r14 item 2): tag-level unsynchronisation and the
    # extended header are now READ, not raised.  v2.3 unsyncs the whole
    # tag body (frame sizes refer to de-unsynced data); v2.4 unsyncs
    # per-frame (format flag 0x02, sizes refer to stored bytes).
    buf = payload[10:end]
    if flags & 0x80 and version in (2, 3):
        # v2.2 and v2.3 unsync the whole tag body
        buf = _unsync_remove(buf)
    if version == 2 and flags & 0x40:
        # the v2.2 compression announce bit — no scheme was ever
        # defined, so a tag carrying it is unreadable by spec
        raise NotImplementedError("ID3v2.2 compression bit unsupported")
    if flags & 0x40:  # extended header
        if version == 3:
            if len(buf) < 4:
                raise ValueError("torn ID3v2.3 extended header")
            ext_size = struct.unpack(">I", buf[:4])[0]  # excludes itself
            skip = 4 + ext_size
        else:
            if len(buf) < 4:
                raise ValueError("torn ID3v2.4 extended header")
            skip = _unsyncsafe(buf[:4])  # includes itself
            if skip < 6:
                raise ValueError("bad ID3v2.4 extended header size")
        if skip > len(buf):
            raise ValueError("ID3 extended header exceeds tag")
        buf = buf[skip:]
    out: dict[str, str] = {"version": version}
    pos = 0
    end = len(buf)
    if version == 2:
        # 3-char ids, 3-byte big-endian sizes, NO flag bytes (r15)
        while pos + 6 <= end:
            fid22 = buf[pos : pos + 3]
            if fid22[0] == 0:
                break
            size = int.from_bytes(buf[pos + 3 : pos + 6], "big")
            body = buf[pos + 6 : pos + 6 + size]
            if len(body) != size:
                raise ValueError("truncated ID3 frame")
            fid_s = _V22_FRAMES.get(fid22.decode("ascii", "replace"))
            if fid_s and size >= 1:
                enc, text = body[0], body[1:]
                if enc == 0x00:
                    val = text.decode("latin-1")
                elif enc == 0x01:
                    val = text.decode("utf-16")
                else:
                    raise ValueError(
                        f"unsupported ID3v2.2 text encoding {enc}"
                    )
                out[fid_s] = val.rstrip("\x00")
            pos += 6 + size
        return out
    while pos + 10 <= end:
        fid = buf[pos : pos + 4]
        if fid[0] == 0:  # padding reached
            break
        raw_size = buf[pos + 4 : pos + 8]
        size = _unsyncsafe(raw_size) if version == 4 else struct.unpack(
            ">I", raw_size
        )[0]
        body = buf[pos + 10 : pos + 10 + size]
        if len(body) != size:
            raise ValueError("truncated ID3 frame")
        fid_s = fid.decode("ascii", "replace")
        if fid_s in _TEXT_FRAMES and size >= 1:
            # ADVICE r13: the frame FORMAT flag byte gates compression /
            # encryption / per-frame unsync / data-length prefixes —
            # anything beyond the v2.4 unsync / data-length bits shifts
            # or transforms the body; those still raise by name
            fmt_flags = buf[pos + 9]
            known = 0x03 if version == 4 else 0x00
            if fmt_flags & ~known:
                raise NotImplementedError(
                    f"ID3 frame format flags {fmt_flags:#04x} unsupported"
                )
            if version == 4 and fmt_flags & 0x02:
                body = _unsync_remove(body)
            if version == 4 and fmt_flags & 0x01:
                if len(body) < 4:
                    raise ValueError("torn data-length indicator")
                body = body[4:]  # syncsafe true-length prefix
            if not body:
                raise ValueError("truncated ID3 frame")
            enc, text = body[0], body[1:]
            if enc == 0x00:
                val = text.decode("latin-1")
            elif enc == 0x01:
                val = text.decode("utf-16")  # BOM-led
            elif enc == 0x03:
                val = text.decode("utf-8")
            else:
                raise ValueError(f"unsupported ID3 text encoding {enc}")
            out[fid_s] = val.rstrip("\x00")
        pos += 10 + size
    return out
