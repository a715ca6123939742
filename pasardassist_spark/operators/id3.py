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


def encode_id3v2(
    *, version: int, encoding: int, frames: dict[str, str], padding: int = 16
) -> bytes:
    """Build a complete ID3v2.{3,4} tag.  ``frames`` maps 4-char text
    frame ids to values; ``encoding`` is the text-encoding byte (UTF-8
    is rejected for v2.3, per spec)."""
    if version not in (3, 4):
        raise ValueError("only ID3v2.3 / v2.4 supported")
    if encoding == 0x03 and version == 3:
        raise ValueError("UTF-8 text encoding requires ID3v2.4")
    body = b""
    for fid, value in frames.items():
        payload = _encode_text(value, encoding)
        size = _syncsafe(len(payload)) if version == 4 else struct.pack(
            ">I", len(payload)
        )
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    body += b"\x00" * padding
    return b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(body)) + body


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
    if version not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{version} tag")
    flags = payload[5]
    # ADVICE r13: flag-gated layouts change frame offsets/content — parse
    # them wrong silently or raise by name; this repo raises by name.
    if flags & 0x80:
        raise NotImplementedError("ID3v2 unsynchronisation unsupported")
    if flags & 0x40:
        raise NotImplementedError("ID3v2 extended header unsupported")
    tag_size = _unsyncsafe(payload[6:10])
    end = 10 + tag_size
    if end > len(payload):
        raise ValueError("ID3 tag size exceeds file")
    out: dict[str, str] = {"version": version}
    pos = 10
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid[0] == 0:  # padding reached
            break
        raw_size = payload[pos + 4 : pos + 8]
        size = _unsyncsafe(raw_size) if version == 4 else struct.unpack(
            ">I", raw_size
        )[0]
        body = payload[pos + 10 : pos + 10 + size]
        if len(body) != size:
            raise ValueError("truncated ID3 frame")
        fid_s = fid.decode("ascii", "replace")
        if fid_s in _TEXT_FRAMES and size >= 1:
            # ADVICE r13: the frame FORMAT flag byte gates compression /
            # encryption / per-frame unsync / data-length prefixes —
            # any of them shifts or transforms the body
            fmt_flags = payload[pos + 9]
            if fmt_flags:
                raise NotImplementedError(
                    f"ID3 frame format flags {fmt_flags:#04x} unsupported"
                )
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
