"""EBML / Matroska / WebM container metadata walk — DocType, duration,
per-track codec/dimensions/audio clock — WITHOUT any frame decode.

Reference parity: the no-decode media-indexing pass of
operators/mp4meta.py for the OTHER half of crawled web video — WebM
(VP8/VP9/Opus in Matroska) is the open-web counterpart of MP4, and the
\"mkv\" superset carries most pirated/archival video.  All against the
public structure (RFC 8794 EBML + the matroska.org element registry):

- the EBML element grammar: variable-length element IDs (1-4 bytes,
  leading-bit length marker KEPT, per spec) and variable-length sizes
  (1-8 bytes, marker STRIPPED), nested by declared size;
- the UNKNOWN-SIZE form (all size bits set) accepted for the Segment
  only (the streamed-muxer layout, extends to EOF) and rejected by
  name anywhere else;
- EBML header → DocType (``matroska`` / ``webm``); Segment → Info →
  TimestampScale (default 1,000,000 ns) + Duration (4- or 8-byte IEEE
  float in scale units); Tracks → TrackEntry → TrackNumber, TrackType
  (1 video / 2 audio / 17 subtitle), CodecID, Video{PixelWidth,
  PixelHeight}, Audio{SamplingFrequency (float), Channels};
- Clusters / Cues / unknown elements skip by declared size.

Torn elements raise ValueError; unknown-size non-Segment elements and
foreign DocTypes raise NotImplementedError BY NAME.  Frame data is
never touched — the walk cost is O(metadata bytes).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

__all__ = ["MkvTrack", "MkvMeta", "parse_mkv_meta", "encode_mkv_meta"]

_UNKNOWN = object()  # sentinel for unknown-size elements


class MkvTrack(NamedTuple):
    number: int
    kind: str  # 'video' | 'audio' | 'subtitle'
    codec: str  # CodecID string, e.g. 'V_VP9'
    width: int  # 0 for non-video
    height: int
    sample_rate: int  # 0 for non-audio (int(SamplingFrequency))
    channels: int  # 0 for non-audio


class MkvMeta(NamedTuple):
    doctype: str
    timescale_ns: int
    duration_ms: int
    tracks: tuple[MkvTrack, ...]


_TRACK_KINDS = {1: "video", 2: "audio", 17: "subtitle"}


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos).  EBML vints: the number of leading zero bits of
    the first byte gives extra length; IDs keep the marker bit, sizes
    strip it.  Returns _UNKNOWN-coded -1 for an all-ones size."""
    if pos >= len(buf):
        raise ValueError("torn EBML vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (first byte 0)")
    length = 1
    mask = 0x80
    while not first & mask:
        length += 1
        mask >>= 1
    if pos + length > len(buf):
        raise ValueError("torn EBML vint body")
    if keep_marker:
        value = int.from_bytes(buf[pos : pos + length], "big")
    else:
        value = first & (mask - 1)
        for b in buf[pos + 1 : pos + length]:
            value = (value << 8) | b
        # all-ones data bits = unknown size
        if value == (1 << (7 * length)) - 1:
            return -1, pos + length
    return value, pos + length


def _elements(buf: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over one level."""
    while pos < end:
        eid, p = _read_vint(buf, pos, keep_marker=True)
        size, p = _read_vint(buf, p, keep_marker=False)
        if size == -1:
            if eid == 0x18538067:  # Segment may be unknown-size (to EOF)
                yield eid, p, end
                return
            raise NotImplementedError(
                f"EBML unknown-size element 0x{eid:X} unsupported"
            )
        if p + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns parent")
        yield eid, p, p + size
        pos = p + size


def _uint(buf: bytes, b: int, e: int) -> int:
    return int.from_bytes(buf[b:e], "big")


def _float(buf: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", buf[b:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[b:e])[0]
    if n == 0:
        return 0.0
    raise ValueError(f"EBML float of width {n}")


def parse_mkv_meta(payload: bytes) -> MkvMeta:
    doctype = ""
    segment = None
    for eid, b, e in _elements(payload, 0, len(payload)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hb, he in _elements(payload, b, e):
                if hid == 0x4282:  # DocType
                    doctype = payload[hb:he].decode("ascii")
        elif eid == 0x18538067:  # Segment
            segment = (b, e)
    if doctype not in ("matroska", "webm"):
        raise NotImplementedError(
            f"EBML DocType {doctype!r} unsupported"
        )
    if segment is None:
        raise ValueError("EBML stream has no Segment")
    timescale = 1_000_000  # ns, Matroska default
    duration_scaled = 0.0
    tracks: list[MkvTrack] = []
    for eid, b, e in _elements(payload, *segment):
        if eid == 0x1549A966:  # Info
            for iid, ib, ie in _elements(payload, b, e):
                if iid == 0x2AD7B1:
                    timescale = _uint(payload, ib, ie)
                elif iid == 0x4489:
                    duration_scaled = _float(payload, ib, ie)
        elif eid == 0x1654AE6B:  # Tracks
            for tid, tb, te in _elements(payload, b, e):
                if tid != 0xAE:  # TrackEntry
                    continue
                num = kind_code = 0
                codec = ""
                w = h = rate = ch = 0
                for fid, fb, fe in _elements(payload, tb, te):
                    if fid == 0xD7:
                        num = _uint(payload, fb, fe)
                    elif fid == 0x83:
                        kind_code = _uint(payload, fb, fe)
                    elif fid == 0x86:
                        codec = payload[fb:fe].decode("ascii")
                    elif fid == 0xE0:  # Video
                        for vid, vb, ve in _elements(payload, fb, fe):
                            if vid == 0xB0:
                                w = _uint(payload, vb, ve)
                            elif vid == 0xBA:
                                h = _uint(payload, vb, ve)
                    elif fid == 0xE1:  # Audio
                        for aid, ab, ae in _elements(payload, fb, fe):
                            if aid == 0xB5:
                                rate = int(_float(payload, ab, ae))
                            elif aid == 0x9F:
                                ch = _uint(payload, ab, ae)
                kind = _TRACK_KINDS.get(kind_code)
                if kind is None:
                    raise ValueError(
                        f"Matroska TrackType {kind_code} unknown"
                    )
                tracks.append(MkvTrack(num, kind, codec, w, h, rate, ch))
        # Clusters (0x1F43B675), Cues, SeekHead etc: skip by size
    if timescale == 0:
        raise ValueError("Matroska TimestampScale is zero")
    duration_ms = int(duration_scaled * timescale // 1_000_000)
    return MkvMeta(doctype, timescale, duration_ms, tuple(tracks))


# ---------------------------------------------------------------- writer ---


def _vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(value: int) -> bytes:
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | value).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_mkv_meta(
    doctype: str,
    duration_ms: int,
    tracks: list[tuple[int, str, str, int, int, int, int]],
    *,
    timescale_ns: int = 1_000_000,
    segment_unknown_size: bool = False,
    float32_duration: bool = False,
) -> bytes:
    """Minimal conforming Matroska/WebM skeleton for metadata-walk
    fixtures.  ``tracks`` rows mirror MkvTrack.  ``duration_ms`` is
    stored as an IEEE float in timescale units (exactly representable
    for the integer fixtures used here); ``segment_unknown_size``
    writes the streamed-muxer unknown-size Segment; ``float32_duration``
    stores Duration as a 4-byte float (use only for values exact in
    float32)."""
    header = _el(
        0x1A45DFA3,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el_uint(0x42F7, 1)
        + _el(0x4282, doctype.encode("ascii"))
        + _el_uint(0x4287, 4),
    )
    dur_units = duration_ms * 1_000_000 / timescale_ns
    dur_bytes = (
        struct.pack(">f", dur_units)
        if float32_duration
        else struct.pack(">d", dur_units)
    )
    info = _el(
        0x1549A966,
        _el_uint(0x2AD7B1, timescale_ns)
        + _el(0x4489, dur_bytes)
        + _el(0x4D80, b"pasardassist")  # MuxingApp
        + _el(0x5741, b"pasardassist"),  # WritingApp
    )
    kinds = {v: k for k, v in _TRACK_KINDS.items()}
    entries = b""
    for num, kind, codec, w, h, rate, ch in tracks:
        body = (
            _el_uint(0xD7, num)
            + _el_uint(0x73C5, 0x1000 + num)  # TrackUID
            + _el_uint(0x83, kinds[kind])
            + _el(0x86, codec.encode("ascii"))
        )
        if kind == "video":
            body += _el(0xE0, _el_uint(0xB0, w) + _el_uint(0xBA, h))
        elif kind == "audio":
            body += _el(
                0xE1,
                _el(0xB5, struct.pack(">d", float(rate)))
                + _el_uint(0x9F, ch),
            )
        entries += _el(0xAE, body)
    tracks_el = _el(0x1654AE6B, entries)
    # a void-ish cluster stub the walker must skip by size
    cluster = _el(0x1F43B675, _el_uint(0xE7, 0) + b"\x00" * 24)
    seg_body = info + tracks_el + cluster
    if segment_unknown_size:
        segment = (
            _vint_id(0x18538067) + b"\x01" + b"\xff" * 7 + seg_body
        )
    else:
        segment = _el(0x18538067, seg_body)
    return header + segment
