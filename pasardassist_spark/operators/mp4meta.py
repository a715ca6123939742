"""ISO base-media (MP4/MOV, ISO/IEC 14496-12) box-tree metadata walk —
duration, timescale, per-track handler/codec/dimensions — WITHOUT any
sample decode.

Reference parity: the reference pipeline records media metadata for
fetched video/audio assets before deciding whether to keep them (the
same no-decode indexing pass mm_mp3_frames does for MPEG audio and
exif.py does for JPEG); the MP4 box tree is the container virtually all
crawled video (and much audio) arrives in.  Implemented, all against
the public 14496-12 structure:

- the box grammar with ALL THREE size forms: compact 32-bit, ``size ==
  1`` + 64-bit largesize, and ``size == 0`` (box extends to EOF — legal
  only for the last top-level box, typically ``mdat``);
- ``ftyp`` (major brand), ``mvhd`` versions 0 AND 1 (32- vs 64-bit
  times) for the movie timescale/duration, and per ``trak``: ``tkhd``
  (track id, 16.16 fixed-point presentation width/height, both
  versions), ``mdhd`` (media timescale/duration, both versions),
  ``hdlr`` (handler fourcc: vide/soun/text/...), and the first ``stsd``
  sample-entry fourcc (the codec tag: avc1, mp4a, ...);
- unknown/irrelevant boxes (``free``, ``skip``, ``uuid``, vendor tags)
  are skipped by declared size at every level — the walk never assumes
  a fixed layout.

Fragmented files (a ``moof`` box — the DASH/CMAF layout whose duration
lives in segment indexes) raise NotImplementedError BY NAME; a missing
``moov``, torn box, or short payload raises ValueError (a damaged file
dead-letters loudly, never parses wrong).  Sample DATA is never touched
— the walk cost is O(metadata bytes), independent of media size.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

__all__ = ["Mp4Track", "Mp4Meta", "parse_mp4_meta", "encode_mp4_meta"]


class Mp4Track(NamedTuple):
    track_id: int
    handler: str  # 'vide' / 'soun' / ...
    codec: str  # first stsd entry fourcc
    width: int  # integer part of tkhd 16.16 (0 for non-visual)
    height: int
    duration_ms: int  # mdhd duration scaled by mdhd timescale


class Mp4Meta(NamedTuple):
    brand: str
    timescale: int
    duration_ms: int
    tracks: tuple[Mp4Track, ...]


def _boxes(buf: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) walking one container level."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("torn MP4 box header")
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4 : pos + 8].decode("latin-1")
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("torn MP4 largesize header")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
            if size < 16:
                raise ValueError(f"bad MP4 largesize {size}")
        elif size == 0:
            size = end - pos  # to EOF (last box)
        elif size < 8:
            raise ValueError(f"bad MP4 box size {size}")
        if pos + size > end:
            raise ValueError(f"MP4 box '{btype}' overruns file")
        yield btype, body, pos + size
        pos += size


def _find(buf: bytes, pos: int, end: int, btype: str):
    for t, b, e in _boxes(buf, pos, end):
        if t == btype:
            return b, e
    return None


def _fullbox(buf: bytes, pos: int) -> tuple[int, int]:
    """(version, body-after-version/flags offset)."""
    if pos + 4 > len(buf):
        raise ValueError("torn fullbox header")
    return buf[pos], pos + 4


def _mvhd(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    v, p = _fullbox(buf, pos)
    if v == 1:
        if p + 28 > end:
            raise ValueError("torn mvhd v1")
        timescale, duration = struct.unpack_from(">IQ", buf, p + 16)
    elif v == 0:
        if p + 16 > end:
            raise ValueError("torn mvhd v0")
        timescale, duration = struct.unpack_from(">II", buf, p + 8)
    else:
        raise ValueError(f"mvhd version {v} unknown")
    return timescale, duration


def _tkhd(buf: bytes, pos: int, end: int) -> tuple[int, int, int]:
    """(track_id, width_int, height_int)."""
    v, p = _fullbox(buf, pos)
    if v == 1:
        if p + 20 > end:
            raise ValueError("torn tkhd v1")
        (track_id,) = struct.unpack_from(">I", buf, p + 16)
        fixed_at = p + 32 + 52  # post-duration reserved+layer+matrix
    elif v == 0:
        if p + 12 > end:
            raise ValueError("torn tkhd v0")
        (track_id,) = struct.unpack_from(">I", buf, p + 8)
        fixed_at = p + 20 + 52
    else:
        raise ValueError(f"tkhd version {v} unknown")
    if fixed_at + 8 > end:
        raise ValueError("torn tkhd")
    w, h = struct.unpack_from(">II", buf, fixed_at)
    return track_id, w >> 16, h >> 16


def _mdhd(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    v, p = _fullbox(buf, pos)
    if v == 1:
        if p + 28 > end:
            raise ValueError("torn mdhd v1")
        timescale, duration = struct.unpack_from(">IQ", buf, p + 16)
    elif v == 0:
        if p + 16 > end:
            raise ValueError("torn mdhd v0")
        timescale, duration = struct.unpack_from(">II", buf, p + 8)
    else:
        raise ValueError(f"mdhd version {v} unknown")
    return timescale, duration


def parse_mp4_meta(payload: bytes) -> Mp4Meta:
    end = len(payload)
    brand = ""
    moov = None
    for t, b, e in _boxes(payload, 0, end):
        if t == "ftyp":
            if e - b < 8:
                raise ValueError("torn ftyp")
            brand = payload[b : b + 4].decode("latin-1")
        elif t == "moov":
            moov = (b, e)
        elif t == "moof":
            raise NotImplementedError(
                "fragmented MP4 (moof segments) unsupported"
            )
    if moov is None:
        raise ValueError("MP4 has no moov box")
    mb, me = moov
    mv = _find(payload, mb, me, "mvhd")
    if mv is None:
        raise ValueError("moov has no mvhd")
    timescale, duration = _mvhd(payload, *mv)
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")
    tracks: list[Mp4Track] = []
    for t, b, e in _boxes(payload, mb, me):
        if t != "trak":
            continue
        tk = _find(payload, b, e, "tkhd")
        md = _find(payload, b, e, "mdia")
        if tk is None or md is None:
            raise ValueError("trak lacks tkhd/mdia")
        track_id, w, h = _tkhd(payload, *tk)
        mdh = _find(payload, md[0], md[1], "mdhd")
        hdl = _find(payload, md[0], md[1], "hdlr")
        if mdh is None or hdl is None:
            raise ValueError("mdia lacks mdhd/hdlr")
        mts, mdur = _mdhd(payload, *mdh)
        if mts == 0:
            raise ValueError("mdhd timescale is zero")
        handler = payload[hdl[0] + 8 : hdl[0] + 12].decode("latin-1")
        codec = ""
        minf = _find(payload, md[0], md[1], "minf")
        if minf is not None:
            stbl = _find(payload, minf[0], minf[1], "stbl")
            if stbl is not None:
                stsd = _find(payload, stbl[0], stbl[1], "stsd")
                if stsd is not None:
                    sp = stsd[0] + 4  # fullbox
                    if sp + 4 > stsd[1]:
                        raise ValueError("torn stsd")
                    (n_entries,) = struct.unpack_from(">I", payload, sp)
                    if n_entries > 0:
                        if sp + 12 > stsd[1]:
                            raise ValueError("torn stsd entry")
                        codec = payload[sp + 8 : sp + 12].decode(
                            "latin-1"
                        )
        tracks.append(
            Mp4Track(
                track_id,
                handler,
                codec,
                w,
                h,
                mdur * 1000 // mts,
            )
        )
    return Mp4Meta(brand, timescale, duration * 1000 // timescale, tuple(tracks))


# ---------------------------------------------------------------- writer ---


def _box(btype: str, body: bytes, largesize: bool = False) -> bytes:
    t = btype.encode("latin-1")
    if largesize:
        return struct.pack(">I", 1) + t + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + t + body


def _full(btype: str, version: int, body: bytes, **kw) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body, **kw)


def encode_mp4_meta(
    brand: str,
    timescale: int,
    duration_units: int,
    tracks: list[tuple[int, str, str, int, int, int, int]],
    *,
    version: int = 0,
    moov_largesize: bool = False,
    mdat_to_eof: bool = True,
) -> bytes:
    """Minimal conforming ISO-BMFF skeleton for metadata-walk fixtures.

    ``tracks`` rows: (track_id, handler, codec, width, height,
    media_timescale, media_duration_units).  ``version`` picks 32- vs
    64-bit mvhd/tkhd/mdhd times; ``moov_largesize`` writes moov with
    the size==1 + 64-bit largesize form; ``mdat_to_eof`` appends a
    trailing mdat with size==0 (extends to EOF).  A ``free`` box and an
    unknown ``uuid`` box are always spliced in so walkers must skip by
    declared size."""
    if version == 1:
        mvhd = _full(
            "mvhd",
            1,
            struct.pack(">QQIQ", 0, 0, timescale, duration_units)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + bytes(8)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + bytes(24)
            + struct.pack(">I", len(tracks) + 1),
        )
    else:
        mvhd = _full(
            "mvhd",
            0,
            struct.pack(">IIII", 0, 0, timescale, duration_units)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + bytes(8)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + bytes(24)
            + struct.pack(">I", len(tracks) + 1),
        )
    traks = b""
    for track_id, handler, codec, w, h, mts, mdur in tracks:
        if version == 1:
            tkhd_body = (
                struct.pack(">QQIIQ", 0, 0, track_id, 0, mdur)
                + bytes(8)
                + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16)
            )
            mdhd_body = struct.pack(">QQIQ", 0, 0, mts, mdur) + struct.pack(
                ">HH", 0x55C4, 0
            )
        else:
            tkhd_body = (
                struct.pack(">IIIII", 0, 0, track_id, 0, mdur)
                + bytes(8)
                + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16)
            )
            mdhd_body = struct.pack(">IIII", 0, 0, mts, mdur) + struct.pack(
                ">HH", 0x55C4, 0
            )
        tkhd = _full("tkhd", version, tkhd_body)
        mdhd = _full("mdhd", version, mdhd_body)
        hdlr = _full(
            "hdlr",
            0,
            struct.pack(">I", 0)
            + handler.encode("latin-1")
            + bytes(12)
            + b"Handler\x00",
        )
        entry = _box(codec, bytes(6) + struct.pack(">H", 1) + bytes(16))
        stsd = _full("stsd", 0, struct.pack(">I", 1) + entry)
        stbl = _box("stbl", stsd)
        minf = _box("minf", stbl)
        mdia = _box("mdia", mdhd + hdlr + minf)
        traks += _box("trak", tkhd + _box("free", b"pad") + mdia)
    moov = _box("moov", mvhd + traks, largesize=moov_largesize)
    out = (
        _box("ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom")
        + _box("free", b"\x00" * 9)
        + moov
        + _box("uuid", bytes(range(16)) + b"vendor-opaque")
    )
    if mdat_to_eof:
        out += struct.pack(">I", 0) + b"mdat" + b"\x00" * 32
    return out
