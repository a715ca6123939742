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

Fragmented files (``moof`` segments — the DASH/CMAF layout, screen
recorders, live captures) are WALKED, not dead-lettered (r15): the
``moov/mvex`` init data (``trex`` per-track sample-duration defaults,
optional ``mehd`` whole-movie duration) plus every ``moof/traf``
(``tfhd`` local defaults, ``trun`` runs with or without per-sample
durations) accumulate per-track duration in media-timescale units, so
duration/track readout works without decoding a single sample — the
three duration sources (trun per-sample, tfhd default, trex default)
all resolve per [14496-12 §8.8].  A track with NO duration source
raises ValueError; ENCRYPTED fragments (``senc``/``saiz`` sample
auxiliary, CENC ``pssh``) raise NotImplementedError BY NAME.  A
missing ``moov``, torn box, or short payload raises ValueError (a
damaged file dead-letters loudly, never parses wrong).  Sample DATA
is never touched — the walk cost is O(metadata bytes), independent of
media size.
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


def _u32(buf: bytes, pos: int, end: int, what: str) -> int:
    if pos + 4 > end:
        raise ValueError(f"torn {what}")
    return struct.unpack_from(">I", buf, pos)[0]


def _mvex(buf: bytes, pos: int, end: int) -> tuple[int | None, dict[int, int]]:
    """moov/mvex: (mehd fragment_duration | None, track_id ->
    trex default_sample_duration)."""
    mehd_dur: int | None = None
    trex: dict[int, int] = {}
    for t, b, e in _boxes(buf, pos, end):
        if t == "mehd":
            v, p = _fullbox(buf, b)
            if v == 1:
                if p + 8 > e:
                    raise ValueError("torn mehd v1")
                (mehd_dur,) = struct.unpack_from(">Q", buf, p)
            else:
                mehd_dur = _u32(buf, p, e, "mehd v0")
        elif t == "trex":
            _, p = _fullbox(buf, b)
            track_id = _u32(buf, p, e, "trex")
            # skip default_sample_description_index
            trex[track_id] = _u32(buf, p + 8, e, "trex defaults")
    return mehd_dur, trex


def _traf_duration(
    buf: bytes, pos: int, end: int, trex: dict[int, int]
) -> tuple[int, int]:
    """One traf: (track_id, summed sample duration in media units).

    Resolution order per [14496-12 §8.8.7/8.8.8]: trun per-sample
    durations (flag 0x100) > tfhd default_sample_duration (flag 0x8) >
    the track's trex default.  tfhd flag 0x010000 = duration-is-empty.
    """
    tf = _find(buf, pos, end, "tfhd")
    if tf is None:
        raise ValueError("traf lacks tfhd")
    b, e = tf
    if b + 8 > e:
        raise ValueError("torn tfhd")
    verflags = struct.unpack_from(">I", buf, b)[0]
    tf_flags = verflags & 0xFFFFFF
    track_id = _u32(buf, b + 4, e, "tfhd track_id")
    p = b + 8
    if tf_flags & 0x000001:  # base_data_offset (u64)
        p += 8
    if tf_flags & 0x000002:  # sample_description_index
        p += 4
    tfhd_default: int | None = None
    if tf_flags & 0x000008:
        tfhd_default = _u32(buf, p, e, "tfhd default_sample_duration")
        p += 4
    if tf_flags & 0x010000:  # duration-is-empty
        return track_id, 0
    default = tfhd_default if tfhd_default is not None else trex.get(track_id)
    total = 0
    for t, tb, te in _boxes(buf, pos, end):
        if t == "senc" or t == "saiz" or t == "saio":
            raise NotImplementedError(
                f"encrypted MP4 fragment ({t} sample auxiliary) unsupported"
            )
        if t != "trun":
            continue
        if tb + 8 > te:
            raise ValueError("torn trun")
        tr_flags = struct.unpack_from(">I", buf, tb)[0] & 0xFFFFFF
        n_samples = _u32(buf, tb + 4, te, "trun sample_count")
        q = tb + 8
        if tr_flags & 0x000001:  # data_offset
            q += 4
        if tr_flags & 0x000004:  # first_sample_flags
            q += 4
        if tr_flags & 0x000100:  # per-sample durations
            per = 4 * (
                1
                + bool(tr_flags & 0x000200)
                + bool(tr_flags & 0x000400)
                + bool(tr_flags & 0x000800)
            )
            if q + per * n_samples > te:
                raise ValueError("torn trun sample table")
            for k in range(n_samples):
                total += struct.unpack_from(">I", buf, q + per * k)[0]
        else:
            if default is None:
                raise ValueError(
                    f"track {track_id}: no sample duration source "
                    "(trun/tfhd/trex all silent)"
                )
            total += n_samples * default
    return track_id, total


def parse_mp4_meta(payload: bytes) -> Mp4Meta:
    end = len(payload)
    brand = ""
    moov = None
    moofs: list[tuple[int, int]] = []
    for t, b, e in _boxes(payload, 0, end):
        if t == "ftyp":
            if e - b < 8:
                raise ValueError("torn ftyp")
            brand = payload[b : b + 4].decode("latin-1")
        elif t == "moov":
            moov = (b, e)
        elif t == "moof":
            moofs.append((b, e))
        elif t == "pssh":
            # DASH/CMAF commonly carries pssh TOP-LEVEL, not inside moov
            raise NotImplementedError(
                "encrypted MP4 (top-level CENC pssh) unsupported"
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
    if _find(payload, mb, me, "pssh") is not None:
        raise NotImplementedError("encrypted MP4 (CENC pssh) unsupported")
    mehd_dur: int | None = None
    trex: dict[int, int] = {}
    mvex = _find(payload, mb, me, "mvex")
    if mvex is not None:
        mehd_dur, trex = _mvex(payload, *mvex)
    frag_units: dict[int, int] = {}
    for fb, fe in moofs:
        for t, b, e in _boxes(payload, fb, fe):
            if t == "traf":
                tid, units = _traf_duration(payload, b, e, trex)
                frag_units[tid] = frag_units.get(tid, 0) + units
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
        # fragmented layout: mdhd duration is typically 0 and the real
        # duration lives in the accumulated moof sample runs (same
        # media timescale)
        mdur_units = mdur if mdur else frag_units.get(track_id, 0)
        tracks.append(
            Mp4Track(
                track_id,
                handler,
                codec,
                w,
                h,
                mdur_units * 1000 // mts,
            )
        )
    if duration == 0 and moofs:
        if mehd_dur is not None:
            movie_ms = mehd_dur * 1000 // timescale
        else:
            movie_ms = max((t.duration_ms for t in tracks), default=0)
    else:
        movie_ms = duration * 1000 // timescale
    return Mp4Meta(brand, timescale, movie_ms, tuple(tracks))


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


def encode_fmp4_meta(
    brand: str,
    timescale: int,
    duration_units: int,
    tracks: list[tuple[int, str, str, int, int, int, int]],
    *,
    duration_source: list[str] | None = None,
    n_fragments: int = 2,
    mehd: bool = True,
    version: int = 0,
    trun_version: int = 0,
    rich_runs: bool = False,
) -> bytes:
    """Fragmented (DASH/CMAF-style) ISO-BMFF skeleton for walk fixtures.

    Same ``tracks`` rows as encode_mp4_meta; mvhd and every mdhd carry
    duration 0 (the fragmented convention) so the parser MUST recover
    durations from the moof side.  ``duration_source`` picks, per
    track, where its duration lives: ``'trun'`` (per-sample durations,
    flag 0x100), ``'tfhd'`` (default_sample_duration, flag 0x8), or
    ``'trex'`` (mvex default) — defaults to cycling all three.
    ``mehd`` controls whether the movie duration is announced in
    mvex/mehd or must fall back to the max track duration.
    ``rich_runs`` adds data_offset + first_sample_flags + per-sample
    size/flags/composition-offset columns and a tfdt box, so walkers
    must skip every optional field by flags, and a tfhd
    default-base-is-moof + sample_description_index combination."""
    if duration_source is None:
        duration_source = [
            ("trun", "tfhd", "trex")[i % 3] for i in range(len(tracks))
        ]
    zeroed = [
        (tid, h, c, w, ht, mts, 0)
        for (tid, h, c, w, ht, mts, _d) in tracks
    ]
    base = encode_mp4_meta(
        brand, timescale, 0, zeroed, version=version, mdat_to_eof=False
    )
    # strip the trailing uuid box (keep it: walkers skip it anyway) and
    # splice mvex into moov: rebuild moov with mvex appended
    trexes = b""
    for (tid, _h, _c, _w, _ht, _mts, mdur), src in zip(tracks, duration_source):
        default = 1 if src == "trex" else 7  # 7 = decoy, must be ignored
        trexes += _full(
            "trex", 0, struct.pack(">IIIII", tid, 1, default, 0, 0)
        )
    mvex_body = b""
    if mehd:
        mvex_body += _full("mehd", 0, struct.pack(">I", duration_units))
    mvex_body += trexes
    mvex = _box("mvex", mvex_body)
    # locate moov by walking the top-level boxes (a raw bytes.find could
    # match the fourcc inside an earlier box payload, e.g. a handler name)
    moov_span = next(
        ((b, e) for t, b, e in _boxes(base, 0, len(base)) if t == "moov"),
        None,
    )
    if moov_span is None:
        raise ValueError("encode_fmp4_meta: base has no top-level moov")
    body_start, body_end = moov_span  # _boxes yields BODY bounds
    # header is 8 bytes (size32 + fourcc) or 16 (size==1 + largesize):
    # locate it by where the fourcc actually sits, not by assumption
    if base[body_start - 4 : body_start] == b"moov":
        hdr_start = body_start - 8
    elif base[body_start - 12 : body_start - 8] == b"moov":
        hdr_start = body_start - 16  # largesize header form
    else:
        raise ValueError("encode_fmp4_meta: cannot locate moov header")
    new_moov = _box("moov", base[body_start:body_end] + mvex)
    out = base[:hdr_start] + new_moov + base[body_end:]
    # fragments: each moof holds one traf per track + a tiny mdat
    seq = 0
    for f in range(n_fragments):
        seq += 1
        trafs = b""
        for (tid, _h, _c, _w, _ht, _mts, mdur), src in zip(
            tracks, duration_source
        ):
            units = mdur // n_fragments
            if f == n_fragments - 1:
                units = mdur - units * (n_fragments - 1)
            tf_flags = 0x020000  # default-base-is-moof
            tfhd_body = b""
            if rich_runs:
                tf_flags |= 0x000002  # sample_description_index
                tfhd_body += struct.pack(">I", 1)
            if src == "tfhd":
                tf_flags |= 0x000008
                tfhd_body += struct.pack(">I", 1)  # default duration 1
            tfhd = _box(
                "tfhd",
                struct.pack(">I", tf_flags)
                + struct.pack(">I", tid)
                + tfhd_body,
            )
            traf_body = tfhd
            if rich_runs:
                traf_body += _full("tfdt", 0, struct.pack(">I", f * 1000))
            if src == "trun":
                k = min(3, units) or 1
                per = [units // k] * k
                per[-1] += units - sum(per)
                tr_flags = 0x000100
                head = b""
                if rich_runs:
                    tr_flags |= 0x000001 | 0x000004 | 0x000200 | 0x000400 | 0x000800
                    head += struct.pack(">i", 512) + struct.pack(">I", 0)
                table = b""
                for d in per:
                    table += struct.pack(">I", d)
                    if rich_runs:
                        table += struct.pack(">III", 64, 0, 0)
                trun = _box(
                    "trun",
                    bytes([trun_version, 0, 0, 0])[:1]
                    + struct.pack(">I", tr_flags)[1:]
                    + struct.pack(">I", len(per))
                    + head
                    + table,
                )
            else:
                # no per-sample durations: sample_count x default (1)
                tr_flags = 0x000001 if rich_runs else 0
                head = struct.pack(">i", 512) if rich_runs else b""
                trun = _box(
                    "trun",
                    bytes([trun_version])
                    + struct.pack(">I", tr_flags)[1:]
                    + struct.pack(">I", units)
                    + head,
                )
            traf_body += trun
            trafs += _box("traf", traf_body)
        moof = _box(
            "moof", _full("mfhd", 0, struct.pack(">I", seq)) + trafs
        )
        out += moof + _box("mdat", b"\x00" * 16)
    return out
