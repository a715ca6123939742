"""ISO-BMFF metadata walk — operators/mp4meta.py."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.mp4meta import (
    encode_mp4_meta,
    parse_mp4_meta,
)

TRACKS = [
    (1, "vide", "avc1", 640, 360, 30000, 150000),
    (2, "soun", "mp4a", 0, 0, 48000, 264600),
]


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("largesize", [False, True])
def test_roundtrip_all_size_and_time_forms(version, largesize):
    p = encode_mp4_meta(
        "mp42", 1000, 5500, TRACKS,
        version=version, moov_largesize=largesize,
    )
    m = parse_mp4_meta(p)
    assert (m.brand, m.timescale, m.duration_ms) == ("mp42", 1000, 5500)
    assert m.tracks[0] == (1, "vide", "avc1", 640, 360, 5000)
    assert m.tracks[1] == (2, "soun", "mp4a", 0, 0, 5512)


def test_per_track_clock_scaling():
    """Three tracks with three different mdhd timescales — scaling must
    use each track's own clock."""
    p = encode_mp4_meta(
        "isom", 600, 600,
        [
            (1, "vide", "avc1", 64, 48, 30000, 90000),
            (2, "soun", "mp4a", 0, 0, 48000, 96000),
            (3, "text", "tx3g", 0, 0, 1000, 750),
        ],
    )
    m = parse_mp4_meta(p)
    assert [t.duration_ms for t in m.tracks] == [3000, 2000, 750]


def test_mdat_to_eof_size_zero():
    p = encode_mp4_meta("isom", 1000, 100, TRACKS, mdat_to_eof=True)
    assert p[-36:-32] == b"mdat" or b"mdat" in p[-44:]
    assert parse_mp4_meta(p).duration_ms == 100


def test_empty_moof_contributes_nothing():
    """r15: moof segments are walked, not dead-lettered.  An empty moof
    (no trafs) parses cleanly and adds no duration."""
    p = encode_mp4_meta("dash", 1000, 0, [], mdat_to_eof=False)
    p += struct.pack(">I", 8) + b"moof"
    m = parse_mp4_meta(p)
    assert m.duration_ms == 0 and m.tracks == ()


def test_torn_and_missing_contracts():
    p = encode_mp4_meta("mp42", 1000, 100, TRACKS, mdat_to_eof=False)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(p[:-10])
    with pytest.raises(ValueError, match="overruns|torn"):
        parse_mp4_meta(p[: len(p) // 4])
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_meta(b"\x00\x00\x00\x08free")
    bad = bytearray(p)
    # corrupt a box size to < 8 (but not 0/1)
    struct.pack_into(">I", bad, 0, 5)
    with pytest.raises(ValueError, match="bad MP4 box size"):
        parse_mp4_meta(bytes(bad))


def test_unknown_boxes_skipped_by_size():
    """free + uuid boxes are already spliced by the writer; add another
    unknown top-level box between ftyp and moov."""
    p = encode_mp4_meta("mp42", 1000, 777, TRACKS, mdat_to_eof=False)
    # insert after ftyp (size from header)
    (ftyp_size,) = struct.unpack_from(">I", p, 0)
    extra = struct.pack(">I", 8 + 5) + b"wide!"[:4] + b"abcde"
    spliced = p[:ftyp_size] + extra + p[ftyp_size:]
    assert parse_mp4_meta(spliced).duration_ms == 777


def test_lying_box_sizes_raise_not_misparse():
    """A box declaring a size SMALLER than its fixed layout must raise
    ValueError instead of reading bytes belonging to the following box
    or leaking struct.error at EOF (r15 ADVICE fix: _mdhd/_tkhd/stsd
    reads are bounded by the box end, mirroring _mvhd). End-to-end the
    misaligned walk already surfaces clean ValueErrors; the helper-level
    checks are exercised directly."""
    from pasardassist_spark.operators.mp4meta import _mdhd, _tkhd

    p = encode_mp4_meta("mp42", 1000, 100, TRACKS, mdat_to_eof=False)

    def shrink(fourcc: str, newsize: int) -> bytes:
        buf = bytearray(p)
        at = buf.find(fourcc.encode())
        assert at >= 4
        struct.pack_into(">I", buf, at - 4, newsize)
        return bytes(buf)

    for fourcc in ("mdhd", "tkhd", "stsd"):
        for size in (10, 12, 16):
            with pytest.raises(ValueError):
                parse_mp4_meta(shrink(fourcc, size))

    # helper-level: content present in the buffer but box end lies short
    # of the fixed layout -> must raise, never read past end
    v0 = bytes([0, 0, 0, 0]) + bytes(16)
    v1 = bytes([1, 0, 0, 0]) + bytes(28)
    for ver, body, need in ((0, v0, 20), (1, v1, 32)):
        with pytest.raises(ValueError, match="torn mdhd"):
            _mdhd(body, 0, need - 1)
        with pytest.raises(ValueError, match="torn tkhd"):
            _tkhd(body, 0, 8 if ver == 0 else 12)
    # and an empty fullbox at EOF
    with pytest.raises(ValueError, match="torn fullbox"):
        _mdhd(b"", 0, 0)


# ---------------------------------------------------- fragmented (r15) ---


FRAG_TRACKS = [
    (1, "vide", "avc1", 640, 360, 30000, 150000),
    (2, "soun", "mp4a", 0, 0, 48000, 264600),
    (3, "text", "tx3g", 0, 0, 1000, 750),
]


@pytest.mark.parametrize("rich", [False, True])
@pytest.mark.parametrize("mehd", [True, False])
def test_fragmented_duration_recovery(rich, mehd):
    """mvhd/mdhd all carry duration 0; the walk must recover each
    track's duration from its moof sample runs — track 1 via trun
    per-sample durations, track 2 via the tfhd default (beating the
    decoy trex default), track 3 via the trex default — and the movie
    duration from mehd when present, else the max track duration."""
    from pasardassist_spark.operators.mp4meta import encode_fmp4_meta

    p = encode_fmp4_meta(
        "dash", 1000, 5500, FRAG_TRACKS,
        n_fragments=3, mehd=mehd, rich_runs=rich,
    )
    m = parse_mp4_meta(p)
    assert [(t.track_id, t.duration_ms) for t in m.tracks] == [
        (1, 5000), (2, 5512), (3, 750),
    ]
    assert m.duration_ms == (5500 if mehd else 5512)
    assert m.brand == "dash"


def test_fragmented_no_duration_source_raises():
    from pasardassist_spark.operators.mp4meta import encode_fmp4_meta

    p = encode_fmp4_meta(
        "dash", 1000, 100, [FRAG_TRACKS[2]],
        duration_source=["trex"], n_fragments=1,
    )
    # surgically remove the trex box so tfhd/trun/trex are ALL silent
    at = p.find(b"trex")
    torn = p[: at - 4] + p[at - 4 + 32 :]
    # fix the enclosing mvex + moov sizes (each shrinks by 32)
    buf = bytearray(torn)
    for fourcc in (b"mvex", b"moov"):
        bat = buf.find(fourcc)
        (old,) = struct.unpack_from(">I", buf, bat - 4)
        struct.pack_into(">I", buf, bat - 4, old - 32)
    with pytest.raises(ValueError, match="no sample duration source"):
        parse_mp4_meta(bytes(buf))


def test_encrypted_fragments_raise_by_name():
    from pasardassist_spark.operators.mp4meta import _box, _full, encode_fmp4_meta

    # CENC pssh in moov
    p = encode_fmp4_meta("dash", 1000, 100, FRAG_TRACKS[:1], n_fragments=1)
    at = p.find(b"moov")
    (sz,) = struct.unpack_from(">I", p, at - 4)
    pssh = _full("pssh", 0, bytes(16) + struct.pack(">I", 0))
    body = p[at + 4 : at - 4 + sz]
    patched = p[: at - 4] + _box("moov", body + pssh) + p[at - 4 + sz :]
    with pytest.raises(NotImplementedError, match="pssh"):
        parse_mp4_meta(patched)
    # senc sample auxiliary inside a traf
    p2 = encode_fmp4_meta("dash", 1000, 100, FRAG_TRACKS[:1], n_fragments=1)
    at2 = p2.find(b"traf")
    (sz2,) = struct.unpack_from(">I", p2, at2 - 4)
    senc = _full("senc", 0, struct.pack(">I", 0))
    body2 = p2[at2 + 4 : at2 - 4 + sz2]
    inner = _box("traf", body2 + senc)
    patched2 = bytearray(p2[: at2 - 4] + inner + p2[at2 - 4 + sz2 :])
    # fix enclosing moof size
    mat = patched2.find(b"moof")
    (msz,) = struct.unpack_from(">I", patched2, mat - 4)
    struct.pack_into(">I", patched2, mat - 4, msz + len(senc))
    with pytest.raises(NotImplementedError, match="senc"):
        parse_mp4_meta(bytes(patched2))


def test_fragmented_torn_trun_raises():
    from pasardassist_spark.operators.mp4meta import encode_fmp4_meta

    p = encode_fmp4_meta(
        "dash", 1000, 5500, FRAG_TRACKS[:1],
        duration_source=["trun"], n_fragments=1,
    )
    # truncate inside the last trun sample table; re-declare the file's
    # final mdat away so the tear lands in the trun
    at = p.rfind(b"trun")
    with pytest.raises(ValueError):
        parse_mp4_meta(p[: at + 10])


def test_top_level_pssh_raises_by_name():
    """r16 (ADVICE): DASH/CMAF files commonly carry pssh TOP-LEVEL, not
    inside moov — that placement must hit the same named CENC seam."""
    from pasardassist_spark.operators.mp4meta import _full, encode_fmp4_meta

    p = encode_fmp4_meta("dash", 1000, 100, FRAG_TRACKS[:1], n_fragments=1)
    pssh = _full("pssh", 0, bytes(16) + struct.pack(">I", 0))
    # insert after ftyp (before moov) as a top-level box
    (ftyp_sz,) = struct.unpack_from(">I", p, 0)
    patched = p[:ftyp_sz] + pssh + p[ftyp_sz:]
    with pytest.raises(NotImplementedError, match="pssh"):
        parse_mp4_meta(patched)
