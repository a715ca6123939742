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


def test_fragmented_raises_by_name():
    p = encode_mp4_meta("dash", 1000, 0, [], mdat_to_eof=False)
    p += struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError, match="moof"):
        parse_mp4_meta(p)


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
