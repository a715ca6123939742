"""EBML / Matroska / WebM metadata walk — operators/ebmlmeta.py."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.ebmlmeta import (
    encode_mkv_meta,
    parse_mkv_meta,
)

TRACKS = [
    (1, "video", "V_VP9", 1280, 720, 0, 0),
    (2, "audio", "A_OPUS", 0, 0, 48000, 2),
    (3, "subtitle", "S_TEXT/UTF8", 0, 0, 0, 0),
]


@pytest.mark.parametrize("unknown_size", [False, True])
@pytest.mark.parametrize("doctype", ["webm", "matroska"])
def test_roundtrip(doctype, unknown_size):
    p = encode_mkv_meta(
        doctype, 12345, TRACKS, segment_unknown_size=unknown_size
    )
    m = parse_mkv_meta(p)
    assert m.doctype == doctype
    assert m.duration_ms == 12345
    assert m.tracks == tuple(TRACKS)


def test_float32_duration_and_nondefault_timescale():
    m = parse_mkv_meta(
        encode_mkv_meta("webm", 2048, TRACKS[:1], float32_duration=True)
    )
    assert m.duration_ms == 2048
    m = parse_mkv_meta(
        encode_mkv_meta("webm", 7000, TRACKS[:1], timescale_ns=50_000_000)
    )
    assert m.duration_ms == 7000 and m.timescale_ns == 50_000_000


def test_vint_widths():
    """Track numbers and dimensions that force multi-byte uints, and a
    body long enough to force a 2-byte size vint."""
    tracks = [(200, "video", "V_" + "X" * 150, 4096, 2160, 0, 0)]
    m = parse_mkv_meta(encode_mkv_meta("matroska", 999999, tracks))
    assert m.tracks[0].number == 200
    assert m.tracks[0].width == 4096
    assert m.duration_ms == 999999


def test_cluster_skipped_by_size():
    # the writer always appends a Cluster stub; tracks still parse
    m = parse_mkv_meta(encode_mkv_meta("webm", 10, TRACKS))
    assert len(m.tracks) == 3


def test_error_contracts():
    p = encode_mkv_meta("webm", 100, TRACKS)
    with pytest.raises(ValueError, match="overruns|torn"):
        parse_mkv_meta(p[:-10])
    with pytest.raises(NotImplementedError, match="DocType"):
        parse_mkv_meta(encode_mkv_meta("foo", 100, []))
    # unknown-size on a NON-Segment element raises by name: rewrite the
    # Info element's 1-byte size vint (0x80|len) to all-ones 0xFF
    bad = bytearray(encode_mkv_meta("webm", 100, TRACKS[:1]))
    idx = bytes(bad).find(bytes.fromhex("1549A966"))
    assert idx > 0
    assert bad[idx + 4] & 0x80, "Info size is a 1-byte vint in fixtures"
    bad[idx + 4] = 0xFF
    with pytest.raises(NotImplementedError, match="unknown-size"):
        parse_mkv_meta(bytes(bad))


def test_zero_timescale_raises():
    p = encode_mkv_meta("webm", 100, TRACKS[:1])
    # TimestampScale element 0x2AD7B1 followed by size 0x83 + 3 bytes
    idx = p.find(bytes.fromhex("2AD7B1"))
    assert idx > 0
    bad = bytearray(p)
    szlen_first = bad[idx + 3]
    # size byte then payload: zero the payload bytes
    length = 1
    mask = 0x80
    while not szlen_first & mask:
        length += 1
        mask >>= 1
    val_len = szlen_first & (mask - 1)
    for k in range(val_len):
        bad[idx + 3 + length + k] = 0
    with pytest.raises(ValueError, match="TimestampScale"):
        parse_mkv_meta(bytes(bad))
