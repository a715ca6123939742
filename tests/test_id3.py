"""ID3v2 writer/parser contracts (operators/id3.py): version size
disciplines, text encodings, padding, and malformed-tag raises."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators import id3 as ID3

FRAMES = {"TIT2": "Title éü", "TPE1": "Artist", "TRCK": "3/12"}


@pytest.mark.parametrize(
    "version,encoding", [(3, 0x00), (3, 0x01), (4, 0x00), (4, 0x01), (4, 0x03)]
)
def test_roundtrip_versions_and_encodings(version, encoding):
    tag = ID3.encode_id3v2(version=version, encoding=encoding, frames=FRAMES)
    meta = ID3.parse_id3(tag + b"\xff\xfb audio")
    assert meta["version"] == version
    assert meta["TIT2"] == "Title éü"
    assert meta["TPE1"] == "Artist" and meta["TRCK"] == "3/12"


def test_utf8_rejected_on_v23():
    with pytest.raises(ValueError, match="UTF-8.*v2.4"):
        ID3.encode_id3v2(version=3, encoding=0x03, frames=FRAMES)


def test_v24_frame_sizes_are_syncsafe():
    # a 200-byte value forces the size high byte into syncsafe territory
    tag = ID3.encode_id3v2(
        version=4, encoding=0x03, frames={"TIT2": "x" * 200}
    )
    pos = 10
    raw = tag[pos + 4 : pos + 8]
    assert all(b < 0x80 for b in raw)  # syncsafe: MSB clear everywhere
    assert ID3.parse_id3(tag)["TIT2"] == "x" * 200


def test_v23_frame_sizes_are_plain_uint32():
    tag = ID3.encode_id3v2(version=3, encoding=0x00, frames={"TIT2": "hi"})
    (size,) = struct.unpack(">I", tag[14:18])
    assert size == len(b"\x00hi\x00")


def test_no_tag_returns_none():
    assert ID3.parse_id3(b"\xff\xfb\x90\x00 raw mpeg") is None


def test_truncated_frame_raises():
    tag = ID3.encode_id3v2(version=4, encoding=0x03, frames=FRAMES)
    with pytest.raises(ValueError):
        ID3.parse_id3(tag[: len(tag) - 30])


def test_unknown_frames_skipped():
    tag = ID3.encode_id3v2(version=4, encoding=0x03, frames=FRAMES)
    # splice a private frame before the first real one
    body = b"PRIV" + ID3._syncsafe(4) + b"\x00\x00junk"
    patched = (
        tag[:6]
        + ID3._syncsafe(ID3._unsyncsafe(tag[6:10]) + len(body))
        + body
        + tag[10:]
    )
    meta = ID3.parse_id3(patched)
    assert meta["TIT2"] == "Title éü"
