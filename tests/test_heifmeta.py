"""HEIF/AVIF metadata walk — operators/heifmeta.py (r15)."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.heifmeta import (
    encode_heif_meta,
    parse_heif_meta,
    sniff_heif,
)

ITEMS = [
    (1, "hvc1", 4032, 3024, 90, 10),
    (2, "hvc1", 320, 240, None, 8),
    (3, "Exif", None, None, None, None),
]


@pytest.mark.parametrize("wide", [False, True])
def test_roundtrip_both_layout_widths(wide):
    """16-bit v0/v2 + 7-bit ipma indices vs 32-bit v1/v3 + 15-bit
    indices — identical readout; per-item property resolution keeps
    the thumbnail's ispe off the primary item."""
    p = encode_heif_meta("heic", ITEMS, 1, wide=wide)
    assert sniff_heif(p)
    m = parse_heif_meta(p)
    assert m.brand == "heic" and m.n_items == 3
    got = {i.item_id: i for i in m.items}
    assert (got[1].width, got[1].height, got[1].rotation) == (4032, 3024, 90)
    assert got[1].is_primary and got[1].bit_depth == 10
    assert (got[2].width, got[2].height, got[2].rotation) == (320, 240, None)
    assert not got[2].is_primary
    assert got[3].item_type == "Exif" and got[3].width is None


def test_property_sharing_through_ipma():
    """Two items with the same dimensions must share ONE ispe in ipco
    (the writer dedups like real muxers); readout stays per-item."""
    items = [(1, "av01", 64, 64, None, 8), (2, "av01", 64, 64, None, 8)]
    p = encode_heif_meta("avif", items, 2)
    assert p.count(b"ispe") == 1 and p.count(b"pixi") == 1
    m = parse_heif_meta(p)
    assert all(i.width == 64 and i.bit_depth == 8 for i in m.items)
    assert [i.is_primary for i in sorted(m.items)] == [False, True]


def test_rotation_zero_is_a_value_not_null():
    p = encode_heif_meta("avif", [(1, "av01", 8, 8, 0, 12)], 1)
    item = parse_heif_meta(p).items[0]
    assert item.rotation == 0 and item.bit_depth == 12


def test_protected_item_raises_by_name():
    p = bytearray(encode_heif_meta("heic", ITEMS[:1], 1))
    at = p.find(b"infe")
    # infe v2 body: ver/flags(4) + item_id(2) + protection_index(2)
    struct.pack_into(">H", p, at + 4 + 4 + 2, 7)
    with pytest.raises(NotImplementedError, match="protected"):
        parse_heif_meta(bytes(p))


def test_torn_and_missing_contracts():
    p = encode_heif_meta("heic", ITEMS, 1)
    with pytest.raises(ValueError):
        parse_heif_meta(p[:-5])
    with pytest.raises(ValueError, match="no meta"):
        parse_heif_meta(p[: p.find(b"meta") - 4])
    # iinf count vs infe mismatch
    bad = bytearray(p)
    at = bad.find(b"iinf")
    struct.pack_into(">H", bad, at + 4 + 4, 9)
    with pytest.raises(ValueError, match="declares 9"):
        parse_heif_meta(bytes(bad))
    # out-of-range ipma property index
    bad2 = bytearray(p)
    at2 = bad2.find(b"ipma")
    # first association byte: count(4)+id(2)+cnt(1) after ver/flags(4)
    bad2[at2 + 4 + 4 + 4 + 2 + 1] = 0x80 | 0x55
    with pytest.raises(ValueError, match="out of range"):
        parse_heif_meta(bytes(bad2))


def test_unknown_boxes_skipped():
    p = encode_heif_meta("mif1", ITEMS[:1], 1)
    # splice an unknown box between free and meta
    at = p.find(b"meta") - 4
    spliced = p[:at] + struct.pack(">I", 12) + b"uuidabcd" + p[at:]
    assert parse_heif_meta(spliced).n_items == 1
