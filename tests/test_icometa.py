"""ICO/CUR directory metadata walk — operators/icometa.py (r15)."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.icometa import (
    encode_ico,
    parse_ico_meta,
    sniff_ico,
)


def test_multi_entry_roundtrip_with_256_sentinel():
    p = encode_ico([
        (16, 16, 4, "dib"), (32, 32, 8, "dib"),
        (256, 256, 32, "png"), (48, 48, 24, "dib"),
    ])
    assert sniff_ico(p)
    m = parse_ico_meta(p)
    assert m.kind == "icon" and m.n_entries == 4
    assert [(e.width, e.height, e.bpp, e.fmt) for e in m.entries] == [
        (16, 16, 4, "dib"), (32, 32, 8, "dib"),
        (256, 256, 32, "png"), (48, 48, 24, "dib"),
    ]
    # the 256 entry really is the 0 sentinel in the directory
    assert p[6 + 16 * 2] == 0 and p[6 + 16 * 2 + 1] == 0


def test_cursor_type():
    assert parse_ico_meta(
        encode_ico([(32, 32, 1, "dib")], kind="cursor")
    ).kind == "cursor"


def test_dib_height_is_halved():
    """biHeight counts XOR + AND masks; an odd biHeight is torn."""
    p = bytearray(encode_ico([(16, 16, 8, "dib")]))
    img_off = struct.unpack_from("<I", p, 6 + 12)[0]
    # biHeight currently 32; sanity then break it
    assert struct.unpack_from("<i", p, img_off + 8)[0] == 32
    struct.pack_into("<i", p, img_off + 8, 33)
    with pytest.raises(ValueError, match="not twice"):
        parse_ico_meta(bytes(p))


def test_directory_image_mismatch_raises():
    p = bytearray(encode_ico([(16, 16, 8, "dib")]))
    p[6] = 17  # directory width lies
    with pytest.raises(ValueError, match="directory width 17 != image"):
        parse_ico_meta(bytes(p))


def test_bounds_and_torn():
    p = encode_ico([(16, 16, 8, "dib")])
    with pytest.raises(ValueError, match="out of bounds"):
        parse_ico_meta(p[:-10])
    with pytest.raises(ValueError, match="not an ICO"):
        parse_ico_meta(b"\x01\x00\x01\x00\x01\x00")
    bad = bytearray(p)
    struct.pack_into("<I", bad, 6 + 12, 2)  # offset inside the directory
    with pytest.raises(ValueError, match="out of bounds"):
        parse_ico_meta(bytes(bad))


def test_sniff_rejects_lookalikes():
    assert not sniff_ico(b"BM\x00\x00\x00\x00")
    assert not sniff_ico(struct.pack("<HHH", 0, 3, 1))
    assert not sniff_ico(struct.pack("<HHH", 0, 1, 999))


def test_overlapping_entry_payloads_raise():
    """r16 (ADVICE): two directory entries whose payload byte ranges
    PARTIALLY overlap are corrupt — the docstring's overlap claim is now
    enforced, not just bounds-per-entry. (Exact aliasing — identical
    offset AND size — stays legal, tested below.)"""
    p = bytearray(encode_ico([(16, 16, 8, "dib"), (16, 16, 8, "dib")]))
    # entry 1 at entry 0's offset with a size 8 bytes LARGER: same start,
    # different end -> partial overlap (the shared prefix still parses as
    # the same 16x16 DIB, so the dimension cross-check passes and the
    # overlap guard is what fires)
    (off0,) = struct.unpack_from("<I", p, 6 + 12)
    (size0,) = struct.unpack_from("<I", p, 6 + 8)
    struct.pack_into("<I", p, 6 + 16 + 8, size0 + 8)
    struct.pack_into("<I", p, 6 + 16 + 12, off0)
    with pytest.raises(ValueError, match="overlaps"):
        parse_ico_meta(bytes(p))
    # partial overlap (entry 1 starts mid-way through entry 0) raises too
    p2 = bytearray(encode_ico([(16, 16, 8, "dib"), (16, 16, 8, "dib")]))
    struct.pack_into("<I", p2, 6 + 16 + 12, off0 + 8)
    with pytest.raises(ValueError):
        parse_ico_meta(bytes(p2))


def test_aliased_identical_payloads_are_legal():
    """Two entries pointing at the EXACT same bytes (identical offset and
    size — deduplicating encoders emit these) must parse; only a PARTIAL
    overlap is corrupt (r16 review fix)."""
    p = bytearray(encode_ico([(16, 16, 8, "dib"), (16, 16, 8, "dib")]))
    (off0,) = struct.unpack_from("<I", p, 6 + 12)
    (size0,) = struct.unpack_from("<I", p, 6 + 8)
    struct.pack_into("<I", p, 6 + 16 + 8, size0)
    struct.pack_into("<I", p, 6 + 16 + 12, off0)  # same offset AND size
    m = parse_ico_meta(bytes(p))
    assert m.n_entries == 2
    assert m.entries[0] == m.entries[1]


def test_overlap_guard_is_not_quadratic():
    """cnt is attacker-controlled; the overlap guard must stay O(n log n).
    64 entries is the sniff cap, but parse accepts larger directories —
    time a 4000-entry synthetic directory (all aliasing one payload) and
    require it to finish fast (the per-pair scan took ~0.17 s here and
    grew quadratically)."""
    import time

    one = encode_ico([(16, 16, 8, "dib")])
    (off0,) = struct.unpack_from("<I", one, 6 + 12)
    (size0,) = struct.unpack_from("<I", one, 6 + 8)
    body = one[off0 : off0 + size0]
    n = 4000
    out = bytearray(struct.pack("<HHH", 0, 1, n))
    base = 6 + 16 * n
    for _ in range(n):
        out += struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 8, size0, base)
    out += body
    t0 = time.perf_counter()
    m = parse_ico_meta(bytes(out))
    assert m.n_entries == n
    assert time.perf_counter() - t0 < 2.0
