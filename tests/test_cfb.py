"""CFB / OLE2 compound-file container: round-trips across the FAT /
mini-stream cutoff, structural hand-checks against the [MS-CFB] layout,
directory-tree ordering, and error contracts."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from pasardassist_spark.operators.cfb import (
    ENDOFCHAIN,
    FATSECT,
    MAGIC,
    read_cfb,
    sniff_cfb,
    write_cfb,
)


def test_roundtrip_matrix():
    cases = [
        [("small.txt", b"tiny")],
        [("big", b"X" * 5000)],
        [("a", b"alpha"), ("b", b"beta" * 400), ("sub/inner", b"nested"),
         ("sub/deep/leaf", b"Y" * 6000), ("empty", b"")],
        [(f"s{i:02d}", bytes([i]) * (i * 37 % 300 + 1)) for i in range(20)],
        # the mini-stream cutoff boundary: 4095 stays mini, 4096 goes FAT
        [("exactly4095", b"m" * 4095), ("exactly4096", b"M" * 4096)],
    ]
    for streams in cases:
        p = write_cfb(streams)
        assert sniff_cfb(p)
        assert dict(read_cfb(p)) == dict(streams)


def test_header_structure_hand_check():
    p = write_cfb([("s", b"data"), ("big", b"z" * 9000)])
    assert p[:8] == MAGIC
    minor, major, bom, sshift, mshift = struct.unpack("<HHHHH", p[24:34])
    assert (minor, major, bom, sshift, mshift) == (0x3E, 3, 0xFFFE, 9, 6)
    (cutoff,) = struct.unpack("<I", p[56:60])
    assert cutoff == 4096
    # every FAT sector marks ITSELF as FATSECT in the FAT
    (nfat,) = struct.unpack("<I", p[44:48])
    difat = struct.unpack("<109I", p[76:512])
    fat = []
    for fs in difat[:nfat]:
        fat.extend(struct.unpack("<128I", p[512 + fs * 512 : 512 + (fs + 1) * 512]))
    for fs in difat[:nfat]:
        assert fat[fs] == FATSECT
    # the root directory entry is named per spec
    assert "Root Entry".encode("utf-16-le") in p


def test_directory_tree_name_ordering():
    """Sibling order is length-first then uppercase — 'b' sorts before
    'AA' ([MS-CFB] §2.6.4); the walk must still find everything."""
    streams = [("AA", b"1"), ("b", b"2"), ("ccc", b"3"), ("D", b"4")]
    assert dict(read_cfb(write_cfb(streams))) == dict(streams)


def test_error_contracts():
    with pytest.raises(ValueError, match="not a CFB"):
        read_cfb(b"PK\x03\x04zipzip")
    with pytest.raises(ValueError, match="truncated"):
        read_cfb(MAGIC + b"\x00" * 40)
    good = bytearray(write_cfb([("s", b"x" * 5000)]))
    # corrupt the byte-order mark
    bad = bytearray(good)
    bad[28:30] = b"\x00\x00"
    with pytest.raises(ValueError, match="byte-order"):
        read_cfb(bytes(bad))
    # break the stream's FAT chain into a cycle
    (nfat,) = struct.unpack("<I", good[44:48])
    (fs,) = struct.unpack("<I", good[76:80])
    off = 512 + fs * 512
    good[off : off + 4] = struct.pack("<I", 0)  # sector 0 links to itself
    with pytest.raises(ValueError, match="cycle|broken"):
        read_cfb(bytes(good))
    with pytest.raises(ValueError, match="duplicate"):
        write_cfb([("x", b"1"), ("x", b"2")])
    with pytest.raises(ValueError, match="both stream and storage"):
        write_cfb([("a", b"1"), ("a/b", b"2")])
    with pytest.raises(ValueError, match="name too long"):
        write_cfb([("n" * 40, b"1")])


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                    max_codepoint=0x2FF,
                ),
                min_size=1,
                max_size=20,
            ),
            st.binary(max_size=5000),
        ),
        max_size=8,
        unique_by=lambda t: t[0].upper(),
    )
)
def test_cfb_roundtrip_property(streams):
    assert dict(read_cfb(write_cfb(streams))) == dict(streams)


def test_unbalanced_sibling_chain_beyond_64(monkeypatch):
    """A conforming but degenerate sibling tree (one right-leaning chain
    of 150 entries in a single storage) must read fine — olefile accepts
    these and some real writers emit them; the old recursive walk raised
    at depth 64 (round-12 ADVICE)."""
    from pasardassist_spark.operators import cfb as cfb_mod

    NOSTREAM = 0xFFFFFFFF

    def degenerate(ids_names):
        items = sorted(ids_names, key=lambda t: cfb_mod._name_key(t[1]))
        links = {}
        for i, (id_, _name) in enumerate(items):
            nxt = items[i + 1][0] if i + 1 < len(items) else NOSTREAM
            links[id_] = (NOSTREAM, nxt)
        return items[0][0], links

    monkeypatch.setattr(cfb_mod, "_build_tree", degenerate)
    streams = [(f"s{i:03d}", f"payload {i}".encode()) for i in range(150)]
    payload = cfb_mod.write_cfb(streams)
    monkeypatch.undo()
    got = cfb_mod.read_cfb(payload)
    assert sorted(got) == sorted(streams)
    assert cfb_mod.cfb_directory(payload) == [p for p, _b in got]


def test_sibling_cycle_raises(monkeypatch):
    """A sibling chain that loops back must raise, not hang."""
    from pasardassist_spark.operators import cfb as cfb_mod

    NOSTREAM = 0xFFFFFFFF

    def cyclic(ids_names):
        items = sorted(ids_names, key=lambda t: cfb_mod._name_key(t[1]))
        links = {}
        for i, (id_, _name) in enumerate(items):
            nxt = items[(i + 1) % len(items)][0]  # last loops to first
            links[id_] = (NOSTREAM, nxt)
        return items[0][0], links

    monkeypatch.setattr(cfb_mod, "_build_tree", cyclic)
    payload = cfb_mod.write_cfb([(f"s{i}", b"x") for i in range(5)])
    monkeypatch.undo()
    with pytest.raises(ValueError, match="cycle"):
        cfb_mod.read_cfb(payload)
    with pytest.raises(ValueError, match="cycle"):
        cfb_mod.cfb_directory(payload)


def test_cfb_directory_matches_read_paths():
    from pasardassist_spark.operators.cfb import cfb_directory, read_cfb, write_cfb

    streams = [
        ("top", b"A" * 5000),
        ("stor/a", b"mini"),
        ("stor/deeper/b", b""),
    ]
    payload = write_cfb(streams)
    assert cfb_directory(payload) == [p for p, _b in read_cfb(payload)]
