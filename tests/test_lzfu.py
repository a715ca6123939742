"""LZFu compressed RTF ([MS-OXRTFCP]) and its .msg body integration."""

from __future__ import annotations

import random
import struct

import pytest

from pasardassist_spark.operators.lzfu import (
    LZFU_DICT_INIT,
    compress_lzfu,
    decompress_lzfu,
)
from pasardassist_spark.operators.msgtext import encode_msg, extract_msg

# the spec's canonical example (§4): compressed "{\rtf1\ansi\ansicpg1252
# \pard hello world}\r\n" — pins the header layout, the CRC convention
# (zero-init, no final inversion), the preinitialized dictionary, and
# the token grammar all at once
_SPEC_VECTOR = bytes.fromhex(
    "2d0000002b0000004c5a4675f1c5c7a7"
    "03000a007263706731323542320af320"
    "68656c090020627705b06c647d0a800f"
    "a0"
)
_SPEC_PLAIN = b"{\\rtf1\\ansi\\ansicpg1252\\pard hello world}\r\n"


def test_spec_canonical_vector_decodes_byte_exact():
    assert decompress_lzfu(_SPEC_VECTOR) == _SPEC_PLAIN


def test_dictionary_init_is_the_spec_207_bytes():
    assert len(LZFU_DICT_INIT) == 207
    assert LZFU_DICT_INIT.startswith(b"{\\rtf1\\ansi\\mac\\deff0")
    assert LZFU_DICT_INIT.endswith(b"\\tab\\tx")


def test_roundtrip_families():
    rng = random.Random(5)
    cases = [
        b"",
        b"x",
        b"{\\rtf1 short}",
        b"\\par " * 1000,  # heavy dictionary reuse
        bytes(rng.randrange(0, 256) for _ in range(10_000)),  # dict wrap
        bytes(rng.choice(b"ab") for _ in range(500)),  # overlapping runs
    ]
    for data in cases:
        assert decompress_lzfu(compress_lzfu(data)) == data


def test_mela_uncompressed_passthrough():
    raw = b"{\\rtf1 uncompressed body}"
    payload = struct.pack(
        "<IIII", len(raw) + 12, len(raw), 0x414C454D, 0
    ) + raw
    assert decompress_lzfu(payload) == raw


def test_corruption_raises():
    good = compress_lzfu(b"{\\rtf1 some body here}")
    # flip a token byte -> CRC mismatch
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decompress_lzfu(bytes(bad))
    # wrong cbSize
    bad2 = bytearray(good)
    bad2[0] ^= 0x01
    with pytest.raises(ValueError, match="cbSize"):
        decompress_lzfu(bytes(bad2))
    # bad magic
    bad3 = bytearray(good)
    bad3[8] = 0x00
    with pytest.raises(ValueError, match="magic"):
        decompress_lzfu(bytes(bad3))
    with pytest.raises(ValueError, match="header"):
        decompress_lzfu(b"\x01\x02")
    # truncated stream (drop the terminating reference)
    with pytest.raises(ValueError):
        decompress_lzfu(
            struct.pack("<IIII", 12, 100, 0x75465A4C, 0)
        )


def test_msg_rtf_compressed_body_roundtrip():
    body = "the quick brown fox packs tokens into sequences"
    p = encode_msg("subj", body, "alice", ["a.bin"], rtf_body=True)
    # the plain 0x1000 stream must NOT exist in this layout
    from pasardassist_spark.operators.cfb import read_cfb

    names = [path for path, _ in read_cfb(p)]
    assert not any("__substg1.0_1000" in n for n in names)
    assert any("__substg1.0_10090102" in n for n in names)
    d = extract_msg(p)
    assert d.body == body
    assert d.subject == "subj"
    assert d.attachments == ["a.bin"]


def test_msg_rtf_body_nonascii():
    body = "ünïcødé bödy — 日本語 text"
    d = extract_msg(encode_msg("s", body, rtf_body=True))
    assert d.body == body


def test_msg_plain_body_wins_over_rtf():
    """When both 0x1000 and 0x1009 exist, the plain body is
    authoritative."""
    from pasardassist_spark.operators.cfb import read_cfb, write_cfb

    p = encode_msg("s", "rtf-only body", rtf_body=True)
    streams = list(read_cfb(p))
    streams.append(
        ("__substg1.0_1000001F", "plain wins".encode("utf-16-le"))
    )
    d = extract_msg(write_cfb(streams))
    assert d.body == "plain wins"
