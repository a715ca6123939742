"""Word .doc RC4 encryption — operators/doccrypt.py."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.doccrypt import (
    make_word_encryption_header,
    parse_word_encryption_header,
)
from pasardassist_spark.operators.doctext import encode_doc, extract_doc_text

TEXT = (
    "First paragraph with café 中文.\nSecond\twith tab. "
    + "filler crossing several 512-byte rekey blocks. " * 40
)


@pytest.mark.parametrize("variant", ["standard", "cryptoapi"])
def test_roundtrip_default_and_explicit_password(variant):
    want = extract_doc_text(encode_doc(TEXT))
    enc = encode_doc(TEXT, encrypt=variant)
    assert extract_doc_text(enc) == want  # VelvetSweatshop auto-try
    enc2 = encode_doc(TEXT, encrypt=variant, password="s3cret")
    assert extract_doc_text(enc2, "s3cret") == want
    with pytest.raises(ValueError, match="password incorrect"):
        extract_doc_text(enc2, "wrong")
    with pytest.raises(ValueError, match="password incorrect"):
        extract_doc_text(enc2)


def test_fibbase_stays_plaintext():
    """The first 0x44 bytes of WordDocument must be readable without a
    key: wIdent, flags (fEncrypted), and lKey live there."""
    from pasardassist_spark.operators.cfb import read_cfb

    enc = encode_doc(TEXT, encrypt="standard")
    wd = dict(read_cfb(enc))["WordDocument"]
    wident, _nfib = struct.unpack("<HH", wd[0:4])
    assert wident == 0xA5EC
    (flags,) = struct.unpack("<H", wd[10:12])
    assert flags & 0x0100  # fEncrypted visible pre-decrypt
    (lkey,) = struct.unpack("<I", wd[14:18])
    assert lkey == 52  # standard RC4 header size


def test_xor_obfuscation_raises_by_name():
    from pasardassist_spark.operators.cfb import read_cfb, write_cfb

    enc = encode_doc(TEXT, encrypt="standard")
    streams = dict(read_cfb(enc))
    wd = bytearray(streams["WordDocument"])
    (flags,) = struct.unpack("<H", wd[10:12])
    struct.pack_into("<H", wd, 10, flags | 0x8000)  # fObfuscation
    tampered = write_cfb(
        [("WordDocument", bytes(wd)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(NotImplementedError, match="fObfuscation"):
        extract_doc_text(tampered)


def test_unknown_version_and_algid_raise_by_name():
    with pytest.raises(NotImplementedError, match="version 9.9"):
        parse_word_encryption_header(struct.pack("<HH", 9, 9), "")
    header, _ks = make_word_encryption_header(
        "pw", bytes(16), variant="cryptoapi"
    )
    bad = bytearray(header)
    struct.pack_into("<I", bad, 12 + 8, 0x0000660E)  # AES AlgID
    with pytest.raises(NotImplementedError, match="AlgID"):
        parse_word_encryption_header(bytes(bad), "pw")


def test_bad_lkey_contract():
    from pasardassist_spark.operators.cfb import read_cfb, write_cfb

    enc = encode_doc(TEXT, encrypt="standard")
    streams = dict(read_cfb(enc))
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<I", wd, 14, 0xFFFFFF)  # lKey beyond table
    tampered = write_cfb(
        [("WordDocument", bytes(wd)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(ValueError, match="lKey"):
        extract_doc_text(tampered)


def test_unencrypted_writer_unchanged():
    a = encode_doc(TEXT)
    b = encode_doc(TEXT, encrypt=None)
    assert a == b
