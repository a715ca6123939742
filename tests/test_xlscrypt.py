"""FILEPASS RC4 (standard + CryptoAPI) — operators/xlscrypt.py."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.xlscrypt import (
    DEFAULT_XLS_PASSWORD,
    decrypt_biff_stream,
    make_filepass,
    parse_filepass,
)
from pasardassist_spark.operators.xlstext import (
    encode_xls,
    extract_xls_cells,
)

STRINGS = ["alpha beta", "café 中文", "third string"]
SCELLS = [(0, 0, 0), (1, 2, 1), (5, 3, 2)]
NCELLS = [(2, 1, 3.5), (3, 0, 42.0)]


def _cells(payload, password=""):
    return extract_xls_cells(payload, password)


@pytest.mark.parametrize("variant", ["standard", "cryptoapi"])
def test_roundtrip_default_password(variant):
    plain = encode_xls("S", SCELLS, STRINGS, NCELLS)
    enc = encode_xls("S", SCELLS, STRINGS, NCELLS, encrypt=variant)
    assert enc != plain
    # empty password auto-tries VelvetSweatshop
    assert _cells(enc) == _cells(plain)
    assert _cells(enc, DEFAULT_XLS_PASSWORD) == _cells(plain)


@pytest.mark.parametrize("variant", ["standard", "cryptoapi"])
def test_explicit_password_and_wrong_password(variant):
    enc = encode_xls(
        "S", SCELLS, STRINGS, NCELLS, encrypt=variant, password="s3cret"
    )
    plain = encode_xls("S", SCELLS, STRINGS, NCELLS)
    assert _cells(enc, "s3cret") == _cells(plain)
    with pytest.raises(ValueError, match="password incorrect"):
        _cells(enc, "wrong")
    with pytest.raises(ValueError, match="password incorrect"):
        _cells(enc)  # neither "" nor VelvetSweatshop


@pytest.mark.parametrize("variant", ["standard", "cryptoapi"])
def test_multi_block_rekey(variant):
    """Payload spans many 1024-byte blocks; records cross boundaries
    mid-payload, so a wrong rekey offset scrambles later cells."""
    strings = [f"padding string number {i} é{i}" for i in range(150)]
    scells = [(i, i % 8, i) for i in range(150)]
    plain = encode_xls("Big", scells, strings)
    enc = encode_xls("Big", scells, strings, encrypt=variant)
    assert _cells(enc) == _cells(plain)
    assert len(_cells(enc)) == 150


def test_exempt_spans_stay_plaintext():
    """Record headers, the BOF payload, the FILEPASS payload and the
    BoundSheet8 lbPlyPos must survive encryption verbatim."""
    from pasardassist_spark.operators.cfb import read_cfb

    plain = encode_xls("S", SCELLS, STRINGS, NCELLS)
    enc = encode_xls("S", SCELLS, STRINGS, NCELLS, encrypt="standard")
    wb_p = dict(read_cfb(plain))["Workbook"]
    wb_e = dict(read_cfb(enc))["Workbook"]
    # globals BOF record (header + payload) identical
    assert wb_e[: 4 + 16] == wb_p[: 4 + 16]
    # FILEPASS record sits right after BOF in the encrypted stream
    opcode, length = struct.unpack("<HH", wb_e[20:24])
    assert opcode == 0x002F
    # BoundSheet8 comes next; its first 4 payload bytes (lbPlyPos) are
    # a plausible in-stream offset (plaintext), and the worksheet BOF
    # at that offset is readable pre-decryption
    bs_at = 24 + length
    bs_op, _bs_len = struct.unpack("<HH", wb_e[bs_at : bs_at + 4])
    assert bs_op == 0x0085
    (lbplypos,) = struct.unpack("<I", wb_e[bs_at + 4 : bs_at + 8])
    assert lbplypos < len(wb_e)
    sheet_bof = struct.unpack("<HH", wb_e[lbplypos : lbplypos + 4])
    assert sheet_bof[0] == 0x0809


def test_xor_obfuscation_raises_by_name():
    payload = struct.pack("<HHH", 0, 0x9876, 0x5432)
    with pytest.raises(NotImplementedError, match="XOR-obfuscated"):
        parse_filepass(payload, "")


def test_unknown_version_raises_by_name():
    payload = struct.pack("<HHH", 1, 9, 9)
    with pytest.raises(NotImplementedError, match="version 9.9"):
        parse_filepass(payload, "")


def test_cryptoapi_foreign_algid_raises_by_name():
    salt = bytes(16)
    fp, _ks = make_filepass("pw", salt, variant="cryptoapi")
    # corrupt AlgID inside the EncryptionHeader (offset 14 + 8)
    bad = bytearray(fp)
    struct.pack_into("<I", bad, 14 + 8, 0x0000660E)  # AES-128
    with pytest.raises(NotImplementedError, match="AlgID"):
        parse_filepass(bytes(bad), "pw")


def test_unencrypted_stream_passes_through():
    from pasardassist_spark.operators.cfb import read_cfb

    plain = encode_xls("S", SCELLS, STRINGS, NCELLS)
    wb = dict(read_cfb(plain))["Workbook"]
    assert decrypt_biff_stream(wb, "anything") == wb


def test_unencrypted_writer_deterministic_and_filepass_free():
    """encrypt=None output is unchanged by the encryption feature: no
    FILEPASS record appears and repeated calls are byte-identical
    (archived doc_xls_extract slices, doc_id%3==0, must not shift)."""
    from pasardassist_spark.operators.cfb import read_cfb

    a = encode_xls("S", SCELLS, STRINGS, NCELLS)
    b = encode_xls("S", SCELLS, STRINGS, NCELLS, encrypt=None)
    assert a == b
    wb = dict(read_cfb(a))["Workbook"]
    pos = 0
    while pos + 4 <= len(wb):
        opcode, length = struct.unpack("<HH", wb[pos : pos + 4])
        assert opcode != 0x002F
        pos += 4 + length
