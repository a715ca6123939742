"""OOXML agile encryption ([MS-OFFCRYPTO] §2.3.4 —
operators/ooxmlcrypt.py): roundtrips across the cipher/hash matrix,
password and HMAC gates, named raises, and extractor integration."""

import struct

import pytest

from pasardassist_spark.operators.cfb import read_cfb, write_cfb
from pasardassist_spark.operators.docxtext import (
    encode_docx,
    extract_docx_paragraphs,
)
from pasardassist_spark.operators.ooxmlcrypt import (
    decrypt_ooxml_agile,
    encrypt_ooxml_agile,
    sniff_encrypted_ooxml,
)
from pasardassist_spark.operators.pptxtext import (
    encode_pptx,
    extract_pptx_slides,
)
from pasardassist_spark.operators.xlsxtext import (
    encode_xlsx,
    extract_xlsx_cells,
)

PARAS = ["alpha beta gamma", "second paragraph with more words"]


@pytest.mark.parametrize("key_bits", [128, 192, 256])
@pytest.mark.parametrize("ha", ["SHA512", "SHA384", "SHA256", "SHA1"])
def test_roundtrip_matrix(key_bits, ha):
    pkg = encode_docx(PARAS)
    enc = encrypt_ooxml_agile(
        pkg, "s3cret", key_bits=key_bits, hash_algorithm=ha, spin_count=64
    )
    assert sniff_encrypted_ooxml(enc)
    assert not sniff_encrypted_ooxml(pkg)
    assert decrypt_ooxml_agile(enc, "s3cret") == pkg
    # deterministic fixtures (registry oracles hash them)
    assert enc == encrypt_ooxml_agile(
        pkg, "s3cret", key_bits=key_bits, hash_algorithm=ha, spin_count=64
    )


def test_multi_segment_package():
    """A package beyond 4096 bytes exercises per-segment IV derivation."""
    import hashlib

    paras = [hashlib.sha256(str(i).encode()).hexdigest() * 8
             for i in range(60)]
    pkg = encode_docx(paras)
    assert len(pkg) > 2 * 4096
    assert decrypt_ooxml_agile(encrypt_ooxml_agile(pkg, "p"), "p") == pkg


def test_wrong_password_raises():
    enc = encrypt_ooxml_agile(encode_docx(PARAS), "right")
    with pytest.raises(ValueError, match="password incorrect"):
        decrypt_ooxml_agile(enc, "wrong")


def test_hmac_integrity_gate():
    enc = encrypt_ooxml_agile(encode_docx(PARAS), "p")
    streams = dict(read_cfb(enc))
    body = bytearray(streams["EncryptedPackage"])
    body[20] ^= 1
    tampered = write_cfb(
        [("EncryptionInfo", streams["EncryptionInfo"]),
         ("EncryptedPackage", bytes(body))]
    )
    with pytest.raises(ValueError, match="HMAC mismatch"):
        decrypt_ooxml_agile(tampered, "p")


def test_agile_decryptor_rejects_standard_header_by_name():
    """decrypt_ooxml_agile is version-strict; the router handles 3.2."""
    enc = encrypt_ooxml_agile(encode_docx(PARAS), "p")
    legacy = enc.replace(
        struct.pack("<HHI", 4, 4, 0x40), struct.pack("<HHI", 3, 2, 0x24), 1
    )
    with pytest.raises(NotImplementedError, match="3.2"):
        decrypt_ooxml_agile(legacy, "p")


def test_foreign_cipher_raises_by_name():
    enc = encrypt_ooxml_agile(encode_docx(PARAS), "p")
    rc = enc.replace(b'cipherAlgorithm="AES"', b'cipherAlgorithm="RC4"')
    with pytest.raises(NotImplementedError, match="RC4"):
        decrypt_ooxml_agile(rc, "p")
    cfbm = enc.replace(b"ChainingModeCBC", b"ChainingModeCFB")
    with pytest.raises(NotImplementedError, match="ChainingModeCFB"):
        decrypt_ooxml_agile(cfbm, "p")


def test_extractor_integration_all_three_formats():
    cells = ["a1", "b1", "c2"]
    slides = ["slide one", "slide two"]
    assert extract_docx_paragraphs(
        encrypt_ooxml_agile(encode_docx(PARAS), "pw"), password="pw"
    ) == PARAS
    assert extract_xlsx_cells(
        encrypt_ooxml_agile(encode_xlsx(cells), "pw"), password="pw"
    ) == cells
    assert extract_pptx_slides(
        encrypt_ooxml_agile(encode_pptx(slides), "pw"), password="pw"
    ) == slides


def test_missing_password_raises_by_name():
    enc = encrypt_ooxml_agile(encode_docx(PARAS), "pw")
    with pytest.raises(NotImplementedError, match="requires a password"):
        extract_docx_paragraphs(enc)
    with pytest.raises(NotImplementedError, match="requires a password"):
        extract_xlsx_cells(enc)
    with pytest.raises(NotImplementedError, match="requires a password"):
        extract_pptx_slides(enc)


def test_plain_ole2_still_routes_to_legacy_seam():
    """A CFB container WITHOUT the encryption stream pair (e.g. a real
    .doc) must keep its legacy raise, not be mistaken for encryption."""
    doc = write_cfb([("WordDocument", b"\x00" * 64)])
    with pytest.raises(NotImplementedError, match="legacy binary"):
        extract_docx_paragraphs(doc)


# ----------------------------------------------- standard (ECMA) family ---


@pytest.mark.parametrize("key_bits", [128, 192, 256])
def test_standard_roundtrip(key_bits):
    from pasardassist_spark.operators.ooxmlcrypt import (
        decrypt_ooxml,
        decrypt_ooxml_standard,
        encrypt_ooxml_standard,
    )

    pkg = encode_docx(PARAS)
    enc = encrypt_ooxml_standard(pkg, "pw", key_bits=key_bits)
    assert sniff_encrypted_ooxml(enc)
    assert decrypt_ooxml_standard(enc, "pw") == pkg
    assert decrypt_ooxml(enc, "pw") == pkg  # version router
    assert enc == encrypt_ooxml_standard(pkg, "pw", key_bits=key_bits)
    with pytest.raises(ValueError, match="password incorrect"):
        decrypt_ooxml(enc, "nope")


def test_standard_rc4_cryptoapi_raises_by_name():
    from pasardassist_spark.operators.ooxmlcrypt import (
        decrypt_ooxml,
        encrypt_ooxml_standard,
    )

    enc = encrypt_ooxml_standard(encode_docx(PARAS), "pw")
    # clear the fAES flag (0x20) in the version header's flags dword
    no_aes = enc.replace(
        struct.pack("<HHI", 4, 2, 0x24), struct.pack("<HHI", 4, 2, 0x04), 1
    )
    with pytest.raises(NotImplementedError, match="RC4"):
        decrypt_ooxml(no_aes, "pw")


def test_extensible_raises_by_name():
    from pasardassist_spark.operators.ooxmlcrypt import (
        decrypt_ooxml,
        encrypt_ooxml_standard,
    )

    enc = encrypt_ooxml_standard(encode_docx(PARAS), "pw")
    ext = enc.replace(
        struct.pack("<HHI", 4, 2, 0x24), struct.pack("<HHI", 4, 3, 0x24), 1
    )
    with pytest.raises(NotImplementedError, match="extensible"):
        decrypt_ooxml(ext, "pw")


def test_standard_extractor_integration():
    from pasardassist_spark.operators.ooxmlcrypt import encrypt_ooxml_standard

    enc = encrypt_ooxml_standard(encode_docx(PARAS), "pw")
    assert extract_docx_paragraphs(enc, password="pw") == PARAS
