"""Blowfish + 8-bit CFB (operators/blowfish.py) and the legacy ODF
Blowfish-CFB package profile (operators/odfcrypt.py, r15).

The P/S tables are COMPUTED from pi's hex digits (never transcribed),
so the canonical public ECB vectors are the ground truth that pins the
whole construction — a single wrong digit anywhere breaks all of them.
"""

from __future__ import annotations

import pytest

from pasardassist_spark.operators.blowfish import (
    BlowfishPure,
    _host_cfb8,
    _pi_hex_digits,
    _pure_cfb8,
    blowfish_cfb8_decrypt,
    blowfish_cfb8_encrypt,
)

# Schneier's published variable-key test vectors (identical set ships
# in SSLeay/OpenSSL bftest.c — public domain reference data)
_ECB_VECTORS = [
    ("0000000000000000", "0000000000000000", "4EF997456198DD78"),
    ("FFFFFFFFFFFFFFFF", "FFFFFFFFFFFFFFFF", "51866FD5B85ECB8A"),
    ("3000000000000000", "1000000000000001", "7D856F9A613063F2"),
    ("1111111111111111", "1111111111111111", "2466DD878B963C9D"),
    ("0123456789ABCDEF", "1111111111111111", "61F9C3802281B096"),
]


def test_pi_digits_match_known_p_array_head():
    # the first two Blowfish P-array words are 0x243F6A88 0x85A308D3
    assert _pi_hex_digits(16).upper() == "243F6A8885A308D3"


@pytest.mark.parametrize("key,plain,cipher", _ECB_VECTORS)
def test_public_ecb_vectors(key, plain, cipher):
    got = BlowfishPure(bytes.fromhex(key)).encrypt_block(
        bytes.fromhex(plain)
    )
    assert got.hex().upper() == cipher


def test_cfb8_roundtrip_and_chaining():
    key, iv = b"0123456789abcdef", b"ABCDEFGH"
    data = bytes(range(256)) * 3 + b"\xff\x00tail"
    ct = blowfish_cfb8_encrypt(key, iv, data)
    assert ct != data
    assert blowfish_cfb8_decrypt(key, iv, ct) == data
    # 8-bit feedback: flipping one ciphertext byte corrupts that byte
    # plus at most the next 8 (the shift-register span), then recovers
    bad = bytearray(ct)
    bad[40] ^= 0x55
    out = blowfish_cfb8_decrypt(key, iv, bytes(bad))
    assert out[:40] == data[:40]
    assert out[49:] == data[49:]
    assert out != data


def test_host_backend_parity_if_available():
    key, iv = b"sixteen-byte-key", b"8byte-iv"
    data = b"parity check payload" * 5
    host = _host_cfb8(key, iv, data, encrypt=True)
    if host is None:
        pytest.skip("host cryptography backend lacks Blowfish-CFB8")
    assert host == _pure_cfb8(key, iv, data, encrypt=True)


def test_key_length_gate():
    with pytest.raises(ValueError, match="4..56"):
        BlowfishPure(b"abc")
    with pytest.raises(ValueError, match="4..56"):
        BlowfishPure(b"x" * 57)


def test_legacy_odf_member_roundtrip_and_gates():
    from pasardassist_spark.operators.odfcrypt import (
        odf_decrypt_member,
        odf_encrypt_member_legacy,
    )

    data = b"some deflatable legacy content " * 80
    stored, attrs = odf_encrypt_member_legacy(data, "pw", b"seed")
    assert attrs["algorithm"] == "Blowfish CFB"
    assert attrs["checksum_type"] == "SHA1/1K"
    assert odf_decrypt_member(stored, "pw", attrs) == data
    with pytest.raises(ValueError, match="password incorrect"):
        odf_decrypt_member(stored, "wrong", attrs)
    # foreign checksum/derivation still raise by name
    bad = dict(attrs, checksum_type="MD5/1K")
    with pytest.raises(NotImplementedError, match="MD5/1K"):
        odf_decrypt_member(stored, "pw", bad)
    bad2 = dict(attrs, derivation="scrypt")
    with pytest.raises(NotImplementedError, match="scrypt"):
        odf_decrypt_member(stored, "pw", bad2)


def test_legacy_odt_package_end_to_end():
    from pasardassist_spark.operators.odttext import (
        encode_odt,
        extract_odt_paragraphs,
    )

    paras = ["legacy  spaces", "tab\there", "café 中文"]
    enc = encode_odt(paras, password="s3cret", legacy_blowfish=True)
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(enc)) as z:
        manifest = z.read("META-INF/manifest.xml").decode()
    assert "Blowfish CFB" in manifest and "SHA1/1K" in manifest
    assert extract_odt_paragraphs(enc, "s3cret") == paras
    with pytest.raises(ValueError, match="password incorrect"):
        extract_odt_paragraphs(enc, "nope")
