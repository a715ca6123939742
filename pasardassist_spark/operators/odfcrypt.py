"""ODF package encryption (ODF 1.2 §3.4 / OpenDocument-v1.2-part3) —
the AES-256-CBC + PBKDF2 profile LibreOffice writes by default.

Reference parity: closes the last raise-by-name seam of the encrypted-
document family (PDF standard+AES-256 handlers, OOXML agile+standard,
xls FILEPASS — operators/pdfcrypt.py / ooxmlcrypt.py / xlscrypt.py);
password-supplied ODT/ODS corpora stop dead-lettering.

The documented algorithm, implemented symmetrically for writer and
reader:

1. start key  = SHA-256(password UTF-8)  (start-key-generation
   ``...xmldsig#sha256``, key-size 32);
2. derived key = PBKDF2-HMAC-SHA1(start key, salt, iteration-count,
   key-size 32)  (key-derivation-name ``PBKDF2``);
3. the member's plaintext is raw-DEFLATED first, then AES-256-CBC
   encrypted under the per-member IV with last-byte-count padding (the
   W3C xmlenc rule — only the final byte is the pad length, so both
   PKCS#7 and ISO-10126 writers decrypt);
4. ``manifest:checksum`` (type ``sha256-1k``) is SHA-256 over the
   first 1024 bytes of the DEFLATED plaintext — the password check runs
   after decrypt but before inflate, so a wrong key fails closed with
   ValueError("ODF password incorrect") instead of feeding garbage to
   the inflater;
5. the encrypted member is STORED in the zip (no second deflate) and
   its ``manifest:size`` records the original plaintext size.

Blowfish-CFB packages — the pre-1.2 OpenOffice 1.x/ODF 1.0/1.1
profile old .odt corpora hit MORE often than the AES profile — are
read too (r15): start key = SHA1(password), PBKDF2-HMAC-SHA1 to a
16-byte key, Blowfish in 8-bit CFB (operators/blowfish.py — no
padding, stream mode), checksum type SHA1/1K over the first 1024
deflated bytes.  Unknown checksum/derivation algorithms still raise
NotImplementedError BY NAME.
"""

from __future__ import annotations

import base64
import hashlib
import zlib

from pasardassist_spark.operators.blowfish import (
    blowfish_cfb8_decrypt,
    blowfish_cfb8_encrypt,
)
from pasardassist_spark.operators.pdfcrypt import _cbc_nopad

__all__ = [
    "ODF_AES256_URI",
    "ODF_BLOWFISH_URI",
    "ODF_SHA256_1K_URI",
    "ODF_SHA1_1K",
    "odf_encrypt_member",
    "odf_encrypt_member_legacy",
    "odf_decrypt_member",
]

ODF_AES256_URI = "http://www.w3.org/2001/04/xmlenc#aes256-cbc"
ODF_BLOWFISH_URI = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0#blowfish"
ODF_SHA256_1K_URI = (
    "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0#sha256-1k"
)
ODF_PBKDF2 = "PBKDF2"
ODF_START_SHA256 = "http://www.w3.org/2000/09/xmldsig#sha256"
# the legacy OpenOffice 1.x profile spells these as bare names in the
# manifest (ODF 1.0/1.1 §17.3 / the values OOo <= 3.x wrote)
ODF_BLOWFISH_NAME = "Blowfish CFB"
ODF_SHA1_1K = "SHA1/1K"
ODF_START_SHA1 = "SHA1"

# LibreOffice's shipping default (and the fixture count): the spec
# admits any count and the reader honors whatever the manifest
# declares; 1024 keeps the per-member PBKDF2 at ~0.4 ms so the
# encrypted rotation doesn't dominate doc_odt_extract's bench anchor
# (100k iterations measured 12 s at sf0.1 — a 20x anchor regression
# for zero coverage gain, round-14 scale table).
_ITERATIONS = 1024


def _derive_key(password: str, salt: bytes, iterations: int) -> bytes:
    start = hashlib.sha256(password.encode("utf-8")).digest()
    return hashlib.pbkdf2_hmac("sha1", start, salt, iterations, 32)


def _derive_key_legacy(password: str, salt: bytes, iterations: int) -> bytes:
    """OpenOffice 1.x profile: SHA1 start key, 16-byte Blowfish key."""
    start = hashlib.sha1(password.encode("utf-8")).digest()
    return hashlib.pbkdf2_hmac("sha1", start, salt, iterations, 16)


def odf_encrypt_member_legacy(
    plain: bytes, password: str, seed: bytes
) -> tuple[bytes, dict]:
    """Blowfish-CFB writer (pre-1.2 OpenOffice packages) for fixtures:
    raw-deflate, SHA1/1K checksum, Blowfish 8-bit CFB — no padding
    (stream mode), so stored length == deflated length."""
    salt = hashlib.sha256(seed + b"|odf-bf-salt").digest()[:16]
    iv = hashlib.sha256(seed + b"|odf-bf-iv").digest()[:8]
    deflated = zlib.compress(plain, 6)[2:-4]  # raw deflate
    checksum = hashlib.sha1(deflated[:1024]).digest()
    key = _derive_key_legacy(password, salt, _ITERATIONS)
    enc = blowfish_cfb8_encrypt(key, iv, deflated)
    attrs = {
        "algorithm": ODF_BLOWFISH_NAME,
        "iv": base64.b64encode(iv).decode(),
        "salt": base64.b64encode(salt).decode(),
        "iterations": str(_ITERATIONS),
        "key_size": "16",
        "checksum_type": ODF_SHA1_1K,
        "checksum": base64.b64encode(checksum).decode(),
        "start_key": ODF_START_SHA1,
        "derivation": ODF_PBKDF2,
        "size": str(len(plain)),
    }
    return enc, attrs


def odf_encrypt_member(
    plain: bytes, password: str, seed: bytes
) -> tuple[bytes, dict]:
    """Encrypt one package member; returns (stored_bytes, manifest
    attrs).  ``seed`` makes salt/IV deterministic for byte-reproducible
    fixtures (uniqueness per member is what CBC needs)."""
    salt = hashlib.sha256(seed + b"|odf-salt").digest()[:16]
    iv = hashlib.sha256(seed + b"|odf-iv").digest()[:16]
    deflated = zlib.compress(plain, 6)[2:-4]  # raw deflate
    checksum = hashlib.sha256(deflated[:1024]).digest()
    key = _derive_key(password, salt, _ITERATIONS)
    padlen = 16 - len(deflated) % 16
    padded = deflated + bytes(padlen - 1) + bytes([padlen])
    enc = _cbc_nopad(key, iv, padded, encrypt=True)
    attrs = {
        "algorithm": ODF_AES256_URI,
        "iv": base64.b64encode(iv).decode(),
        "salt": base64.b64encode(salt).decode(),
        "iterations": str(_ITERATIONS),
        "key_size": "32",
        "checksum_type": ODF_SHA256_1K_URI,
        "checksum": base64.b64encode(checksum).decode(),
        "start_key": ODF_START_SHA256,
        "derivation": ODF_PBKDF2,
        "size": str(len(plain)),
    }
    return enc, attrs


def odf_decrypt_member(stored: bytes, password: str, attrs: dict) -> bytes:
    """Inverse of odf_encrypt_member given the parsed manifest attrs."""
    alg = attrs.get("algorithm", "")
    if "blowfish" in alg.lower():
        return _decrypt_member_legacy(stored, password, attrs)
    if alg != ODF_AES256_URI:
        raise NotImplementedError(
            f"ODF encryption algorithm {alg!r} unsupported"
        )
    if attrs.get("derivation") != ODF_PBKDF2:
        raise NotImplementedError(
            f"ODF key derivation {attrs.get('derivation')!r} unsupported"
        )
    if attrs.get("start_key", ODF_START_SHA256) != ODF_START_SHA256:
        raise NotImplementedError(
            f"ODF start-key generation {attrs.get('start_key')!r} "
            "unsupported"
        )
    if attrs.get("checksum_type") != ODF_SHA256_1K_URI:
        raise NotImplementedError(
            f"ODF checksum type {attrs.get('checksum_type')!r} unsupported"
        )
    salt = base64.b64decode(attrs["salt"])
    iv = base64.b64decode(attrs["iv"])
    iterations = int(attrs.get("iterations", _ITERATIONS))
    key = _derive_key(password, salt, iterations)
    if len(stored) % 16 or not stored:
        raise ValueError("torn ODF encrypted member")
    padded = _cbc_nopad(key, iv, stored, encrypt=False)
    padlen = padded[-1]
    if not 1 <= padlen <= 16:
        raise ValueError("ODF password incorrect")
    deflated = padded[:-padlen]
    checksum = base64.b64decode(attrs["checksum"])
    if hashlib.sha256(deflated[:1024]).digest() != checksum:
        raise ValueError("ODF password incorrect")
    try:
        plain = zlib.decompress(deflated, -15)
    except zlib.error as exc:
        raise ValueError(f"ODF member inflate failed: {exc}") from exc
    size = attrs.get("size")
    if size is not None and int(size) != len(plain):
        raise ValueError("ODF decrypted size mismatch")
    return plain


def _decrypt_member_legacy(stored: bytes, password: str, attrs: dict) -> bytes:
    """Blowfish-CFB reader (OpenOffice 1.x / ODF 1.0/1.1 packages).

    The manifest spells the algorithm as 'Blowfish CFB' (or the ODF
    1.2 #blowfish URN); checksum type SHA1/1K = SHA1 over the first
    1024 bytes of the deflated plaintext; start key SHA1(password);
    PBKDF2-HMAC-SHA1 to 16 bytes; 8-bit CFB is a stream mode, so the
    stored member length equals the deflated length (no pad gate — the
    checksum IS the password check, fail-closed before inflate)."""
    if attrs.get("derivation", ODF_PBKDF2) != ODF_PBKDF2:
        raise NotImplementedError(
            f"ODF key derivation {attrs.get('derivation')!r} unsupported"
        )
    start = attrs.get("start_key", ODF_START_SHA1)
    if start not in (ODF_START_SHA1, "http://www.w3.org/2000/09/xmldsig#sha1"):
        raise NotImplementedError(
            f"ODF start-key generation {start!r} unsupported"
        )
    ck_type = attrs.get("checksum_type", ODF_SHA1_1K)
    if ck_type not in (ODF_SHA1_1K, ODF_SHA256_1K_URI):
        raise NotImplementedError(
            f"ODF checksum type {ck_type!r} unsupported"
        )
    salt = base64.b64decode(attrs["salt"])
    iv = base64.b64decode(attrs["iv"])
    if len(iv) != 8:
        raise ValueError("torn ODF Blowfish IV")
    iterations = int(attrs.get("iterations", _ITERATIONS))
    key = _derive_key_legacy(password, salt, iterations)
    deflated = blowfish_cfb8_decrypt(key, iv, stored)
    checksum = base64.b64decode(attrs["checksum"])
    digest = (
        hashlib.sha1(deflated[:1024]).digest()
        if ck_type == ODF_SHA1_1K
        else hashlib.sha256(deflated[:1024]).digest()
    )
    if digest != checksum:
        raise ValueError("ODF password incorrect")
    try:
        plain = zlib.decompress(deflated, -15)
    except zlib.error as exc:
        raise ValueError(f"ODF member inflate failed: {exc}") from exc
    size = attrs.get("size")
    if size is not None and int(size) != len(plain):
        raise ValueError("ODF decrypted size mismatch")
    return plain
