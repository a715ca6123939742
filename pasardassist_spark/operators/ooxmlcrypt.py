"""OOXML agile encryption ([MS-OFFCRYPTO] §2.3.4) — password-protected
DOCX/XLSX/PPTX, pure stdlib + the pdfcrypt AES.

Reference parity: the reference pipeline dead-letters any payload it
cannot decode; a password-SUPPLIED corpus (enterprise document dumps
ship password lists next to the files) is recoverable with ~150 lines
of public-spec crypto.  An encrypted OOXML file is NOT a zip: it is a
CFB compound file (operators/cfb.py) with two streams —

- ``EncryptionInfo``: a version header (4.4 = agile) + an XML
  descriptor naming cipher/chaining/hash, salts, spin count, the
  password-encrypted verifier pair, and the password-encrypted PACKAGE
  KEY ([MS-OFFCRYPTO] §2.3.4.10);
- ``EncryptedPackage``: 8-byte little-endian plaintext size, then the
  real .docx/.xlsx zip encrypted in 4096-byte segments, each under
  AES-CBC with IV = H(keyData salt + LE32(segment)) (§2.3.4.15).

Password → key (§2.3.4.13): H_0 = H(salt + UTF-16LE(password)),
H_n = H(LE32(n) + H_{n-1}) for spinCount rounds, then one block-key
append per purpose (verifier input / verifier hash / key value), the
digest truncated or zero-padded to keyBits/8.  The three block keys
and the two dataIntegrity block keys are spec constants.  Data
integrity (§2.3.4.14) is HMAC-SHA512 over the whole EncryptedPackage
stream under an encrypted random HMAC key — written AND verified here.

STANDARD encryption (§2.3.4.5-2.3.4.9 — the Office 2007 default, the
binary-EncryptionInfo generation crawls hit most) is implemented too:
fixed 50000-round SHA1 spin, the 0x36/0x5C key expansion, §2.3.4.9
verifier check, and the package as one AES-ECB stream.
``decrypt_ooxml`` routes by version header: 4.4 → agile, x.2+fAES →
standard.

Supported: cipherAlgorithm AES (128/192/256 — pdfcrypt's generic key
schedule), ChainingModeCBC (agile) / ECB (standard), hashAlgorithm
SHA512/SHA384/SHA256/SHA1 (agile) / SHA1 (standard, per spec).
Extensible encryption (x.3), CryptoAPI RC4 (x.2 without fAES), other
ciphers, and ChainingModeCFB raise NotImplementedError BY NAME; a
wrong password raises ValueError("OOXML password incorrect").  The
writers emit deterministic fixtures (salts/keys derived from the
package and password); the agile spinCount is configurable — real
writers use 100000; fixtures use less because 100k pure-Python SHA512
rounds measure the interpreter, not the walk.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as hmac_mod
import struct
import xml.etree.ElementTree as ET

from pasardassist_spark.operators.cfb import read_cfb, write_cfb
from pasardassist_spark.operators.pdfcrypt import (
    _cbc_nopad as _pdf_cbc_nopad,
    _ecb as _pdf_ecb,
)

__all__ = [
    "sniff_encrypted_ooxml",
    "encrypt_ooxml_agile",
    "decrypt_ooxml_agile",
    "encrypt_ooxml_standard",
    "decrypt_ooxml_standard",
    "decrypt_ooxml",
]

_ENC_NS = "http://schemas.microsoft.com/office/2006/encryption"
_PWD_NS = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"

# [MS-OFFCRYPTO] §2.3.4.13 / §2.3.4.14 block-key constants
_BK_VERIFIER_INPUT = bytes.fromhex("fea7d2763b4b9e79")
_BK_VERIFIER_VALUE = bytes.fromhex("d7aa0f6d3061344e")
_BK_KEY_VALUE = bytes.fromhex("146e0be7abacd0d6")
_BK_HMAC_KEY = bytes.fromhex("5fb2ad010cb9e1f6")
_BK_HMAC_VALUE = bytes.fromhex("a0677f02b22c8433")

_SEGMENT = 4096

_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """Raw AES-CBC, NO padding added or removed — OOXML pads with zeros
    and truncates by declared lengths ([MS-OFFCRYPTO], unlike PDF's
    PKCS#7).  Delegates to pdfcrypt's fast-gated no-pad CBC (host
    `cryptography` when importable, the FIPS-197 pure-Python reference
    otherwise — equivalence pinned in tests/test_pdfcrypt.py)."""
    if len(data) % 16:
        raise ValueError("OOXML CBC payload not block-aligned")
    return _pdf_cbc_nopad(key, iv, data, encrypt)


def _pad16(data: bytes) -> bytes:
    return data + b"\x00" * (-len(data) % 16)


def _fit(data: bytes, size: int) -> bytes:
    """Truncate or zero-pad to exactly ``size`` (§2.3.4.13 step 4)."""
    return data[:size] + b"\x00" * (size - len(data))


def _hasher(name: str):
    algo = name.upper().replace("-", "")
    if algo not in ("SHA512", "SHA384", "SHA256", "SHA1"):
        raise NotImplementedError(
            f"OOXML hash algorithm {name!r} unsupported"
        )
    return getattr(hashlib, algo.lower())


def _password_hash(hash_fn, salt: bytes, password: str, spin: int) -> bytes:
    h = hash_fn(salt + password.encode("utf-16-le")).digest()
    for n in range(spin):
        h = hash_fn(struct.pack("<I", n) + h).digest()
    return h


def _derive_key(hash_fn, pw_hash: bytes, block_key: bytes, nbytes: int) -> bytes:
    return _fit(hash_fn(pw_hash + block_key).digest(), nbytes)


def sniff_encrypted_ooxml(payload: bytes) -> bool:
    """True when the payload is a CFB container carrying the
    EncryptionInfo/EncryptedPackage stream pair."""
    if payload[:8] != _OLE2_MAGIC:
        return False
    try:
        names = {p for p, _ in read_cfb(payload)}
    except ValueError:
        return False
    return "EncryptionInfo" in names and "EncryptedPackage" in names


def encrypt_ooxml_agile(
    package: bytes,
    password: str,
    *,
    spin_count: int = 1000,
    key_bits: int = 256,
    hash_algorithm: str = "SHA512",
) -> bytes:
    """Wrap a plaintext OOXML zip ``package`` in an agile-encrypted CFB
    container.  Salts, the package key and the HMAC key are derived
    deterministically from (package, password) so fixtures are
    byte-reproducible; uniqueness per fixture is what CBC needs and the
    derivation provides."""
    hash_fn = _hasher(hash_algorithm)
    hsize = hash_fn(b"").digest_size
    nkey = key_bits // 8
    seed = hashlib.sha512(
        b"ooxml-agile|" + password.encode("utf-8") + b"|" + package
    ).digest()
    kd_salt = seed[:16]
    pw_salt = seed[16:32]
    package_key = hashlib.sha512(seed + b"|pkg").digest()[:nkey]
    verifier_input = seed[32:48]
    hmac_key = hashlib.sha512(seed + b"|hmac").digest()[:hsize]

    pw_hash = _password_hash(hash_fn, pw_salt, password, spin_count)
    iv_pw = _fit(pw_salt, 16)
    enc_ver_input = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_VERIFIER_INPUT, nkey),
        iv_pw, _pad16(verifier_input), encrypt=True,
    )
    enc_ver_value = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_VERIFIER_VALUE, nkey),
        iv_pw, _pad16(hash_fn(verifier_input).digest()), encrypt=True,
    )
    enc_key_value = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_KEY_VALUE, nkey),
        iv_pw, _pad16(package_key), encrypt=True,
    )

    # EncryptedPackage: declared size + 4096-byte CBC segments
    body = bytearray(struct.pack("<Q", len(package)))
    for i in range(0, max(len(package), 1), _SEGMENT):
        seg = _pad16(package[i : i + _SEGMENT])
        iv = _fit(
            hash_fn(kd_salt + struct.pack("<I", i // _SEGMENT)).digest(), 16
        )
        body += _cbc(package_key, iv, seg, encrypt=True)
    encrypted_package = bytes(body)

    # dataIntegrity: HMAC over the FULL EncryptedPackage stream
    iv_hk = _fit(hash_fn(kd_salt + _BK_HMAC_KEY).digest(), 16)
    iv_hv = _fit(hash_fn(kd_salt + _BK_HMAC_VALUE).digest(), 16)
    enc_hmac_key = _cbc(package_key, iv_hk, _pad16(hmac_key), encrypt=True)
    hmac_value = hmac_mod.new(
        hmac_key, encrypted_package, hash_fn
    ).digest()
    enc_hmac_value = _cbc(
        package_key, iv_hv, _pad16(hmac_value), encrypt=True
    )

    b64 = lambda b: base64.b64encode(b).decode("ascii")  # noqa: E731
    common = (
        'blockSize="16" keyBits="{kb}" hashSize="{hs}" '
        'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        'hashAlgorithm="{ha}"'
    ).format(kb=key_bits, hs=hsize, ha=hash_algorithm)
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<encryption xmlns="{_ENC_NS}" xmlns:p="{_PWD_NS}">'
        f'<keyData saltSize="{len(kd_salt)}" {common} '
        f'saltValue="{b64(kd_salt)}"/>'
        '<dataIntegrity '
        f'encryptedHmacKey="{b64(enc_hmac_key)}" '
        f'encryptedHmacValue="{b64(enc_hmac_value)}"/>'
        '<keyEncryptors>'
        f'<keyEncryptor uri="{_PWD_NS}">'
        f'<p:encryptedKey spinCount="{spin_count}" '
        f'saltSize="{len(pw_salt)}" {common} '
        f'saltValue="{b64(pw_salt)}" '
        f'encryptedVerifierHashInput="{b64(enc_ver_input)}" '
        f'encryptedVerifierHashValue="{b64(enc_ver_value)}" '
        f'encryptedKeyValue="{b64(enc_key_value)}"/>'
        '</keyEncryptor></keyEncryptors></encryption>'
    )
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode("utf-8")
    return write_cfb(
        [("EncryptionInfo", info), ("EncryptedPackage", encrypted_package)]
    )


def decrypt_ooxml_agile(payload: bytes, password: str) -> bytes:
    """Recover the plaintext OOXML zip from an agile-encrypted CFB
    container; verifies the password (§2.3.4.13) and the HMAC data
    integrity (§2.3.4.14) before returning."""
    streams = dict(read_cfb(payload))
    info = streams.get("EncryptionInfo")
    enc_pkg = streams.get("EncryptedPackage")
    if info is None or enc_pkg is None:
        raise ValueError("not an encrypted OOXML container")
    major, minor, _flags = struct.unpack_from("<HHI", info, 0)
    if (major, minor) != (4, 4):
        raise NotImplementedError(
            f"OOXML encryption version {major}.{minor} is not agile 4.4 "
            "(decrypt_ooxml routes standard x.2 containers)"
        )
    try:
        root = ET.fromstring(info[8:].decode("utf-8"))
    except ET.ParseError as exc:
        raise ValueError(f"malformed EncryptionInfo XML: {exc}") from exc
    kd = root.find(f"{{{_ENC_NS}}}keyData")
    ek = root.find(
        f"{{{_ENC_NS}}}keyEncryptors/{{{_ENC_NS}}}keyEncryptor/"
        f"{{{_PWD_NS}}}encryptedKey"
    )
    if kd is None or ek is None:
        raise ValueError("EncryptionInfo lacks keyData/encryptedKey")

    def _check_cipher(el) -> None:
        if el.get("cipherAlgorithm") != "AES":
            raise NotImplementedError(
                f"OOXML cipher {el.get('cipherAlgorithm')!r} unsupported"
            )
        if el.get("cipherChaining") != "ChainingModeCBC":
            raise NotImplementedError(
                f"OOXML chaining {el.get('cipherChaining')!r} unsupported"
            )

    _check_cipher(kd)
    _check_cipher(ek)
    hash_fn = _hasher(ek.get("hashAlgorithm", "SHA512"))
    kd_hash_fn = _hasher(kd.get("hashAlgorithm", "SHA512"))
    nkey = int(ek.get("keyBits", "256")) // 8
    spin = int(ek.get("spinCount", "100000"))
    pw_salt = base64.b64decode(ek.get("saltValue", ""))
    kd_salt = base64.b64decode(kd.get("saltValue", ""))
    iv_pw = _fit(pw_salt, 16)

    pw_hash = _password_hash(hash_fn, pw_salt, password, spin)
    ver_input = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_VERIFIER_INPUT, nkey),
        iv_pw,
        base64.b64decode(ek.get("encryptedVerifierHashInput", "")),
        encrypt=False,
    )[: len(pw_salt)]
    ver_value = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_VERIFIER_VALUE, nkey),
        iv_pw,
        base64.b64decode(ek.get("encryptedVerifierHashValue", "")),
        encrypt=False,
    )
    want = hash_fn(ver_input).digest()
    if ver_value[: len(want)] != want:
        raise ValueError("OOXML password incorrect")
    package_key = _cbc(
        _derive_key(hash_fn, pw_hash, _BK_KEY_VALUE, nkey),
        iv_pw,
        base64.b64decode(ek.get("encryptedKeyValue", "")),
        encrypt=False,
    )[: int(kd.get("keyBits", "256")) // 8]

    di = root.find(f"{{{_ENC_NS}}}dataIntegrity")
    if di is not None:
        iv_hk = _fit(kd_hash_fn(kd_salt + _BK_HMAC_KEY).digest(), 16)
        iv_hv = _fit(kd_hash_fn(kd_salt + _BK_HMAC_VALUE).digest(), 16)
        hmac_key = _cbc(
            package_key, iv_hk,
            base64.b64decode(di.get("encryptedHmacKey", "")),
            encrypt=False,
        )[: kd_hash_fn(b"").digest_size]
        hmac_value = _cbc(
            package_key, iv_hv,
            base64.b64decode(di.get("encryptedHmacValue", "")),
            encrypt=False,
        )
        want_mac = hmac_mod.new(hmac_key, enc_pkg, kd_hash_fn).digest()
        if hmac_value[: len(want_mac)] != want_mac:
            raise ValueError("OOXML data-integrity HMAC mismatch")

    (total,) = struct.unpack_from("<Q", enc_pkg, 0)
    out = bytearray()
    pos = 8
    seg = 0
    while pos < len(enc_pkg):
        chunk = enc_pkg[pos : pos + _SEGMENT]
        if len(chunk) % 16:
            raise ValueError("torn EncryptedPackage segment")
        iv = _fit(kd_hash_fn(kd_salt + struct.pack("<I", seg)).digest(), 16)
        out += _cbc(package_key, iv, chunk, encrypt=False)
        pos += _SEGMENT
        seg += 1
    if len(out) < total:
        raise ValueError("EncryptedPackage shorter than declared size")
    return bytes(out[:total])


# ------------------------------------------- standard (ECMA) encryption ---
# [MS-OFFCRYPTO] §2.3.4.5-2.3.4.9: the Office 2007 default.  A BINARY
# EncryptionInfo (not XML): version 3.2/4.2 with the fCryptoAPI|fAES
# flags, an EncryptionHeader naming ALG_ID AES + ALG_ID_HASH SHA1, and
# an EncryptionVerifier.  The key derivation is a FIXED 50000-round
# SHA1 spin followed by the HMAC-style 0x36/0x5C expansion (§2.3.4.7);
# the package encrypts as ONE AES-ECB stream — no segments, no IV
# (§2.3.4.6 via the §2.3.4.9 verifier discipline).

_ALG_AES = {128: 0x660E, 192: 0x660F, 256: 0x6610}
_ALG_AES_INV = {v: k for k, v in _ALG_AES.items()}
_ALG_SHA1 = 0x8004
_STD_SPIN = 50000  # fixed by the spec, not declared in the header


def _ecb(key: bytes, data: bytes, encrypt: bool) -> bytes:
    if len(data) % 16:
        raise ValueError("OOXML ECB payload not block-aligned")
    return _pdf_ecb(key, data, encrypt)


def _standard_key(salt: bytes, password: str, key_bits: int) -> bytes:
    """§2.3.4.7: 50000-round SHA1 spin, block-0 append, then the
    ipad/opad-style 0x36/0x5C expansion to the required key length."""
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for n in range(_STD_SPIN):
        h = hashlib.sha1(struct.pack("<I", n) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    buf1 = bytes(b ^ 0x36 for b in _fit(h, 64))
    buf2 = bytes(b ^ 0x5C for b in _fit(h, 64))
    x3 = hashlib.sha1(buf1).digest() + hashlib.sha1(buf2).digest()
    return x3[: key_bits // 8]


def encrypt_ooxml_standard(
    package: bytes, password: str, *, key_bits: int = 128
) -> bytes:
    """Wrap a plaintext OOXML zip in a standard-encrypted (binary
    EncryptionInfo, AES-ECB) CFB container — the pre-2013 Office
    default on real crawls.  Deterministic like the agile writer."""
    if key_bits not in _ALG_AES:
        raise ValueError(f"standard encryption needs AES key bits, got {key_bits}")
    seed = hashlib.sha512(
        b"ooxml-std|" + password.encode("utf-8") + b"|" + package
    ).digest()
    salt = seed[:16]
    verifier = seed[16:32]
    key = _standard_key(salt, password, key_bits)
    enc_verifier = _ecb(key, verifier, encrypt=True)
    vhash = hashlib.sha1(verifier).digest()
    enc_vhash = _ecb(key, _pad16(vhash), encrypt=True)
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider"
    header = struct.pack(
        "<IIIIIIII",
        0x24,            # flags: fCryptoAPI | fAES
        0,               # sizeExtra
        _ALG_AES[key_bits],
        _ALG_SHA1,
        key_bits,
        0x18,            # providerType: RSA_AES
        0, 0,            # reserved
    ) + csp.encode("utf-16-le") + b"\x00\x00"
    verifier_blob = (
        struct.pack("<I", len(salt)) + salt
        + enc_verifier
        + struct.pack("<I", len(vhash))
        + enc_vhash
    )
    info = (
        struct.pack("<HHI", 4, 2, 0x24)
        + struct.pack("<I", len(header))
        + header
        + verifier_blob
    )
    body = struct.pack("<Q", len(package)) + _ecb(
        key, _pad16(package), encrypt=True
    )
    return write_cfb(
        [("EncryptionInfo", info), ("EncryptedPackage", body)]
    )


def decrypt_ooxml_standard(payload: bytes, password: str) -> bytes:
    """Inverse of encrypt_ooxml_standard; §2.3.4.9 verifier check."""
    streams = dict(read_cfb(payload))
    info = streams.get("EncryptionInfo")
    enc_pkg = streams.get("EncryptedPackage")
    if info is None or enc_pkg is None:
        raise ValueError("not an encrypted OOXML container")
    major, minor, flags = struct.unpack_from("<HHI", info, 0)
    if minor != 2 or major not in (2, 3, 4):
        raise NotImplementedError(
            f"OOXML encryption version {major}.{minor} is not standard"
        )
    if not flags & 0x20:  # fAES
        raise NotImplementedError(
            "OOXML CryptoAPI RC4 encryption unsupported (no fAES flag)"
        )
    (hlen,) = struct.unpack_from("<I", info, 8)
    header = info[12 : 12 + hlen]
    alg_id, alg_hash, key_bits = struct.unpack_from("<III", header, 8)
    if alg_id not in _ALG_AES_INV or _ALG_AES_INV[alg_id] != key_bits:
        raise NotImplementedError(
            f"OOXML standard cipher ALG_ID {alg_id:#x} unsupported"
        )
    if alg_hash != _ALG_SHA1:
        raise NotImplementedError(
            f"OOXML standard hash ALG_ID {alg_hash:#x} unsupported"
        )
    pos = 12 + hlen
    (salt_size,) = struct.unpack_from("<I", info, pos)
    salt = info[pos + 4 : pos + 4 + salt_size]
    pos += 4 + salt_size
    enc_verifier = info[pos : pos + 16]
    pos += 16
    (vhash_size,) = struct.unpack_from("<I", info, pos)
    enc_vhash = info[pos + 4 : pos + 4 + 32]
    key = _standard_key(salt, password, key_bits)
    verifier = _ecb(key, enc_verifier, encrypt=False)
    vhash = _ecb(key, enc_vhash, encrypt=False)[:vhash_size]
    if hashlib.sha1(verifier).digest() != vhash:
        raise ValueError("OOXML password incorrect")
    (total,) = struct.unpack_from("<Q", enc_pkg, 0)
    out = _ecb(key, enc_pkg[8 : 8 + (-(-total // 16)) * 16], encrypt=False)
    if len(out) < total:
        raise ValueError("EncryptedPackage shorter than declared size")
    return out[:total]


def decrypt_ooxml(payload: bytes, password: str) -> bytes:
    """Version router: agile (4.4) or standard (2.2/3.2/4.2 with fAES);
    extensible (x.3) and CryptoAPI-RC4 raise by name."""
    streams = dict(read_cfb(payload))
    info = streams.get("EncryptionInfo")
    if info is None:
        raise ValueError("not an encrypted OOXML container")
    major, minor, _flags = struct.unpack_from("<HHI", info, 0)
    if (major, minor) == (4, 4):
        return decrypt_ooxml_agile(payload, password)
    if minor == 2:
        return decrypt_ooxml_standard(payload, password)
    if minor == 3:
        raise NotImplementedError(
            "OOXML extensible encryption (x.3) unsupported"
        )
    raise NotImplementedError(
        f"OOXML encryption version {major}.{minor} unsupported"
    )
