"""Legacy Word ``.doc`` RC4 encryption ([MS-DOC] §2.2.6.2-3) — the
FibBase.fEncrypted path, sharing the [MS-OFFCRYPTO] RC4 key machinery
with operators/xlscrypt.py.

Layout differences from the BIFF8 FILEPASS form:

- the encryption header lives at the START of the Table stream (not in
  a record), its size recorded in ``FibBase.lKey``; there is no
  wEncryptionType prefix — the header begins directly with
  EncryptionVersionInfo (1.1 = RC4 standard, 2-4.2 = RC4 CryptoAPI);
- the rekey interval is **512 bytes** (Word), not BIFF8's 1024;
- plaintext spans: the first 0x44 bytes of the WordDocument stream
  (FibBase — readers must parse fEncrypted/lKey before they have a
  key) and the header itself at the head of the Table stream; the
  keystream covers every byte of each stream at ABSOLUTE offsets, so
  the exempt spans skip-but-advance exactly as in the BIFF8 walk.  The
  Data stream (when present) encrypts fully.

XOR obfuscation (``fObfuscation``) raises NotImplementedError BY NAME
for the same reason as in xlscrypt (the §2.3.7.2 tables cannot be
transcribed verifiably here); a wrong password raises
ValueError("doc password incorrect").  Word's well-known default
password is the same ``VelvetSweatshop``.
"""

from __future__ import annotations

import hashlib
import struct

from pasardassist_spark.operators.pdfcrypt import rc4
from pasardassist_spark.operators.xlscrypt import (
    DEFAULT_XLS_PASSWORD as DEFAULT_DOC_PASSWORD,
    _cryptoapi_block_key,
    _cryptoapi_h0,
    _Rc4Keystream,
    _standard_block_key,
    _standard_intermediate,
)

__all__ = [
    "DEFAULT_DOC_PASSWORD",
    "WORD_REKEY_BLOCK",
    "make_word_encryption_header",
    "parse_word_encryption_header",
]

WORD_REKEY_BLOCK = 512
FIB_PLAINTEXT = 0x44  # FibBase stays readable pre-key


def make_word_encryption_header(
    password: str, salt: bytes, variant: str = "standard",
    key_bits: int = 128,
) -> tuple[bytes, _Rc4Keystream]:
    """(header bytes for the Table stream head, 512-block keystream)."""
    if len(salt) != 16:
        raise ValueError("doc encryption salt must be 16 bytes")
    if variant == "standard":
        inter = _standard_intermediate(password, salt)
        ks = _Rc4Keystream(
            lambda b: _standard_block_key(inter, b), WORD_REKEY_BLOCK
        )
        verifier = hashlib.md5(salt + b"doc-verifier").digest()
        vhash = hashlib.md5(verifier).digest()
        enc = rc4(_standard_block_key(inter, 0), verifier + vhash)
        header = (
            struct.pack("<HH", 1, 1) + salt + enc[:16] + enc[16:32]
        )
        return header, ks
    if variant == "cryptoapi":
        h0 = _cryptoapi_h0(password, salt)
        ks = _Rc4Keystream(
            lambda b: _cryptoapi_block_key(h0, b, key_bits),
            WORD_REKEY_BLOCK,
        )
        verifier = hashlib.sha1(salt + b"doc-verifier").digest()[:16]
        vhash = hashlib.sha1(verifier).digest()
        enc = rc4(
            _cryptoapi_block_key(h0, 0, key_bits), verifier + vhash
        )
        csp = "Microsoft Base Cryptographic Provider v1.0\x00".encode(
            "utf-16-le"
        )
        inner = struct.pack(
            "<IIIIIIII",
            0x0000000C, 0, 0x00006801, 0x00008004, key_bits, 1, 0, 0,
        ) + csp
        header = (
            struct.pack("<HH", 2, 2)
            + struct.pack("<II", 0x0000000C, len(inner))
            + inner
            + struct.pack("<I", 16)
            + salt
            + enc[:16]
            + struct.pack("<I", 20)
            + enc[16:36]
        )
        return header, ks
    raise ValueError(f"unknown doc encryption variant {variant!r}")


def parse_word_encryption_header(
    header: bytes, password: str
) -> _Rc4Keystream:
    """Authenticate and return the 512-block keystream.  Tries the
    caller's password, then (if empty) Word's VelvetSweatshop default.
    A torn header raises ValueError (the module contract), never
    struct.error."""
    try:
        return _parse_word_header(header, password)
    except struct.error as exc:
        raise ValueError(f"doc: torn encryption header: {exc}") from exc


def _parse_word_header(header: bytes, password: str) -> _Rc4Keystream:
    if len(header) < 4:
        raise ValueError("doc: torn encryption header")
    vmajor, vminor = struct.unpack("<HH", header[:4])
    candidates = [password] if password else ["", DEFAULT_DOC_PASSWORD]
    if vmajor == 1 and vminor == 1:
        salt = header[4:20]
        ever, evhash = header[20:36], header[36:52]
        if len(evhash) != 16:
            raise ValueError("doc: torn RC4 encryption header")
        for pw in candidates:
            inter = _standard_intermediate(pw, salt)
            dec = rc4(_standard_block_key(inter, 0), ever + evhash)
            if hashlib.md5(dec[:16]).digest() == dec[16:32]:
                return _Rc4Keystream(
                    lambda b, i=inter: _standard_block_key(i, b),
                    WORD_REKEY_BLOCK,
                )
        raise ValueError("doc password incorrect")
    if vmajor in (2, 3, 4) and vminor == 2:
        (hsize,) = struct.unpack("<I", header[8:12])
        inner = header[12 : 12 + hsize]
        if len(inner) < 32:
            raise ValueError("doc: torn CryptoAPI encryption header")
        alg_id, _alg_hash, key_bits = struct.unpack("<III", inner[8:20])
        if alg_id != 0x00006801:
            raise NotImplementedError(
                f"doc CryptoAPI AlgID 0x{alg_id:04X} unsupported"
            )
        pos = 12 + hsize
        (salt_size,) = struct.unpack("<I", header[pos : pos + 4])
        if salt_size != 16:
            raise ValueError(f"doc: bad salt size {salt_size}")
        salt = header[pos + 4 : pos + 20]
        ever = header[pos + 20 : pos + 36]
        (vh_size,) = struct.unpack("<I", header[pos + 36 : pos + 40])
        evhash = header[pos + 40 : pos + 40 + vh_size]
        if vh_size != 20 or len(evhash) != 20:
            raise ValueError("doc: bad verifier hash size")
        for pw in candidates:
            h0 = _cryptoapi_h0(pw, salt)
            dec = rc4(
                _cryptoapi_block_key(h0, 0, key_bits), ever + evhash
            )
            if hashlib.sha1(dec[:16]).digest() == dec[16:36]:
                return _Rc4Keystream(
                    lambda b, h=h0: _cryptoapi_block_key(h, b, key_bits),
                    WORD_REKEY_BLOCK,
                )
        raise ValueError("doc password incorrect")
    raise NotImplementedError(
        f"doc encryption version {vmajor}.{vminor} unsupported"
    )
