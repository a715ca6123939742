"""Blowfish (Schneier 1993) + 8-bit CFB — the cipher of the legacy
OpenOffice ODF 1.0/1.1 package-encryption profile ("Blowfish CFB",
ODF 1.2 part 3 §3.4.1 names the mode as 8-bit Cipher Feedback).

The P-array and S-boxes are, by definition, the leading fractional
hexadecimal digits of pi — so instead of transcribing 4 KB of constants
(the unverifiable-table hazard the .xls XOR seam documents), this
module COMPUTES them with integer arithmetic (Machin's formula,
16*atan(1/5) - 4*atan(1/239), ~90 ms once per process, lazily) and the
test suite pins the canonical public test vectors (the Schneier/SSLeay
ECB set) plus byte-parity against the host ``cryptography`` backend
when present.  Encrypt/decrypt fast-gate through ``cryptography``'s
Blowfish-CFB8 and fall back to the pure-Python implementation — the
same host-lib-with-pinned-fallback discipline as pdfcrypt/ooxmlcrypt.

Reference parity: the reference stores/re-serves document payloads
(feeds collection metadata from token URIs); decrypting crawled legacy
.odt members is the engine-side analogue (SURVEY §2 S5 enrichment
fetch family).
"""

from __future__ import annotations

import struct

__all__ = ["blowfish_cfb8_encrypt", "blowfish_cfb8_decrypt", "BlowfishPure"]

_N_HEX = (18 + 4 * 256) * 8  # every P/S entry is 8 hex digits


def _pi_hex_digits(n: int = _N_HEX) -> str:
    """First n fractional hex digits of pi (integer Machin formula)."""
    bits = n * 4 + 64

    def atan_inv(x: int, one: int) -> int:
        total, term, k = 0, one // x, 0
        x2 = x * x
        while term:
            q = term // (2 * k + 1)
            total += q if k % 2 == 0 else -q
            term //= x2
            k += 1
        return total

    one = 1 << bits
    pi = 16 * atan_inv(5, one) - 4 * atan_inv(239, one)
    frac = pi - 3 * one
    return format(frac * (16**n) // one, "x").rjust(n, "0")


_TABLES: tuple[tuple[int, ...], tuple[tuple[int, ...], ...]] | None = None


def _tables():
    """(P[18], S[4][256]) — computed once per process, on first use."""
    global _TABLES
    if _TABLES is None:
        h = _pi_hex_digits()
        words = [int(h[i : i + 8], 16) for i in range(0, len(h), 8)]
        p = tuple(words[:18])
        s = tuple(
            tuple(words[18 + 256 * b : 18 + 256 * (b + 1)]) for b in range(4)
        )
        _TABLES = (p, s)
    return _TABLES


class BlowfishPure:
    """Pure-Python Blowfish block cipher (64-bit block, 32..448-bit
    key) — the fallback engine; keep payloads small (metadata-scale
    members), the fast path is the host ``cryptography`` lib."""

    def __init__(self, key: bytes):
        if not 4 <= len(key) <= 56:
            raise ValueError("Blowfish key must be 4..56 bytes")
        p0, s0 = _tables()
        p = list(p0)
        self.s = [list(box) for box in s0]
        klen = len(key)
        for i in range(18):
            chunk = bytes(key[(4 * i + j) % klen] for j in range(4))
            p[i] ^= struct.unpack(">I", chunk)[0]
        self.p = p
        l = r = 0
        for i in range(0, 18, 2):
            l, r = self._encrypt_words(l, r)
            p[i], p[i + 1] = l, r
        for box in self.s:
            for i in range(0, 256, 2):
                l, r = self._encrypt_words(l, r)
                box[i], box[i + 1] = l, r

    def _f(self, x: int) -> int:
        s = self.s
        return (
            ((s[0][x >> 24] + s[1][(x >> 16) & 0xFF]) & 0xFFFFFFFF)
            ^ s[2][(x >> 8) & 0xFF]
        ) + s[3][x & 0xFF] & 0xFFFFFFFF

    def _encrypt_words(self, l: int, r: int) -> tuple[int, int]:
        p = self.p
        for i in range(16):
            l ^= p[i]
            r ^= self._f(l)
            l, r = r, l
        l, r = r, l
        return l ^ p[17], r ^ p[16]

    def encrypt_block(self, block: bytes) -> bytes:
        l, r = struct.unpack(">II", block)
        l, r = self._encrypt_words(l, r)
        return struct.pack(">II", l, r)


_HOST_STATE: list | None = None  # [Cipher, Blowfish, CFB8] or [] if absent


def _host_cfb8(key: bytes, iv: bytes, data: bytes, *, encrypt: bool):
    """cryptography-lib Blowfish/CFB8 when the backend supports it,
    else None (OpenSSL 3 ships Blowfish-CFB64 only, so today this
    probes once and the pure engine carries the mode; the gate stays
    so a capable backend is picked up automatically)."""
    global _HOST_STATE
    if _HOST_STATE is None:
        try:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                from cryptography.hazmat.decrepit.ciphers.algorithms import (
                    Blowfish,
                )
                from cryptography.hazmat.primitives.ciphers import (
                    Cipher,
                    modes,
                )
                probe = Cipher(Blowfish(b"01234567"), modes.CFB8(bytes(8)))
                probe.encryptor().update(b"x")
            _HOST_STATE = [Cipher, Blowfish, modes.CFB8]
        except Exception:
            _HOST_STATE = []
    if not _HOST_STATE:
        return None
    cipher_cls, alg, mode = _HOST_STATE
    c = cipher_cls(alg(key), mode(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def _pure_cfb8(key: bytes, iv: bytes, data: bytes, *, encrypt: bool) -> bytes:
    if len(iv) != 8:
        raise ValueError("Blowfish CFB-8 needs an 8-byte IV")
    bf = BlowfishPure(key)
    reg = bytearray(iv)
    out = bytearray()
    for b in data:
        s = bf.encrypt_block(bytes(reg))[0]
        c = b ^ s
        out.append(c)
        reg = reg[1:] + bytes([c if encrypt else b])
    return bytes(out)


def blowfish_cfb8_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    got = _host_cfb8(key, iv, plain, encrypt=True)
    return got if got is not None else _pure_cfb8(key, iv, plain, encrypt=True)


def blowfish_cfb8_decrypt(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    got = _host_cfb8(key, iv, cipher, encrypt=False)
    return (
        got if got is not None else _pure_cfb8(key, iv, cipher, encrypt=False)
    )
