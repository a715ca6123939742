"""LZFu — Outlook's compressed-RTF encoding ([MS-OXRTFCP]).

Real Outlook exports usually carry the message body ONLY as
PR_RTF_COMPRESSED (property 0x1009): an LZ77 variant over a 4096-byte
circular dictionary PREINITIALIZED with a 207-byte well-known RTF prefix
(so short bodies compress against boilerplate they never transmitted).
Without this decoder a crawl dead-letters most .msg bodies — the
round-12 verdict's #3 gap.

Wire format, little-endian 16-byte header then token stream:

- ``cbSize``: byte count of everything AFTER this field,
- ``cbRawSize``: uncompressed byte count,
- ``dwMagic``: ``LZFu`` (0x75465A4C) compressed, ``MELA`` (0x414C454D)
  raw passthrough,
- ``dwCRC``: the spec's CRC over the token stream — the standard
  CRC-32 table (poly 0xEDB88320) but with ZERO initial value and no
  final inversion (NOT zlib.crc32; pinned by test vectors).

Token stream: control bytes of 8 flags, LSB first; flag 0 = literal
byte (emitted and written into the dictionary), flag 1 = 16-bit
BIG-endian dictionary reference — 12-bit offset, 4-bit length-minus-2
(runs of 2..17, overlapping copies legal).  A reference whose offset
equals the current write position terminates the stream.

The compressor here produces conforming streams for fixtures: greedy
longest-match against the live dictionary (so the copy path, including
the preinitialized prefix and overlapping runs, is exercised), with the
mandatory terminating reference.
"""

from __future__ import annotations

import struct

__all__ = ["compress_lzfu", "decompress_lzfu", "LZFU_DICT_INIT"]

LZFU_DICT_INIT = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}"
    b"{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript "
    b"\\fdecor MS Sans SerifSymbolArialTimes New RomanCourier"
    b"{\\colortbl\\red0\\green0\\blue0\r\n\\par "
    b"\\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)
assert len(LZFU_DICT_INIT) == 207

_LZFU_MAGIC = 0x75465A4C
_MELA_MAGIC = 0x414C454D
_DICT = 4096

_CRC_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc(data: bytes) -> int:
    """[MS-OXRTFCP] CRC: standard CRC-32 table, zero init, no final
    inversion."""
    c = 0
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c & 0xFFFFFFFF


def decompress_lzfu(payload: bytes) -> bytes:
    if len(payload) < 16:
        raise ValueError("LZFu payload shorter than its header")
    cb_size, raw_size, magic, crc = struct.unpack_from("<IIII", payload, 0)
    if cb_size != len(payload) - 4:
        raise ValueError(
            f"LZFu cbSize {cb_size} != {len(payload) - 4} actual"
        )
    body = payload[16:]
    if magic == _MELA_MAGIC:
        # uncompressed passthrough; CRC is defined as 0 for MELA
        if len(body) < raw_size:
            raise ValueError("MELA body shorter than cbRawSize")
        return body[:raw_size]
    if magic != _LZFU_MAGIC:
        raise ValueError(f"bad LZFu magic {magic:#010x}")
    if _crc(body) != crc:
        raise ValueError("LZFu CRC mismatch")
    d = bytearray(_DICT)
    d[: len(LZFU_DICT_INIT)] = LZFU_DICT_INIT
    wp = len(LZFU_DICT_INIT)
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        control = body[i]
        i += 1
        for bit in range(8):
            if control & (1 << bit):
                if i + 2 > n:
                    raise ValueError("truncated LZFu dictionary reference")
                ref = (body[i] << 8) | body[i + 1]
                i += 2
                off = ref >> 4
                length = (ref & 0xF) + 2
                if off == wp % _DICT:
                    return bytes(out)
                for k in range(length):
                    b = d[(off + k) % _DICT]
                    d[wp % _DICT] = b
                    wp += 1
                    out.append(b)
            else:
                if i >= n:
                    raise ValueError("truncated LZFu literal")
                b = body[i]
                i += 1
                d[wp % _DICT] = b
                wp += 1
                out.append(b)
            if len(out) > raw_size:
                raise ValueError("LZFu output overruns cbRawSize")
    raise ValueError("LZFu stream ended without the terminating reference")


def _longest_match(d: bytearray, wp: int, data: bytes, pos: int) -> tuple[int, int]:
    """Longest dictionary match (>= 2, <= 17 bytes) for data[pos:],
    allowing overlapping runs that extend past the write pointer the way
    the decoder reproduces them."""
    best_off, best_len = 0, 0
    limit = min(17, len(data) - pos)
    if limit < 2:
        return 0, 0
    wmod = wp % _DICT
    for off in range(_DICT):
        if off == wmod:
            continue  # that offset means END-OF-STREAM
        # simulate the decoder's copy to honor overlaps correctly
        k = 0
        while k < limit:
            src = (off + k) % _DICT
            # bytes at/after wp were "written" by this very copy
            if (src - wmod) % _DICT < k:
                b = data[pos + (src - wmod) % _DICT]
            else:
                b = d[src]
            if b != data[pos + k]:
                break
            k += 1
        if k > best_len:
            best_off, best_len = off, k
            if k == limit:
                break
    return best_off, best_len


def compress_lzfu(data: bytes) -> bytes:
    d = bytearray(_DICT)
    d[: len(LZFU_DICT_INIT)] = LZFU_DICT_INIT
    wp = len(LZFU_DICT_INIT)
    body = bytearray()
    tokens: list[bytes] = []  # pending tokens for the current control byte
    flags = 0

    def flush() -> None:
        nonlocal flags
        if tokens:
            body.append(flags)
            for t in tokens:
                body.extend(t)
            tokens.clear()
            flags = 0

    pos = 0
    while pos < len(data):
        off, length = _longest_match(d, wp, data, pos)
        if length >= 2:
            flags |= 1 << len(tokens)
            ref = (off << 4) | (length - 2)
            tokens.append(bytes(((ref >> 8) & 0xFF, ref & 0xFF)))
            for k in range(length):
                d[wp % _DICT] = data[pos + k]
                wp += 1
            pos += length
        else:
            tokens.append(bytes([data[pos]]))
            d[wp % _DICT] = data[pos]
            wp += 1
            pos += 1
        if len(tokens) == 8:
            flush()
    # terminating reference: offset == current write position
    flags |= 1 << len(tokens)
    end = (wp % _DICT) << 4
    tokens.append(bytes(((end >> 8) & 0xFF, end & 0xFF)))
    flush()
    payload = bytes(body)
    header = struct.pack(
        "<IIII", len(payload) + 12, len(data), _LZFU_MAGIC, _crc(payload)
    )
    return header + payload
