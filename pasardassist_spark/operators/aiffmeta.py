"""AIFF / AIFF-C audio metadata (Apple's EA-IFF-85 container, the
big-endian sibling of RIFF/WAVE) — channels, sample rate, bit depth,
frame count and the NAME/AUTH/ANNO text chunks WITHOUT touching sample
data.

Reference parity: the same no-decode media-indexing family as
mm_wav_info_tags (operators/audiocodec.py) — pre-2000s Mac corpora and
pro-audio uploads arrive as .aif/.aifc, so the audio container matrix
(MP3/MP4/FLAC/Ogg/WAV) gains its last common member.  All against the
public Apple "Audio Interchange File Format 1.3" / AIFF-C (1991) specs:

- ``FORM`` + size + form type ``AIFF`` or ``AIFC``; chunks are
  (fourcc, u32 BE size, body) WORD-ALIGNED — odd bodies carry a pad
  byte the size excludes, exactly RIFF's rule with the endianness
  flipped;
- ``COMM``: numChannels u16, numSampleFrames u32, sampleSize u16, and
  the sample rate as an 80-BIT IEEE 754 EXTENDED float (sign+15-bit
  exponent biased 16383, 64-bit mantissa with EXPLICIT integer bit) —
  the classic AIFF parser trap this module implements exactly; AIFF-C
  appends a compressionType fourcc + pascal-string name, and only
  ``NONE``/``sowt`` (uncompressed big/little-endian PCM) are accepted
  — psychoacoustic codecs raise NotImplementedError by name;
- text chunks ``NAME``/``AUTH``/``ANNO``/``(c) `` hold plain text;
- ``SSND`` (offset u32 + blockSize u32 + data) is skipped by size.

Torn chunks, a bad FORM type, zero/NaN/infinite sample rates raise
ValueError — a damaged file dead-letters loudly, never reads wrong.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

__all__ = ["AiffMeta", "parse_aiff_meta", "encode_aiff_meta", "sniff_aiff"]


class AiffMeta(NamedTuple):
    form: str  # 'aiff' | 'aifc'
    channels: int
    sample_rate: int  # integer Hz (AIFF rates are integral in practice)
    bits_per_sample: int
    n_frames: int
    duration_ms: int
    name: str | None
    author: str | None


def sniff_aiff(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] in (b"AIFF", b"AIFC")
    )


def _read_extended80(b: bytes) -> float:
    """Decode the 80-bit IEEE 754 extended float COMM carries."""
    if len(b) != 10:
        raise ValueError("torn 80-bit extended float")
    (se,) = struct.unpack(">H", b[:2])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    (mant,) = struct.unpack(">Q", b[2:])
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("AIFF sample rate is NaN/Inf")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended80(value: float) -> bytes:
    if value <= 0:
        raise ValueError("AIFF sample rate must be positive")
    exp = 16383 + 63
    mant = int(value)
    frac = value - mant
    while mant >= 1 << 64:
        mant >>= 1
        exp += 1
    while mant < 1 << 63:
        mant = (mant << 1) | (1 if frac >= 0.5 else 0)
        frac = (frac * 2) % 1.0
        exp -= 1
    return struct.pack(">HQ", exp, mant)


def parse_aiff_meta(payload: bytes) -> AiffMeta:
    if not sniff_aiff(payload):
        raise ValueError("not an AIFF/AIFF-C FORM")
    (form_size,) = struct.unpack_from(">I", payload, 4)
    end = min(8 + form_size, len(payload))
    if 8 + form_size > len(payload):
        raise ValueError("AIFF FORM size exceeds file")
    form = payload[8:12].decode("latin-1").lower()
    pos = 12
    comm = None
    texts: dict[bytes, str] = {}
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"torn AIFF chunk {cid!r}")
        if cid == b"COMM":
            if csize < 18:
                raise ValueError("torn COMM chunk")
            channels, n_frames, bits = struct.unpack_from(">HIH", body, 0)
            rate = _read_extended80(body[8:18])
            if form == "aifc":
                if csize < 22:
                    raise ValueError("torn AIFF-C COMM compression type")
                ctype = body[18:22]
                if ctype not in (b"NONE", b"sowt"):
                    raise NotImplementedError(
                        f"AIFF-C compression {ctype!r} unsupported "
                        "(NONE/sowt PCM only)"
                    )
            comm = (channels, n_frames, bits, rate)
        elif cid in (b"NAME", b"AUTH", b"ANNO", b"(c) "):
            texts[cid] = body.decode("latin-1")
        # SSND and everything else: skip by size
        pos += 8 + csize + (csize & 1)  # word alignment
    if comm is None:
        raise ValueError("AIFF has no COMM chunk")
    channels, n_frames, bits, rate_f = comm
    rate = int(round(rate_f))
    if rate <= 0 or channels < 1:
        raise ValueError("bad AIFF COMM values")
    return AiffMeta(
        form,
        channels,
        rate,
        bits,
        n_frames,
        n_frames * 1000 // rate,
        texts.get(b"NAME"),
        texts.get(b"AUTH"),
    )


def encode_aiff_meta(
    *,
    form: str = "aiff",
    channels: int = 2,
    sample_rate: int = 44100,
    bits: int = 16,
    n_frames: int = 44100,
    name: str | None = None,
    author: str | None = None,
    compression: bytes = b"NONE",
) -> bytes:
    """Minimal conforming AIFF/AIFF-C skeleton for metadata fixtures:
    COMM (with the real 80-bit extended rate), optional NAME/AUTH text
    chunks (odd lengths exercise the pad rule), and a stub SSND whose
    data the walk must skip by size."""
    if form not in ("aiff", "aifc"):
        raise ValueError(f"bad form {form!r}")
    comm = struct.pack(">HIH", channels, n_frames, bits) + _write_extended80(
        float(sample_rate)
    )
    if form == "aifc":
        cname = b"\x0enot compressed"  # pascal string, even total
        comm += compression + cname

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack(">I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    out = bytearray()
    if form == "aifc":
        out += chunk(b"FVER", struct.pack(">I", 0xA2805140))
    out += chunk(b"COMM", comm)
    if name is not None:
        out += chunk(b"NAME", name.encode("latin-1"))
    if author is not None:
        out += chunk(b"AUTH", author.encode("latin-1"))
    out += chunk(b"SSND", struct.pack(">II", 0, 0) + b"\x00" * 24)
    ftype = b"AIFF" if form == "aiff" else b"AIFC"
    return b"FORM" + struct.pack(">I", 4 + len(out)) + ftype + bytes(out)
