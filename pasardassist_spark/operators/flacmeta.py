"""FLAC and Ogg (Vorbis/Opus) container metadata — STREAMINFO,
Vorbis-comment tags, identification headers and granule-based duration,
WITHOUT any audio decode.

Reference parity: the reference records media metadata for fetched
assets before deciding to keep them; FLAC and Ogg are the two
open-container formats crawled audio actually arrives in next to
MP3/MP4 (operators/mp3meta.py / mp4meta.py — this completes the audio
container matrix).  All against the public specs (xiph.org FLAC
format, RFC 3533 Ogg framing, RFC 7845 Opus-in-Ogg):

- FLAC: the ``fLaC`` marker and the metadata-block chain (1-bit
  is-last + 7-bit type + 24-bit big-endian length) — STREAMINFO's
  packed bitfields (20-bit sample rate, 3-bit channels-1, 5-bit
  bits-per-sample-1, 36-bit total samples, stream MD5), the
  little-endian VORBIS_COMMENT block (vendor + KEY=value tags), and
  size-skipping of PADDING/SEEKTABLE/PICTURE/application blocks;
- Ogg: the page walk — ``OggS`` capture, version 0, the lacing-value
  segment table (255-run packet continuation), per-page CRC-32
  (generator 0x04C11DB7, unreflected, init/xorout 0 — VERIFIED on
  read, computed on write), BOS/EOS flags — with the codec identified
  from the first packet (``\\x01vorbis`` ident header: channels +
  sample rate; ``OpusHead``: channels, pre-skip, input rate) and the
  duration taken from the LAST page's granule position (PCM samples at
  the stream rate for Vorbis; 48 kHz ticks minus pre-skip for Opus —
  the RFC 7845 rule).

Torn blocks/pages, a bad Ogg CRC, or a truncated STREAMINFO raise
ValueError by message; the FLAC-to-Ogg mapping (xiph's public spec:
packet 0 = 0x7F 'FLAC' + version + header-count + a verbatim fLaC
STREAMINFO) is READ (r15) so Ogg-wrapped FLAC radio rips index like
their native siblings; non-audio Ogg payloads (Theora) raise
NotImplementedError BY NAME.  Audio frames are never touched — the
walk is O(metadata + page headers).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

__all__ = [
    "FlacMeta",
    "OggMeta",
    "parse_flac_meta",
    "encode_flac_meta",
    "parse_ogg_meta",
    "encode_ogg",
]


class FlacMeta(NamedTuple):
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    duration_ms: int
    vendor: str
    tags: tuple[tuple[str, str], ...]


class OggMeta(NamedTuple):
    codec: str  # 'vorbis' | 'opus' | 'flac' (Ogg-mapped)
    sample_rate: int  # ident-header rate (Opus: input rate)
    channels: int
    pre_skip: int  # opus only, 0 for vorbis
    duration_ms: int  # from last-page granule
    n_pages: int


# ------------------------------------------------------------------ FLAC --


def parse_flac_meta(payload: bytes) -> FlacMeta:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos = 4
    si = None
    vendor = ""
    tags: list[tuple[str, str]] = []
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("torn FLAC metadata block header")
        head = payload[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("torn FLAC metadata block body")
        if btype == 0:  # STREAMINFO
            if length != 34:
                raise ValueError(f"STREAMINFO length {length} != 34")
            bits = int.from_bytes(body[10:18], "big")
            rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            si = (rate, channels, bps, total)
        elif btype == 4:  # VORBIS_COMMENT (little-endian inside)
            try:
                (vlen,) = struct.unpack_from("<I", body, 0)
                vendor = body[4 : 4 + vlen].decode("utf-8")
                (n,) = struct.unpack_from("<I", body, 4 + vlen)
                p = 8 + vlen
                for _ in range(n):
                    (clen,) = struct.unpack_from("<I", body, p)
                    if p + 4 + clen > len(body):
                        raise ValueError("torn FLAC comment entry")
                    kv = body[p + 4 : p + 4 + clen].decode("utf-8")
                    p += 4 + clen
                    k, _, v = kv.partition("=")
                    tags.append((k.upper(), v))
            except struct.error as exc:
                raise ValueError(
                    f"torn FLAC VORBIS_COMMENT block: {exc}"
                ) from exc
        # all other block types skip by declared length
        pos += 4 + length
    if si is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    rate, channels, bps, total = si
    if rate == 0:
        raise ValueError("FLAC sample rate is zero")
    return FlacMeta(
        rate, channels, bps, total, total * 1000 // rate, vendor,
        tuple(tags),
    )


def encode_flac_meta(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    vendor: str = "pasardassist",
    tags: list[tuple[str, str]] = (),
) -> bytes:
    """fLaC marker + STREAMINFO + VORBIS_COMMENT + PADDING skeleton
    (no frames — metadata-walk fixtures)."""
    bits = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    # min/max block size (2+2), min/max frame size (3+3, unknown=0),
    # the 64-bit packed rate/channels/bps/total field, stream MD5
    si = (
        struct.pack(">HH", 4096, 4096)
        + bytes(3)
        + bytes(3)
        + bits.to_bytes(8, "big")
        + bytes(16)
    )
    vc = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    vc += struct.pack("<I", len(tags))
    for k, v in tags:
        kv = f"{k}={v}".encode("utf-8")
        vc += struct.pack("<I", len(kv)) + kv
    pad = bytes(17)

    def block(btype: int, body: bytes, last: bool) -> bytes:
        return bytes([btype | (0x80 if last else 0)]) + len(body).to_bytes(
            3, "big"
        ) + body

    return (
        b"fLaC"
        + block(0, si, last=False)
        + block(4, vc, last=False)
        + block(1, pad, last=True)
    )


# ------------------------------------------------------------------- Ogg --

_OGG_CRC_TABLE = []


def _ogg_crc_table():
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE:
        return _OGG_CRC_TABLE
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    _OGG_CRC_TABLE = table
    return table


def _ogg_crc(data: bytes) -> int:
    table = _ogg_crc_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_page(
    serial: int, seq: int, granule: int, packets: list[bytes],
    header_type: int,
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pkt
    head = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = bytearray(head + body)
    crc = _ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def encode_ogg(
    codec: str,
    sample_rate: int,
    channels: int,
    duration_samples: int,
    pre_skip: int = 312,
) -> bytes:
    """Minimal conforming Ogg stream: BOS page with the identification
    header, one comment page, one EOS data page whose granule encodes
    ``duration_samples`` (at ``sample_rate`` for vorbis; at 48 kHz plus
    pre-skip for opus per RFC 7845)."""
    serial = 0x5041 + channels
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IBIiii", 0, channels, sample_rate, -1, 128000, -1)
            + b"\xb8\x01"
        )
        comment = b"\x03vorbis" + struct.pack("<I", 4) + b"pasa" + struct.pack("<I", 0) + b"\x01"
        granule = duration_samples
    elif codec == "opus":
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0)
        )
        comment = b"OpusTags" + struct.pack("<I", 4) + b"pasa" + struct.pack("<I", 0)
        granule = duration_samples + pre_skip  # 48 kHz ticks
    elif codec == "flac":
        bits = (
            (sample_rate << 44)
            | ((channels - 1) << 41)
            | ((16 - 1) << 36)
            | duration_samples
        )
        streaminfo = (
            struct.pack(">HH", 4096, 4096)
            + (0).to_bytes(3, "big")
            + (0).to_bytes(3, "big")
            + bits.to_bytes(8, "big")
            + bytes(16)  # md5 of unencoded audio (zero for fixtures)
        )
        ident = (
            b"\x7fFLAC\x01\x00"
            + struct.pack(">H", 1)  # one more header packet follows
            + b"fLaC"
            + bytes([0x00])  # STREAMINFO, not last
            + (34).to_bytes(3, "big")
            + streaminfo
        )
        comment = (
            bytes([0x84])  # VORBIS_COMMENT, last
            + (13).to_bytes(3, "big")
            + struct.pack("<I", 4) + b"pasa" + struct.pack("<I", 0) + b"\x00"
        )
        granule = duration_samples
    else:
        raise ValueError(f"unknown ogg codec {codec!r}")
    p0 = _ogg_page(serial, 0, 0, [ident], header_type=0x02)  # BOS
    p1 = _ogg_page(serial, 1, 0, [comment], header_type=0x00)
    # a fake audio packet long enough to exercise 255-run lacing
    audio = bytes(600)
    p2 = _ogg_page(serial, 2, granule, [audio], header_type=0x04)  # EOS
    return p0 + p1 + p2


def parse_ogg_meta(payload: bytes) -> OggMeta:
    pos = 0
    first_packet = None
    last_granule = 0
    n_pages = 0
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg page sync")
        if pos + 27 > len(payload):
            raise ValueError("torn Ogg page header")
        if payload[pos + 4] != 0:
            raise ValueError(f"Ogg version {payload[pos + 4]} unknown")
        granule, _serial, _seq, crc = struct.unpack_from(
            "<qIIi", payload, pos + 6
        )
        nseg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("torn Ogg segment table")
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > len(payload):
            raise ValueError("torn Ogg page body")
        # CRC check: field zeroed during computation
        page = bytearray(payload[pos:page_end])
        struct.pack_into("<I", page, 22, 0)
        if _ogg_crc(bytes(page)) != crc & 0xFFFFFFFF:
            raise ValueError("Ogg page CRC mismatch")
        if first_packet is None:
            first_packet = payload[pos + 27 + nseg : page_end]
        if granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = page_end
    if first_packet is None:
        raise ValueError("empty Ogg stream")
    if first_packet[:7] == b"\x01vorbis":
        channels = first_packet[11]
        (rate,) = struct.unpack_from("<I", first_packet, 12)
        if rate == 0:
            raise ValueError("vorbis sample rate is zero")
        return OggMeta(
            "vorbis", rate, channels, 0,
            last_granule * 1000 // rate, n_pages,
        )
    if first_packet[:8] == b"OpusHead":
        channels = first_packet[9]
        pre_skip, rate = struct.unpack_from("<HI", first_packet, 10)
        dur = max(0, last_granule - pre_skip) * 1000 // 48000
        return OggMeta("opus", rate, channels, pre_skip, dur, n_pages)
    if first_packet[:5] == b"\x7fFLAC":
        # xiph FLAC-to-Ogg mapping: 0x7F 'FLAC' major minor, u16 BE
        # header-packet count, then a byte-verbatim fLaC capture +
        # STREAMINFO block; granule position counts SAMPLES
        if len(first_packet) < 9 + 4 + 4 + 34:
            raise ValueError("torn Ogg-FLAC ident packet")
        major = first_packet[5]
        if major != 1:
            raise NotImplementedError(
                f"Ogg-FLAC mapping version {major} unsupported"
            )
        if first_packet[9:13] != b"fLaC":
            raise ValueError("Ogg-FLAC ident lacks fLaC capture")
        if first_packet[13] & 0x7F != 0:
            raise ValueError("Ogg-FLAC first block is not STREAMINFO")
        if int.from_bytes(first_packet[14:17], "big") != 34:
            raise ValueError("Ogg-FLAC STREAMINFO length != 34")
        body = first_packet[17 : 17 + 34]
        bits = int.from_bytes(body[10:18], "big")
        rate = bits >> 44
        channels = ((bits >> 41) & 0x7) + 1
        if rate == 0:
            raise ValueError("Ogg-FLAC sample rate is zero")
        return OggMeta(
            "flac", rate, channels, 0,
            last_granule * 1000 // rate, n_pages,
        )
    if first_packet[:7] == b"\x80theora":
        raise NotImplementedError("Ogg Theora video unsupported")
    raise NotImplementedError(
        f"unknown Ogg codec ident {first_packet[:8]!r}"
    )
