"""EXIF APP1 metadata: a [CIPA DC-008 / TIFF 6.0] writer + parser pair.

EXIF rides a JPEG APP1 segment as a little TIFF file: ``Exif\\0\\0`` then
a TIFF header (II/MM byte order), IFD0 (camera make/model/orientation +
pointers), an Exif sub-IFD (DateTimeOriginal), and a GPS sub-IFD whose
coordinates are (deg, min, sec) RATIONAL triplets.  A 100 TB image crawl
reads this for capture timestamps, device fingerprinting, and geo
filtering WITHOUT decoding a single pixel — the parser here walks only
JPEG marker headers (skipping entropy data entirely), so extraction cost
is O(header bytes) per image no matter the resolution.

The IFD walk mirrors operators/tiffcodec.py's (12-byte entries, inline
values when <= 4 bytes, offset-indirect otherwise) but keeps RATIONALs
as exact (numerator, denominator) integer pairs — GPS arc-seconds must
not round-trip through floats if the driver hash is to certify them.

Reference parity: the reference pipeline stores fetched NFT image
metadata alongside the asset row (PasarDAssist app.service.ts media
enrichment); this operator family is the crawl-side generalization.
"""

from __future__ import annotations

import struct

# IFD0
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
# Exif sub-IFD
TAG_DT_ORIGINAL = 0x9003
# GPS sub-IFD
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ------------------------------------------------------------------ writer

class _IfdBuilder:
    """Accumulate (tag, type, values) entries, then serialize one IFD at
    a given offset with its out-of-line value area appended after it."""

    def __init__(self, bo: str) -> None:
        self.bo = bo
        self.entries: list[tuple[int, int, bytes, int]] = []

    def add(self, tag: int, etype: int, values, count: int | None = None):
        bo = self.bo
        if etype == _T_ASCII:
            raw = values.encode("ascii") + b"\x00"
            cnt = len(raw)
        elif etype == _T_SHORT:
            raw = struct.pack(bo + "%dH" % len(values), *values)
            cnt = len(values)
        elif etype == _T_LONG:
            raw = struct.pack(bo + "%dI" % len(values), *values)
            cnt = len(values)
        elif etype == _T_RATIONAL:
            flat = [x for pair in values for x in pair]
            raw = struct.pack(bo + "%dI" % len(flat), *flat)
            cnt = len(values)
        else:
            raise ValueError(f"unsupported EXIF entry type {etype}")
        self.entries.append((tag, etype, raw, cnt))

    def size(self) -> int:
        inline = 2 + 12 * len(self.entries) + 4
        extra = sum(len(raw) for _, _, raw, _ in self.entries if len(raw) > 4)
        return inline + extra

    def serialize(self, offset: int) -> bytes:
        """Emit the IFD assuming it starts at ``offset`` within the TIFF
        blob (entries sorted by tag, per spec)."""
        bo = self.bo
        entries = sorted(self.entries)
        out = struct.pack(bo + "H", len(entries))
        tail = b""
        tail_off = offset + 2 + 12 * len(entries) + 4
        for tag, etype, raw, cnt in entries:
            out += struct.pack(bo + "HHI", tag, etype, cnt)
            if len(raw) <= 4:
                out += raw + b"\x00" * (4 - len(raw))
            else:
                out += struct.pack(bo + "I", tail_off + len(tail))
                tail += raw
        out += struct.pack(bo + "I", 0)  # next-IFD: none
        return out + tail


def encode_exif_app1(
    *,
    byte_order: str,
    make: str,
    model: str,
    orientation: int,
    dt_original: str,
    lat_ref: str,
    lat_dms: tuple[tuple[int, int], tuple[int, int], tuple[int, int]],
    lon_ref: str,
    lon_dms: tuple[tuple[int, int], tuple[int, int], tuple[int, int]],
) -> bytes:
    """Build a complete APP1 segment (marker + length + Exif\\0\\0 + TIFF).

    ``byte_order`` is "II" or "MM"; ``*_dms`` are three exact
    (numerator, denominator) RATIONAL pairs (degrees, minutes, seconds).
    """
    bo = "<" if byte_order == "II" else ">"
    gps = _IfdBuilder(bo)
    gps.add(TAG_GPS_LAT_REF, _T_ASCII, lat_ref)
    gps.add(TAG_GPS_LAT, _T_RATIONAL, list(lat_dms))
    gps.add(TAG_GPS_LON_REF, _T_ASCII, lon_ref)
    gps.add(TAG_GPS_LON, _T_RATIONAL, list(lon_dms))
    exif = _IfdBuilder(bo)
    exif.add(TAG_DT_ORIGINAL, _T_ASCII, dt_original)
    ifd0 = _IfdBuilder(bo)
    ifd0.add(TAG_MAKE, _T_ASCII, make)
    ifd0.add(TAG_MODEL, _T_ASCII, model)
    ifd0.add(TAG_ORIENTATION, _T_SHORT, [orientation])
    # pointer values patched once layout is known
    ifd0_off = 8
    exif_off = ifd0_off + ifd0.size() + 24  # + the two 12-byte ptr entries
    ifd0.add(TAG_EXIF_IFD, _T_LONG, [exif_off])
    gps_off = exif_off + exif.size()
    ifd0.add(TAG_GPS_IFD, _T_LONG, [gps_off])
    tiff = (
        byte_order.encode("ascii")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", ifd0_off)
        + ifd0.serialize(ifd0_off)
        + exif.serialize(exif_off)
        + gps.serialize(gps_off)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI (the spec position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


# ------------------------------------------------------------------ parser

def _parse_ifd(buf: bytes, bo: str, off: int) -> dict[int, tuple[int, list]]:
    """One IFD -> {tag: (type, values)}; RATIONALs stay (num, den) pairs."""
    if off + 2 > len(buf):
        raise ValueError("EXIF IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", buf, off)
    pos = off + 2
    if pos + 12 * n + 4 > len(buf):
        raise ValueError("truncated EXIF IFD")
    tags: dict[int, tuple[int, list]] = {}
    for _ in range(n):
        tag, etype, count = struct.unpack_from(bo + "HHI", buf, pos)
        size = _TYPE_SIZES.get(etype)
        if size is None:  # skip exotic types rather than dead-letter
            pos += 12
            continue
        total = size * count
        if total <= 4:
            raw = buf[pos + 8 : pos + 8 + total]
        else:
            (voff,) = struct.unpack_from(bo + "I", buf, pos + 8)
            raw = buf[voff : voff + total]
            if len(raw) != total:
                raise ValueError("EXIF value offset out of range")
        if etype == _T_SHORT:
            vals = list(struct.unpack(bo + "%dH" % count, raw))
        elif etype == _T_LONG:
            vals = list(struct.unpack(bo + "%dI" % count, raw))
        elif etype == _T_RATIONAL:
            flat = struct.unpack(bo + "%dI" % (2 * count), raw)
            vals = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
        elif etype == _T_ASCII:
            vals = [raw.split(b"\x00", 1)[0].decode("ascii", "replace")]
        else:
            vals = list(raw)
        tags[tag] = (etype, vals)
        pos += 12
    return tags


def _find_exif_tiff(jpeg: bytes) -> bytes | None:
    """Walk JPEG marker headers (never entropy data) to the Exif APP1."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 2 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # ADVICE r13: 0xFF fill bytes between segments are spec-legal
        # padding (ITU T.81 §B.1.1.2) — skip them, or the fill byte
        # reads as the marker and the walk silently desyncs
        while pos < len(jpeg) and jpeg[pos] == 0xFF:
            pos += 1
        if pos >= len(jpeg):
            return None
        marker = jpeg[pos]
        pos += 1
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no headers left
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn: standalone markers carry no length field
            continue
        if pos + 2 > len(jpeg):
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack_from(">H", jpeg, pos)
        body = jpeg[pos + 2 : pos + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        pos += seg_len
    return None


def parse_exif(jpeg: bytes) -> dict | None:
    """Extract the EXIF fields this family certifies; None when the
    image carries no Exif APP1 (the common crawl case — not an error).

    GPS coordinates are returned as exact integer milliarcseconds
    (deg*3600000 + min*60000 + sec*1000, each term from the RATIONAL's
    integer pair) so no float touches the hash-certified path."""
    tiff = _find_exif_tiff(jpeg)
    if tiff is None:
        return None
    order = tiff[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("bad EXIF byte order")
    (magic,) = struct.unpack_from(bo + "H", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, bo, ifd0_off)

    def ascii_tag(tags, tag):
        e = tags.get(tag)
        return e[1][0] if e and e[0] == _T_ASCII else None

    out = {
        "byte_order": order.decode("ascii"),
        "make": ascii_tag(ifd0, TAG_MAKE),
        "model": ascii_tag(ifd0, TAG_MODEL),
        "orientation": (
            ifd0[TAG_ORIENTATION][1][0] if TAG_ORIENTATION in ifd0 else None
        ),
        "dt_original": None,
        "lat_ref": None,
        "lat_mas": None,
        "lon_ref": None,
        "lon_mas": None,
    }
    if TAG_EXIF_IFD in ifd0:
        sub = _parse_ifd(tiff, bo, ifd0[TAG_EXIF_IFD][1][0])
        out["dt_original"] = ascii_tag(sub, TAG_DT_ORIGINAL)
    if TAG_GPS_IFD in ifd0:
        gps = _parse_ifd(tiff, bo, ifd0[TAG_GPS_IFD][1][0])
        out["lat_ref"] = ascii_tag(gps, TAG_GPS_LAT_REF)
        out["lon_ref"] = ascii_tag(gps, TAG_GPS_LON_REF)
        for tag, key in ((TAG_GPS_LAT, "lat_mas"), (TAG_GPS_LON, "lon_mas")):
            e = gps.get(tag)
            if e and e[0] == _T_RATIONAL and len(e[1]) == 3:
                (dn, dd), (mn, md), (sn, sd) = e[1]
                if dd == 0 or md == 0 or sd == 0:
                    raise ValueError("zero-denominator GPS rational")
                # exact when denominators divide the milliarcsecond scale
                out[key] = (
                    dn * 3_600_000 // dd + mn * 60_000 // md + sn * 1_000 // sd
                )
    return out
