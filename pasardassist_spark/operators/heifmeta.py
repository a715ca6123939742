"""HEIF/AVIF still-image metadata walk (ISO/IEC 23008-12 on the
ISO-BMFF base of ISO/IEC 14496-12) — per-item type, dimensions,
rotation, bit depth and the primary-item flag WITHOUT decoding a
single pixel.

Reference parity: the same no-decode indexing family as
operators/mp4meta.py (whose box grammar this module reuses —
_boxes/_find/_fullbox): the reference records media metadata for
fetched assets before deciding whether to keep them; iPhone crawls
arrive as HEIC and the modern web increasingly as AVIF, so a 100 TB
image crawl needs this readout as much as EXIF/PNG/GIF/TIFF.

Implemented, all against the public 23008-12 structure:

- ``ftyp`` major brand (heic/heix/mif1/avif/avis);
- the top-level ``meta`` FULLBOX container: ``pitm`` (primary item,
  16-bit v0 / 32-bit v1), ``iinf``/``infe`` item infos (v2 16-bit ids
  / v3 32-bit, item type fourcc, null-terminated name), ``iprp`` →
  ``ipco`` property container (``ispe`` spatial extents, ``irot``
  rotation, ``pixi`` bits-per-channel) + ``ipma`` associations (BOTH
  index widths: 7-bit and, under flags&1, 15-bit property indices,
  essential bit masked off; BOTH item-id widths by version);
- properties resolve per item through ipma, so a thumbnail's ispe
  never leaks onto the primary image.

PROTECTED items (item_protection_index != 0) and encryption raise
NotImplementedError by name; a missing meta/iinf, torn box, or
out-of-range property index raises ValueError (dead-letter loudly,
never read wrong).  ``hvcC``/``av1C``/``colr`` stay opaque —
decode-side config the metadata pass never needs.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from pasardassist_spark.operators.mp4meta import (
    _box,
    _boxes,
    _find,
    _full,
    _fullbox,
    _u32,
)

__all__ = ["HeifItem", "HeifMeta", "parse_heif_meta", "encode_heif_meta"]


class HeifItem(NamedTuple):
    item_id: int
    item_type: str  # 'hvc1' / 'av01' / 'Exif' / 'mime' / ...
    width: int | None  # from the item's associated ispe, None without one
    height: int | None
    rotation: int | None  # irot ccw angle in degrees, None without one
    bit_depth: int | None  # first pixi channel, None without one
    is_primary: bool


class HeifMeta(NamedTuple):
    brand: str
    n_items: int
    items: tuple[HeifItem, ...]


def sniff_heif(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[4:8] == b"ftyp"
        and payload[8:12] in (b"heic", b"heix", b"mif1", b"avif", b"avis")
    )


def _parse_pitm(buf: bytes, b: int, e: int) -> int:
    v, p = _fullbox(buf, b)
    if v == 0:
        if p + 2 > e:
            raise ValueError("torn pitm")
        return struct.unpack_from(">H", buf, p)[0]
    return _u32(buf, p, e, "pitm v1")


def _parse_iinf(buf: bytes, b: int, e: int) -> dict[int, str]:
    v, p = _fullbox(buf, b)
    if v == 0:
        if p + 2 > e:
            raise ValueError("torn iinf")
        n, p = struct.unpack_from(">H", buf, p)[0], p + 2
    else:
        n, p = _u32(buf, p, e, "iinf count"), p + 4
    items: dict[int, str] = {}
    for t, ib, ie in _boxes(buf, p, e):
        if t != "infe":
            continue
        iv, ip = _fullbox(buf, ib)
        if iv == 2:
            if ip + 4 > ie:
                raise ValueError("torn infe v2")
            item_id, prot = struct.unpack_from(">HH", buf, ip)
            ip += 4
        elif iv == 3:
            item_id = _u32(buf, ip, ie, "infe v3 id")
            if ip + 6 > ie:
                raise ValueError("torn infe v3")
            (prot,) = struct.unpack_from(">H", buf, ip + 4)
            ip += 6
        else:
            raise ValueError(f"infe version {iv} unknown")
        if prot != 0:
            raise NotImplementedError(
                "protected HEIF item (item_protection_index != 0) "
                "unsupported"
            )
        if ip + 4 > ie:
            raise ValueError("torn infe item_type")
        items[item_id] = buf[ip : ip + 4].decode("latin-1")
    if len(items) != n:
        raise ValueError(
            f"iinf declares {n} items, found {len(items)} infe boxes"
        )
    return items


def _parse_ipco(buf: bytes, b: int, e: int) -> list[tuple[str, int, int]]:
    """1-indexed property list [(type, body_start, body_end)]."""
    return [(t, pb, pe) for t, pb, pe in _boxes(buf, b, e)]


def _parse_ipma(
    buf: bytes, b: int, e: int
) -> dict[int, list[int]]:
    """item_id -> 1-based property indices (essential bit masked)."""
    verflags = struct.unpack_from(">I", buf, b)[0] if b + 4 <= e else None
    if verflags is None:
        raise ValueError("torn ipma")
    v, flags = verflags >> 24, verflags & 0xFFFFFF
    p = b + 4
    n = _u32(buf, p, e, "ipma count")
    p += 4
    out: dict[int, list[int]] = {}
    for _ in range(n):
        if v == 0:
            if p + 2 > e:
                raise ValueError("torn ipma entry")
            (item_id,) = struct.unpack_from(">H", buf, p)
            p += 2
        else:
            item_id = _u32(buf, p, e, "ipma v1 id")
            p += 4
        if p + 1 > e:
            raise ValueError("torn ipma association count")
        cnt = buf[p]
        p += 1
        idxs: list[int] = []
        for _a in range(cnt):
            if flags & 1:
                if p + 2 > e:
                    raise ValueError("torn ipma association")
                (val,) = struct.unpack_from(">H", buf, p)
                idxs.append(val & 0x7FFF)
                p += 2
            else:
                if p + 1 > e:
                    raise ValueError("torn ipma association")
                idxs.append(buf[p] & 0x7F)
                p += 1
        out[item_id] = idxs
    return out


def parse_heif_meta(payload: bytes) -> HeifMeta:
    end = len(payload)
    brand = ""
    meta = None
    for t, b, e in _boxes(payload, 0, end):
        if t == "ftyp":
            if e - b < 8:
                raise ValueError("torn ftyp")
            brand = payload[b : b + 4].decode("latin-1")
        elif t == "meta":
            # meta is a FULLBOX container: children start after
            # version/flags
            _, p = _fullbox(payload, b)
            meta = (p, e)
    if meta is None:
        raise ValueError("HEIF has no meta box")
    mb, me = meta
    pitm = _find(payload, mb, me, "pitm")
    primary = _parse_pitm(payload, *pitm) if pitm else None
    iinf = _find(payload, mb, me, "iinf")
    if iinf is None:
        raise ValueError("HEIF meta has no iinf")
    items = _parse_iinf(payload, *iinf)
    props: list[tuple[str, int, int]] = []
    assoc: dict[int, list[int]] = {}
    iprp = _find(payload, mb, me, "iprp")
    if iprp is not None:
        ipco = _find(payload, iprp[0], iprp[1], "ipco")
        if ipco is not None:
            props = _parse_ipco(payload, *ipco)
        ipma = _find(payload, iprp[0], iprp[1], "ipma")
        if ipma is not None:
            assoc = _parse_ipma(payload, *ipma)
    out: list[HeifItem] = []
    for item_id in sorted(items):
        w = h = rot = depth = None
        for idx in assoc.get(item_id, ()):
            if not 1 <= idx <= len(props):
                raise ValueError(
                    f"ipma property index {idx} out of range "
                    f"(ipco holds {len(props)})"
                )
            t, pb, pe = props[idx - 1]
            if t == "ispe":
                _, pp = _fullbox(payload, pb)
                w = _u32(payload, pp, pe, "ispe width")
                h = _u32(payload, pp + 4, pe, "ispe height")
            elif t == "irot":
                if pb + 1 > pe:
                    raise ValueError("torn irot")
                rot = (payload[pb] & 3) * 90
            elif t == "pixi":
                _, pp = _fullbox(payload, pb)
                if pp + 2 > pe:
                    raise ValueError("torn pixi")
                if payload[pp] < 1:
                    raise ValueError("pixi declares zero channels")
                depth = payload[pp + 1]
        out.append(
            HeifItem(
                item_id,
                items[item_id],
                w,
                h,
                rot,
                depth,
                item_id == primary,
            )
        )
    return HeifMeta(brand, len(out), tuple(out))


# ---------------------------------------------------------------- writer ---


def encode_heif_meta(
    brand: str,
    items: list[tuple[int, str, int | None, int | None, int | None, int | None]],
    primary_id: int,
    *,
    wide: bool = False,
) -> bytes:
    """Minimal conforming HEIF/AVIF skeleton for metadata-walk fixtures.

    ``items`` rows: (item_id, item_type, width, height, rotation,
    bit_depth) — None skips that property for the item.  ``wide``
    exercises the 32-bit pitm/infe/ipma layouts and 15-bit ipma
    property indices (flags&1); narrow uses the common v0/v2 16-bit +
    7-bit forms.  Properties are deduplicated into ipco and shared via
    ipma the way real muxers emit them."""
    props: list[bytes] = []
    prop_index: dict[bytes, int] = {}

    def add_prop(raw: bytes) -> int:
        if raw not in prop_index:
            props.append(raw)
            prop_index[raw] = len(props)
        return prop_index[raw]

    assoc_entries: list[tuple[int, list[int]]] = []
    infes: list[bytes] = []
    for item_id, itype, w, h, rot, depth in items:
        idxs: list[int] = []
        if w is not None and h is not None:
            idxs.append(add_prop(_full("ispe", 0, struct.pack(">II", w, h))))
        if rot is not None:
            idxs.append(add_prop(_box("irot", bytes([rot // 90 & 3]))))
        if depth is not None:
            idxs.append(add_prop(_full("pixi", 0, bytes([1, depth]))))
        assoc_entries.append((item_id, idxs))
        name = b"item\x00"
        if wide:
            infes.append(
                _full(
                    "infe",
                    3,
                    struct.pack(">IH", item_id, 0)
                    + itype.encode("latin-1")
                    + name,
                )
            )
        else:
            infes.append(
                _full(
                    "infe",
                    2,
                    struct.pack(">HH", item_id, 0)
                    + itype.encode("latin-1")
                    + name,
                )
            )
    if wide:
        pitm = _full("pitm", 1, struct.pack(">I", primary_id))
        iinf = _full("iinf", 1, struct.pack(">I", len(items)) + b"".join(infes))
    else:
        pitm = _full("pitm", 0, struct.pack(">H", primary_id))
        iinf = _full("iinf", 0, struct.pack(">H", len(items)) + b"".join(infes))
    ipco = _box("ipco", b"".join(props))
    ipma_body = struct.pack(">I", len(assoc_entries))
    flags = 1 if wide else 0
    for item_id, idxs in assoc_entries:
        ipma_body += (
            struct.pack(">I", item_id) if wide else struct.pack(">H", item_id)
        )
        ipma_body += bytes([len(idxs)])
        for idx in idxs:
            if wide:
                ipma_body += struct.pack(">H", 0x8000 | idx)
            else:
                ipma_body += bytes([0x80 | idx])
    ipma = struct.pack(">I", ((1 if wide else 0) << 24) | flags) + ipma_body
    iprp = _box("iprp", ipco + _box("ipma", ipma))
    hdlr = _full(
        "hdlr", 0, struct.pack(">I", 0) + b"pict" + bytes(12) + b"H\x00"
    )
    meta = _full(
        "meta", 0, hdlr + pitm + iinf + iprp
    )
    ftyp = _box(
        "ftyp",
        brand.encode("latin-1") + struct.pack(">I", 0) + b"mif1",
    )
    # a free box between ftyp and meta: walkers must skip by size
    return ftyp + _box("free", b"\x00" * 7) + meta
