"""EXIF APP1 writer/parser contracts (operators/exif.py): byte-order
rotation, sub-IFD pointer walks, exact rational GPS, decoy skipping,
and the malformed-container raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pasardassist_spark.operators import exif as EX
from pasardassist_spark.operators import jpegcodec
from pasardassist_spark.operators.imagecodec import Raster


def _jpeg() -> bytes:
    v = np.full((8, 8, 3), 64, dtype=np.uint8)
    return jpegcodec.encode_jpeg(Raster(8, 8, 3, v.tobytes()))


def _app1(byte_order: str) -> bytes:
    return EX.encode_exif_app1(
        byte_order=byte_order,
        make="CamCo 1",
        model="DSLR-2",
        orientation=6,
        dt_original="2021:03:04 05:06:07",
        lat_ref="N",
        lat_dms=((51, 1), (30, 1), (12345, 1000)),
        lon_ref="W",
        lon_dms=((0, 1), (7, 1), (500, 1000)),
    )


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    jpeg = EX.insert_app1(_jpeg(), _app1(bo))
    meta = EX.parse_exif(jpeg)
    assert meta["byte_order"] == bo
    assert meta["make"] == "CamCo 1"
    assert meta["model"] == "DSLR-2"
    assert meta["orientation"] == 6
    assert meta["dt_original"] == "2021:03:04 05:06:07"
    assert meta["lat_ref"] == "N" and meta["lon_ref"] == "W"
    # 51 deg 30 min 12.345 s -> exact milliarcseconds
    assert meta["lat_mas"] == 51 * 3_600_000 + 30 * 60_000 + 12_345
    assert meta["lon_mas"] == 7 * 60_000 + 500


def test_decoy_app1_and_com_are_skipped():
    jpeg = EX.insert_app1(_jpeg(), _app1("II"))
    decoy = b"XMP\x00 not exif at all"
    jpeg = EX.insert_app1(
        jpeg, b"\xff\xe1" + struct.pack(">H", len(decoy) + 2) + decoy
    )
    jpeg = EX.insert_app1(jpeg, b"\xff\xfe" + struct.pack(">H", 9) + b"comment")
    meta = EX.parse_exif(jpeg)
    assert meta is not None and meta["make"] == "CamCo 1"


def test_no_exif_returns_none_not_error():
    assert EX.parse_exif(_jpeg()) is None


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        EX.parse_exif(b"\x89PNG\r\n\x1a\n")


def test_truncated_value_offset_raises():
    app1 = _app1("II")
    # chop the APP1 body so an out-of-line value offset dangles, then
    # fix the segment length so the marker walk still finds the APP1
    body = app1[4:][:40]
    trunc = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    with pytest.raises(ValueError):
        EX.parse_exif(EX.insert_app1(_jpeg(), trunc))


def test_zero_denominator_gps_raises():
    app1 = bytearray(_app1("MM"))
    # zero out every rational denominator in the (big-endian) tail
    tiff = bytes(app1[10:])
    lat = struct.pack(">II", 51, 1)
    assert lat in tiff
    patched = tiff.replace(struct.pack(">II", 51, 1), struct.pack(">II", 51, 0))
    rebuilt = bytes(app1[:10]) + patched
    rebuilt = rebuilt[:2] + struct.pack(">H", len(rebuilt) - 2) + rebuilt[4:]
    with pytest.raises(ValueError):
        EX.parse_exif(EX.insert_app1(_jpeg(), rebuilt))


def test_exact_mas_requires_integer_pairs():
    # denominators that do NOT divide the scale still floor predictably
    jpeg = EX.insert_app1(
        _jpeg(),
        EX.encode_exif_app1(
            byte_order="II",
            make="m",
            model="m",
            orientation=1,
            dt_original="2021:01:01 00:00:00",
            lat_ref="N",
            lat_dms=((1, 2), (1, 3), (1, 7)),  # 0.5 deg, 1/3 min, 1/7 s
            lon_ref="E",
            lon_dms=((0, 1), (0, 1), (0, 1)),
        ),
    )
    meta = EX.parse_exif(jpeg)
    assert meta["lat_mas"] == 3_600_000 // 2 + 60_000 // 3 + 1_000 // 7


def test_marker_walk_skips_fill_bytes_and_standalone_markers():
    """ADVICE r13: 0xFF fill padding between segments (ITU T.81
    §B.1.1.2) and length-less standalone markers (TEM, RSTn) must not
    desync the header walk."""
    import struct

    from pasardassist_spark.operators.exif import _find_exif_tiff

    tiff = b"II*\x00" + b"\x00" * 8
    app1 = (
        b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(tiff))
        + b"Exif\x00\x00" + tiff
    )
    padded = b"\xff\xd8" + b"\xff\xff\xff" + app1 + b"\xff\xd9"
    assert _find_exif_tiff(padded) == tiff
    standalone = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + app1 + b"\xff\xd9"
    assert _find_exif_tiff(standalone) == tiff
