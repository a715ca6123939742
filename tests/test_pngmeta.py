"""PNG text-chunk contracts (operators/pngmeta.py): all three chunk
kinds round-trip, CRC tears are caught, IDAT is never inflated, junk
never escapes ValueError."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from pasardassist_spark.operators import imagecodec, pngmeta
from pasardassist_spark.operators.imagecodec import Raster


def _png() -> bytes:
    return imagecodec.encode_png(Raster(4, 4, 3, bytes(48)))


@pytest.mark.parametrize("kind", ["tEXt", "zTXt", "iTXt"])
def test_roundtrip_each_kind(kind):
    text = "value with spaces & punct" + (" é日" if kind == "iTXt" else " é")
    png = pngmeta.insert_text_chunks(
        _png(), [pngmeta.encode_text_chunk("parameters", text, kind)]
    )
    assert pngmeta.parse_text_chunks(png) == {"parameters": text}


def test_latin1_kinds_reject_cjk():
    with pytest.raises(UnicodeEncodeError):
        pngmeta.encode_text_chunk("k", "日本", "tEXt")


def test_crc_tear_raises():
    png = bytearray(
        pngmeta.insert_text_chunks(
            _png(), [pngmeta.encode_text_chunk("k", "v", "tEXt")]
        )
    )
    # flip one byte inside the tEXt body
    idx = bytes(png).find(b"tEXt") + 5
    png[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        pngmeta.parse_text_chunks(bytes(png))


def test_idat_never_inflated():
    # corrupt the IDAT zlib stream; text parsing must still succeed
    png = bytearray(
        pngmeta.insert_text_chunks(
            _png(), [pngmeta.encode_text_chunk("k", "v", "zTXt")]
        )
    )
    i = bytes(png).find(b"IDAT")
    png[i + 6] ^= 0xFF  # inside IDAT body (CRC now wrong too)
    assert pngmeta.parse_text_chunks(bytes(png)) == {"k": "v"}


def test_keyword_rules():
    with pytest.raises(ValueError):
        pngmeta.encode_text_chunk("", "v")
    with pytest.raises(ValueError):
        pngmeta.encode_text_chunk("x" * 80, "v")


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_junk_never_hangs(junk):
    try:
        pngmeta.parse_text_chunks(b"\x89PNG\r\n\x1a\n" + junk)
    except (ValueError, zlib.error):
        pass


@settings(max_examples=60, deadline=None)
@given(
    kw=st.text(st.characters(min_codepoint=0x21, max_codepoint=0x7E),
               min_size=1, max_size=20),
    text=st.text(st.characters(min_codepoint=0x20, max_codepoint=0xFF),
                 max_size=80),
    kind=st.sampled_from(["tEXt", "zTXt", "iTXt"]),
)
def test_roundtrip_property(kw, text, kind):
    png = pngmeta.insert_text_chunks(
        _png(), [pngmeta.encode_text_chunk(kw, text, kind)]
    )
    assert pngmeta.parse_text_chunks(png)[kw] == text
