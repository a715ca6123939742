"""FLAC / Ogg container metadata — operators/flacmeta.py."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.flacmeta import (
    encode_flac_meta,
    encode_ogg,
    parse_flac_meta,
    parse_ogg_meta,
)


def test_flac_streaminfo_bitfield_roundtrip():
    for rate, ch, bps, total in [
        (44100, 2, 16, 441000),
        (96000, 1, 24, 1),
        (8000, 8, 32, (1 << 36) - 1),  # field maxima
    ]:
        m = parse_flac_meta(encode_flac_meta(rate, ch, bps, total))
        assert (m.sample_rate, m.channels, m.bits_per_sample,
                m.total_samples) == (rate, ch, bps, total)
        assert m.duration_ms == total * 1000 // rate


def test_flac_vorbis_comment_tags():
    m = parse_flac_meta(
        encode_flac_meta(
            44100, 2, 16, 1000,
            vendor="libFLAC 1.4.3",
            tags=[("title", "Café 中文"), ("ARTIST", "X=Y")],
        )
    )
    assert m.vendor == "libFLAC 1.4.3"
    # keys upper-cased; '=' splits on the FIRST occurrence only
    assert m.tags == (("TITLE", "Café 中文"), ("ARTIST", "X=Y"))


def test_flac_error_contracts():
    with pytest.raises(ValueError, match="fLaC"):
        parse_flac_meta(b"OggS....")
    good = encode_flac_meta(44100, 2, 16, 1000)
    with pytest.raises(ValueError, match="torn FLAC"):
        parse_flac_meta(good[:-5])
    # STREAMINFO length corruption
    bad = bytearray(good)
    bad[5] = 0xFF  # blow up the 24-bit length
    with pytest.raises(ValueError, match="torn FLAC|STREAMINFO"):
        parse_flac_meta(bytes(bad))


@pytest.mark.parametrize(
    "codec,rate,samples,expect_ms",
    [
        ("vorbis", 44100, 44100, 1000),
        ("vorbis", 8000, 12345, 12345 * 1000 // 8000),
        ("opus", 48000, 96000, 2000),
        ("opus", 16000, 48 * 700, 700),  # ident rate != granule clock
    ],
)
def test_ogg_duration_per_codec_clock(codec, rate, samples, expect_ms):
    m = parse_ogg_meta(encode_ogg(codec, rate, 2, samples))
    assert m.codec == codec
    assert m.sample_rate == rate
    assert m.duration_ms == expect_ms
    assert m.n_pages == 3


def test_ogg_crc_verified():
    o = bytearray(encode_ogg("vorbis", 44100, 2, 1000))
    o[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_meta(bytes(o))


def test_ogg_lost_sync_and_torn():
    o = encode_ogg("opus", 48000, 1, 4800)
    with pytest.raises(ValueError, match="sync"):
        parse_ogg_meta(b"XXXX" + o[4:])
    with pytest.raises(ValueError, match="torn"):
        parse_ogg_meta(o[:-3])


def test_ogg_foreign_codecs_raise_by_name():
    # hand-build a BOS page whose first packet is a Theora ident
    from pasardassist_spark.operators.flacmeta import _ogg_page

    page = _ogg_page(7, 0, 0, [b"\x80theora" + bytes(10)], 0x02)
    with pytest.raises(NotImplementedError, match="Theora"):
        parse_ogg_meta(page)
    # FLAC-in-Ogg is READ since r15; a short 0x7F FLAC ident is now a
    # torn-input ValueError (test_ogg_flac_torn_ident_raises)


def test_ogg_255_lacing_run():
    """The fake audio packet is 600 bytes -> lacing 255,255,90; a page
    body shorter than the lacing total must raise, and the writer's
    page must parse (CRC-verified) with the packet intact."""
    o = encode_ogg("vorbis", 44100, 2, 5000)
    assert parse_ogg_meta(o).n_pages == 3
    # find the last page and tear one body byte out
    last = o.rfind(b"OggS")
    torn = o[: last + 40] + o[last + 41 :]
    with pytest.raises(ValueError, match="torn|CRC"):
        parse_ogg_meta(torn)


def test_flac_unknown_blocks_skipped():
    """Splice a PICTURE (type 6) block between STREAMINFO and the
    comment block — the walk must skip it by declared length."""
    f = encode_flac_meta(48000, 1, 16, 480, tags=[("TITLE", "t")])
    # STREAMINFO block is 4 (marker) + 4 + 34 bytes in
    cut = 4 + 4 + 34
    pic = bytes([6]) + (20).to_bytes(3, "big") + bytes(20)
    spliced = f[:cut] + pic + f[cut:]
    m = parse_flac_meta(spliced)
    assert m.tags == (("TITLE", "t"),)
    assert m.duration_ms == 10


def test_ogg_torn_mid_page_header():
    """A payload truncated INSIDE the 27-byte page header (e.g. right
    after 'OggS' + version) must raise ValueError, not leak
    struct.error/IndexError (r15 ADVICE fix)."""
    from pasardassist_spark.operators.flacmeta import encode_ogg

    o = encode_ogg("opus", 48000, 1, 4800)
    for cut in (5, 6, 20, 26):
        with pytest.raises(ValueError, match="torn Ogg page header"):
            parse_ogg_meta(o[:cut])


def test_ogg_flac_mapping_roundtrip():
    """r15: the xiph FLAC-to-Ogg mapping is read — ident packet 0x7F
    'FLAC' + version + header-count wrapping a byte-verbatim
    STREAMINFO; granule counts samples at the STREAMINFO rate."""
    from pasardassist_spark.operators.flacmeta import encode_ogg

    p = encode_ogg("flac", 44100, 2, 44100 * 3 + 123)
    m = parse_ogg_meta(p)
    assert m.codec == "flac" and m.sample_rate == 44100 and m.channels == 2
    assert m.duration_ms == (44100 * 3 + 123) * 1000 // 44100
    assert m.pre_skip == 0 and m.n_pages == 3
    # unsupported mapping version raises by name
    at = p.find(b"\x7fFLAC")
    bad = bytearray(p)
    bad[at + 5] = 2
    import struct as _s

    # recompute the page CRC after the version flip
    page_end = bad.find(b"OggS", 4)
    page = bytearray(bad[:page_end])
    _s.pack_into("<I", page, 22, 0)
    from pasardassist_spark.operators.flacmeta import _ogg_crc

    _s.pack_into("<i", bad, 22, _ogg_crc(bytes(page)) - (1 << 32) if _ogg_crc(bytes(page)) >= (1 << 31) else _ogg_crc(bytes(page)))
    with pytest.raises(NotImplementedError, match="mapping version 2"):
        parse_ogg_meta(bytes(bad))


def test_ogg_flac_torn_ident_raises():
    from pasardassist_spark.operators.flacmeta import _ogg_page

    short = _ogg_page(9, 0, 0, [b"\x7fFLAC\x01\x00" + bytes(10)], 0x02)
    with pytest.raises(ValueError, match="torn Ogg-FLAC ident"):
        parse_ogg_meta(short)
