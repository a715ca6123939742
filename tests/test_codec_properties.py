"""Hypothesis property tests for the pure-Python codecs: encode→decode is
the identity for every representable raster/PCM stream, and the PNG
scanline filters invert for every filter choice — the guarantees the
byte-fixture tests sample, proved over generated inputs."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings, strategies as st

from pasardassist_spark.operators import audiocodec as A
from pasardassist_spark.operators import imagecodec as C


def rasters(max_side: int = 12):
    return st.integers(1, max_side).flatmap(
        lambda w: st.integers(1, max_side).flatmap(
            lambda h: st.sampled_from([1, 3]).flatmap(
                lambda ch: st.binary(
                    min_size=w * h * ch, max_size=w * h * ch
                ).map(lambda px: C.Raster(w, h, ch, px))
            )
        )
    )


@settings(max_examples=40, deadline=None)
@given(rasters())
def test_ppm_roundtrip_property(r):
    assert C.decode(C.encode_ppm(r)) == r


@settings(max_examples=40, deadline=None)
@given(rasters())
def test_png_roundtrip_property(r):
    assert C.decode(C.encode_png(r)) == r


@settings(max_examples=40, deadline=None)
@given(rasters())
def test_bmp_roundtrip_property(r):
    # BMP is 24-bit: gray rasters promote to RGB on encode
    d = C.decode(C.encode_bmp(r))
    if r.channels == 3:
        assert d == r
    else:
        assert (d.width, d.height, d.channels) == (r.width, r.height, 3)
        assert all(
            d.pixels[i * 3] == d.pixels[i * 3 + 1] == d.pixels[i * 3 + 2] == v
            for i, v in enumerate(r.pixels)
        )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(1, 4),
    st.data(),
)
def test_png_unfilter_inverts_every_filter_choice(w, h, ch, data):
    """Forward-filter each scanline with an arbitrary per-row filter type
    (the test's own forward implementation), then require decode to
    recover the exact pixels — covers mixed-filter streams the encoder
    (always filter 0) never produces."""
    if ch == 4:
        color_type = 6
    elif ch == 3:
        color_type = 2
    elif ch == 2:
        color_type = 4
    else:
        color_type = 0
    stride = w * ch
    pixels = data.draw(st.binary(min_size=h * stride, max_size=h * stride))
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )

    raw = bytearray()
    prev = b""
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filters[y])
        out = bytearray()
        for i, v in enumerate(line):
            a = line[i - ch] if i >= ch else 0
            b = prev[i] if prev else 0
            c = prev[i - ch] if (prev and i >= ch) else 0
            f = filters[y]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        raw += out
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    payload = (
        C.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = C.decode(payload)
    # alpha/gray-alpha drop to 3/1 channels; compare what survives
    keep = {1: 1, 2: 1, 3: 3, 4: 3}[ch]
    want = bytearray()
    for i in range(w * h):
        want += pixels[i * ch : i * ch + keep]
    assert (got.width, got.height, got.channels) == (w, h, keep)
    assert got.pixels == bytes(want)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 2),
    st.integers(1000, 48000),
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
)
def test_wav_roundtrip_property(channels, rate, samples):
    # interleaved length must be a channel multiple
    samples = samples[: len(samples) - (len(samples) % channels)]
    audio = A.PcmAudio(rate, channels, samples)
    assert A.decode_wav(A.encode_wav(audio)) == audio


@settings(max_examples=40, deadline=None)
@given(rasters(max_side=10), st.integers(1, 12), st.integers(1, 12))
def test_resize_nearest_property(r, ow, oh):
    """Every output pixel equals the source pixel at the floor-sampled
    coordinate — checked independently of the implementation's loop."""
    out = C.resize_nearest(r, ow, oh)
    assert (out.width, out.height, out.channels) == (ow, oh, r.channels)
    ch = r.channels
    for y in range(oh):
        for x in range(ow):
            sx, sy = (x * r.width) // ow, (y * r.height) // oh
            src = r.pixels[(sy * r.width + sx) * ch : (sy * r.width + sx) * ch + ch]
            got = out.pixels[(y * ow + x) * ch : (y * ow + x) * ch + ch]
            assert got == src


# ---------------------------------------------------------------- fuzzing --

_MAGICS = [
    b"", b"P6\n", b"P5 ", b"P3\n", b"P2 ", b"BM", C.PNG_MAGIC,
    b"RIFF\x00\x00\x00\x00WAVE", b"RIFF\x00\x00\x00\x00AVI ",
]


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(_MAGICS), st.binary(max_size=256))
def test_decoders_never_escape_their_error_contract(prefix, junk):
    """Arbitrary bytes — including valid magics followed by garbage — must
    produce EXACTLY a Raster/PcmAudio/Video, ValueError, or
    NotImplementedError. IndexError/struct.error/zlib.error/OverflowError
    escaping a decoder would kill a whole Spark task batch."""
    from pasardassist_spark.operators import videocodec as V

    payload = prefix + junk
    for fn in (C.decode, A.decode_wav, V.decode_avi):
        try:
            fn(payload)
        except (ValueError, NotImplementedError):
            pass


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64))
def test_sniff_never_raises(junk):
    C.sniff_format(junk)
    A.sniff_wav(junk)
    from pasardassist_spark.operators.videocodec import sniff_avi

    sniff_avi(junk)


def test_dimension_bomb_headers_rejected_cheaply():
    """Crafted huge-dimension headers must raise ValueError BEFORE any
    raster allocation (decompression-bomb guard)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bomb|dimensions"):
        C.decode(b"P6\n999999999 999999999\n255\n")
    # PNG IHDR claiming a 1-gigapixel image
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0)
    payload = (
        C.PNG_MAGIC
        + _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with _pytest.raises(ValueError, match="bomb|dimensions"):
        C.decode(payload)


def test_png_zlib_bomb_bounded():
    """A tiny IDAT inflating past the IHDR-declared raster size must be
    rejected without materializing the expansion."""
    import struct as _struct
    import zlib as _zlib

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # declares 2x2 gray (expected 2*(2+1)=6 bytes) but inflates to 10 MB
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = _zlib.compress(b"\x00" * (10 << 20))
    payload = C.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inflates"):
        C.decode(payload)


def test_avi_deep_list_nesting_rejected():
    """A crafted AVI with a LIST nest thousands deep must raise ValueError
    (error contract), not RecursionError."""
    import struct as _struct

    from pasardassist_spark.operators import videocodec as V

    inner = b""
    for _ in range(500):
        inner = b"LIST" + _struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
    payload = b"RIFF" + _struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nesting|avih"):
        V.decode_avi(payload)


def test_png_truncated_adler_rejected():
    """An IDAT whose zlib trailer is cut off must raise ValueError even
    when the pixel bytes fully inflated (stream-completeness + adler32
    verification survives the bounded-inflate rewrite)."""
    import pytest as _pytest

    px = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
    good = C.encode_png(C.Raster(4, 3, 3, px))
    # locate the IDAT chunk and drop the last 4 bytes of its zlib body
    idx = good.index(b"IDAT") - 4
    (size,) = struct.unpack_from(">I", good, idx)
    body = good[idx + 8 : idx + 8 + size]
    cut = body[:-4]
    rebuilt = (
        good[:idx]
        + struct.pack(">I", len(cut)) + b"IDAT" + cut
        + struct.pack(">I", zlib.crc32(b"IDAT" + cut) & 0xFFFFFFFF)
        + good[idx + 12 + size:]
    )
    assert C.decode(good) == C.Raster(4, 3, 3, px)  # control
    with _pytest.raises(ValueError):
        C.decode(rebuilt)
