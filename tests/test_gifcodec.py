"""GIF codec tests: LZW round-trips across width boundaries, spec
hand-cases, container structure, and error contracts."""

from __future__ import annotations

import pytest

from pasardassist_spark.operators.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    sniff_gif,
)
from pasardassist_spark.operators.imagecodec import decode, sniff_format


def _pal_identity() -> bytes:
    return bytes(
        b for i in range(256) for b in (i, (i + 29) % 256, (i + 58) % 256)
    )


def _indices(w: int, h: int, seed: int = 0) -> bytes:
    return bytes((x * 7 + y * 13 + seed) % 256 for y in range(h) for x in range(w))


# ------------------------------------------------------------------ LZW --


def test_lzw_hand_case_kwkwk():
    """indices [1,1,1,1] -> codes CLEAR,1,258(KwKwK),1,EOI."""
    data = _lzw_encode(bytes([1, 1, 1, 1]), 8)
    assert _lzw_decode(data, 8, 4) == bytes([1, 1, 1, 1])


@pytest.mark.parametrize("n", [1, 2, 300, 700, 2000, 9000, 30000])
def test_lzw_roundtrip_boundary_crossings(n):
    """Sizes chosen so the dictionary crosses the 9->10->11->12-bit width
    boundaries and (at 30000) the 4096-slot CLEAR/reset path."""
    idx = bytes((i * 31 + (i * i) % 97) % 256 for i in range(n))
    assert _lzw_decode(_lzw_encode(idx, 8), 8, n) == idx


def test_lzw_roundtrip_low_entropy_long_runs():
    idx = bytes([5] * 10000 + [7] * 10000)
    assert _lzw_decode(_lzw_encode(idx, 8), 8, 20000) == idx


def test_lzw_truncated_stream_raises():
    data = _lzw_encode(_indices(20, 20), 8)
    with pytest.raises(ValueError, match="truncated|EOI"):
        _lzw_decode(data[: len(data) // 2], 8, 400)


def test_lzw_overrun_guard():
    data = _lzw_encode(bytes(range(100)), 8)
    with pytest.raises(ValueError, match="overrun"):
        _lzw_decode(data, 8, 50)


# ------------------------------------------------------------ container --


def test_gif_roundtrip_pixels():
    w, h = 65, 57  # big enough that LZW widens past 9 bits
    idx = _indices(w, h, seed=3)
    pal = _pal_identity()
    payload = encode_gif(idx, w, h, pal)
    assert sniff_gif(payload) and sniff_format(payload) == "gif"
    r = decode_gif(payload)
    assert (r.width, r.height, r.channels) == (w, h, 3)
    want = bytes(b for c in idx for b in pal[3 * c : 3 * c + 3])
    assert r.pixels == want
    # and through the shared dispatcher
    assert decode(payload).pixels == want


def test_gif_small_palette_and_local_table_error_paths():
    # 2-color palette still decodes
    payload = encode_gif(bytes([0, 1, 1, 0]), 2, 2, bytes([0, 0, 0, 255, 255, 255]))
    r = decode_gif(payload)
    assert r.pixels == bytes([0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0])


def test_gif_interlace_rejected():
    payload = bytearray(encode_gif(_indices(8, 8), 8, 8, _pal_identity()))
    # image descriptor flags byte: 6 (magic) + 7 (LSD) + 768 (palette)
    # + 1 (0x2C) + 8 (x,y,w,h) = 790
    payload[790] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(payload))


def test_gif_animation_rejected():
    one = encode_gif(_indices(8, 8), 8, 8, _pal_identity())
    # graft a second image descriptor before the trailer
    frame = one[6 + 7 + 768 : -1]  # descriptor..data, without trailer
    two = one[:-1] + frame + b"\x3b"
    with pytest.raises(NotImplementedError, match="animated"):
        decode_gif(two)


def test_gif_truncated_and_garbage_raise_valueerror():
    payload = encode_gif(_indices(16, 12), 16, 12, _pal_identity())
    for cut in (5, 12, 400, 790, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)


def test_gif_bomb_guard():
    import struct as st

    hdr = b"GIF89a" + st.pack("<HHBBB", 60000, 60000, 0xF7, 0, 0)
    payload = hdr + _pal_identity() + b"\x2c" + st.pack(
        "<HHHHB", 0, 0, 60000, 60000, 0
    ) + b"\x08\x00\x3b"
    with pytest.raises(ValueError, match="bomb|dimensions"):
        decode_gif(payload)


def test_gif_index_beyond_palette_raises():
    # 4-color table but index stream contains 200
    import struct as st

    idx = bytes([0, 1, 2, 200])
    data = _lzw_encode(idx, 8)
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # global table, 2 entries
    out += bytes(6)  # 2-entry table
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(8)
    out.append(len(data))
    out += data
    out += b"\x00\x3b"
    with pytest.raises(ValueError, match="beyond color table"):
        decode_gif(bytes(out))
