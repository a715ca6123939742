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


def test_gif_interlace_roundtrip():
    """Appendix E four-pass interlace (round 14): the interlaced encoding
    of a raster decodes identically to the progressive one, across
    heights hitting every pass-count regime (h=1 pass 1 only, h<=4 no
    pass-4-only rows, odd/even, > 8)."""
    pal = _pal_identity()
    for w, h in [(13, 1), (9, 2), (7, 3), (16, 4), (5, 5), (11, 8),
                 (10, 17), (23, 29)]:
        idx = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
        plain = decode_gif(encode_gif(idx, w, h, pal))
        inter = decode_gif(encode_gif(idx, w, h, pal, interlace=True))
        assert inter == plain, (w, h)
    # the descriptor flag is really set (not silently ignored)
    payload = encode_gif(_indices(8, 8), 8, 8, pal, interlace=True)
    assert payload[790] & 0x40


def test_gif_animated_interlace_roundtrip():
    from pasardassist_spark.operators.gifcodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = _pal_identity()
    frames = [(0, 0, 8, 8, bytes(range(64))), (2, 2, 4, 4, bytes(range(16)))]
    plain = decode_gif_frames(encode_gif_animated(frames, 8, 8, pal))
    inter = decode_gif_frames(
        encode_gif_animated(frames, 8, 8, pal, interlace=True)
    )
    assert inter == plain


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


# ------------------------------------------------------------ animation --


def _anim_roundtrip(frames, w, h, pal, disposals=None, transparent=None):
    from pasardassist_spark.operators.gifcodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    payload = encode_gif_animated(
        frames, w, h, pal, disposals=disposals, transparent_idx=transparent
    )
    assert sniff_gif(payload)
    return decode_gif_frames(payload)


def test_animated_keep_disposal_composites_subrectangles():
    """Frame 2 paints a 2x2 sub-rectangle at (1,1); with keep disposal the
    composited canvas shows frame 1 everywhere else."""
    pal = _pal_identity()
    base = bytes([10] * 16)  # 4x4 of index 10
    patch = bytes([20] * 4)  # 2x2 of index 20
    w, h, frames = _anim_roundtrip(
        [(0, 0, 4, 4, base), (1, 1, 2, 2, patch)], 4, 4, pal
    )
    assert (w, h, len(frames)) == (4, 4, 2)
    c10 = pal[30:33]
    c20 = pal[60:63]
    f1 = frames[0].pixels
    assert f1 == c10 * 16
    f2 = frames[1].pixels
    for y in range(4):
        for x in range(4):
            want = c20 if (1 <= x <= 2 and 1 <= y <= 2) else c10
            assert f2[3 * (y * 4 + x) : 3 * (y * 4 + x) + 3] == want


def test_animated_restore_to_background_disposal():
    """Disposal 2 on frame 1 restores its rectangle to the background color
    before frame 2 is drawn."""
    from pasardassist_spark.operators.gifcodec import decode_gif_frames
    import struct as _s

    pal = _pal_identity()
    # background index 0 -> palette color (0, 29, 58)
    frames = [(0, 0, 4, 4, bytes([10] * 16)), (0, 0, 1, 1, bytes([20]))]
    from pasardassist_spark.operators.gifcodec import encode_gif_animated

    payload = encode_gif_animated(frames, 4, 4, pal, disposals=[2, 1])
    w, h, decoded = decode_gif_frames(payload)
    bg = bytes(pal[0:3])
    c20 = pal[60:63]
    f2 = decoded[1].pixels
    assert f2[0:3] == c20                 # frame-2 pixel wins at (0,0)
    assert f2[3:6] == bg                  # rest of the frame-1 rect is bg
    assert f2[-3:] == bg


def test_animated_restore_to_previous_disposal():
    """Disposal 3 on frame 2 restores frame 1's canvas before frame 3."""
    pal = _pal_identity()
    frames = [
        (0, 0, 4, 4, bytes([10] * 16)),
        (0, 0, 4, 4, bytes([20] * 16)),
        (0, 0, 1, 1, bytes([30])),
    ]
    w, h, decoded = _anim_roundtrip(frames, 4, 4, pal, disposals=[1, 3, 1])
    c10, c30 = pal[30:33], pal[90:93]
    f3 = decoded[2].pixels
    assert f3[0:3] == c30
    assert f3[3:6] == c10  # frame 2's paint was undone


def test_animated_transparency_leaves_canvas():
    """Transparent pixels in frame 2 keep frame 1's colors."""
    pal = _pal_identity()
    frames = [
        (0, 0, 2, 2, bytes([10, 10, 10, 10])),
        (0, 0, 2, 2, bytes([99, 20, 99, 20])),  # 99 = transparent
    ]
    w, h, decoded = _anim_roundtrip(frames, 2, 2, pal, transparent=99)
    c10, c20 = pal[30:33], pal[60:63]
    f2 = decoded[1].pixels
    assert f2[0:3] == c10 and f2[6:9] == c10   # transparent -> previous
    assert f2[3:6] == c20 and f2[9:12] == c20


def test_animated_single_frame_matches_static_decoder():
    pal = _pal_identity()
    idx = _indices(9, 7, seed=5)
    w, h, frames = _anim_roundtrip([(0, 0, 9, 7, idx)], 9, 7, pal)
    assert len(frames) == 1
    assert frames[0].pixels == decode_gif(encode_gif(idx, 9, 7, pal)).pixels


def test_animated_error_contracts():
    from pasardassist_spark.operators.gifcodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    pal = _pal_identity()
    payload = encode_gif_animated([(0, 0, 4, 4, bytes([1] * 16))], 4, 4, pal)
    for cut in (5, 12, 400, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_gif_frames(payload[:cut])
    # frame rectangle exceeding the canvas
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif_frames(
            encode_gif_animated([(2, 2, 4, 4, bytes([1] * 16))], 4, 4, pal)
        )
