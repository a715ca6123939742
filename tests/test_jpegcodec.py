"""Baseline-JPEG codec (operators/jpegcodec.py): bit-exact roundtrips on
the DC-only fixture family, an independent-reference differential that
certifies the Huffman/bitstream layer on random rasters (any entropy
bug changes a coefficient and the pixel equality breaks), restart-marker
equivalence, and the loud unsupported-variant seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pasardassist_spark.operators import jpegcodec as J
from pasardassist_spark.operators.imagecodec import Raster, decode, sniff_format

Q16 = np.full((8, 8), 16, dtype=np.int32)


def block_constant(w: int, h: int, seed: int) -> np.ndarray:
    bx = np.arange((w + 7) // 8, dtype=np.int64) * 19
    by = np.arange((h + 7) // 8, dtype=np.int64) * 31
    blocks = (2 * ((by[:, None] + bx[None, :] + seed) % 128)).astype(np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]


@pytest.mark.parametrize(
    "w,h,seed,sub,ri",
    [
        (8, 8, 0, "4:4:4", 0),
        (20, 13, 3, "4:2:0", 2),
        (33, 17, 7, "4:2:0", 1),
        (57, 47, 11, "4:4:4", 3),
        (4, 4, 255, "4:2:0", 0),
    ],
)
def test_dc_only_color_roundtrip_exact(w, h, seed, sub, ri):
    v = block_constant(w, h, seed)
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    p = J.encode_jpeg(
        Raster(w, h, 3, rgb.tobytes()),
        subsampling=sub,
        restart_interval=ri,
        quant_luma=Q16,
        quant_chroma=Q16,
    )
    r = J.decode_jpeg(p)
    assert (r.width, r.height, r.channels) == (w, h, 3)
    assert np.array_equal(
        np.frombuffer(r.pixels, dtype=np.uint8).reshape(h, w, 3), rgb
    )


def test_grayscale_single_component():
    v = block_constant(24, 16, 5)
    p = J.encode_jpeg(Raster(24, 16, 1, v.tobytes()), quant_luma=Q16)
    r = J.decode_jpeg(p)
    assert r.channels == 1
    assert np.array_equal(
        np.frombuffer(r.pixels, dtype=np.uint8).reshape(16, 24), v
    )


def _reference_decode_444(img: np.ndarray, ql, qc) -> np.ndarray:
    """Independent pipeline: same published math (FDCT/quant/dequant/IDCT/
    color), written from the formulas rather than through the codec's
    entropy layer. Equality with decode(encode(img)) certifies that the
    Huffman encode->decode recovers every quantized coefficient exactly."""
    h, w = img.shape[:2]
    ycc = J._to_ycbcr(img.astype(np.float64))
    planes = [np.rint(ycc[..., i]).clip(0, 255) for i in range(3)]
    out = []
    for i, plane in enumerate(planes):
        q = ql if i == 0 else qc
        p = np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")
        hh, ww = p.shape
        blk = (p - 128.0).reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        coef = np.rint((J._D @ blk @ J._D.T) / q)
        rec = J._D.T @ (coef * q) @ J._D + 128.0
        out.append(
            rec.transpose(0, 2, 1, 3).reshape(hh, ww)[:h, :w]
        )
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.rint(np.stack([r, g, b], axis=-1)).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("seed,w,h", [(1, 24, 16), (2, 17, 9), (3, 40, 33)])
def test_random_image_equals_independent_reference(seed, w, h):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    p = J.encode_jpeg(Raster(w, h, 3, img.tobytes()), subsampling="4:4:4")
    got = np.frombuffer(J.decode_jpeg(p).pixels, dtype=np.uint8).reshape(h, w, 3)
    want = _reference_decode_444(img, J.QUANT_LUMA, J.QUANT_CHROMA)
    assert np.array_equal(got, want)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    base = J.decode_jpeg(
        J.encode_jpeg(Raster(40, 24, 3, img.tobytes()), subsampling="4:2:0")
    )
    for ri in (1, 2, 5):
        r = J.decode_jpeg(
            J.encode_jpeg(
                Raster(40, 24, 3, img.tobytes()),
                subsampling="4:2:0",
                restart_interval=ri,
            )
        )
        assert r.pixels == base.pixels


def test_420_chroma_upsampling_shape_and_flat_color():
    # a flat saturated color survives 4:2:0 exactly (chroma constant)
    img = np.zeros((12, 20, 3), dtype=np.uint8)
    img[..., 0] = 200
    img[..., 1] = 40
    img[..., 2] = 96
    p = J.encode_jpeg(Raster(20, 12, 3, img.tobytes()), subsampling="4:2:0")
    got = np.frombuffer(J.decode_jpeg(p).pixels, dtype=np.uint8).reshape(12, 20, 3)
    # flat image: every pixel identical; value within quantized-DC error
    assert (got == got[0, 0]).all()
    assert np.abs(got[0, 0].astype(int) - img[0, 0].astype(int)).max() <= 8


def test_sniff_and_dispatch():
    v = block_constant(8, 8, 1)
    p = J.encode_jpeg(Raster(8, 8, 1, v.tobytes()), quant_luma=Q16)
    assert sniff_format(p) == "jpeg"
    r = decode(p)
    assert (r.width, r.height, r.channels) == (8, 8, 1)


def test_lossless_and_arithmetic_raise_by_name():
    v = block_constant(8, 8, 1)
    p = bytearray(J.encode_jpeg(Raster(8, 8, 1, v.tobytes())))
    i = p.find(b"\xff\xc0")
    assert i > 0
    for marker, word in ((0xC3, "lossless"), (0xC9, "arithmetic")):
        p2 = bytearray(p)
        p2[i + 1] = marker
        with pytest.raises(NotImplementedError, match=word):
            J.decode_jpeg(bytes(p2))


# --------------------------------------------------- progressive (SOF2)


@pytest.mark.parametrize(
    "w,h,seed,sub,ri",
    [(20, 13, 3, "4:2:0", 0), (33, 17, 7, "4:4:4", 2), (8, 8, 0, "4:2:0", 1)],
)
def test_progressive_dc_only_roundtrip_exact(w, h, seed, sub, ri):
    v = block_constant(w, h, seed)
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    p = J.encode_jpeg_progressive(
        Raster(w, h, 3, rgb.tobytes()), subsampling=sub, restart_interval=ri,
        quant_luma=Q16, quant_chroma=Q16,
    )
    assert p[p.find(b"\xff\xc2") + 1] == 0xC2  # genuinely SOF2
    got = np.frombuffer(J.decode_jpeg(p).pixels, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, rgb)


@pytest.mark.parametrize(
    "seed,w,h,sub,ri",
    [
        (1, 24, 16, "4:4:4", 0),
        (2, 17, 9, "4:4:4", 0),
        (3, 40, 33, "4:2:0", 0),
        (4, 32, 24, "4:2:0", 3),
        (5, 23, 31, "4:4:4", 2),
    ],
)
def test_progressive_equals_sequential_on_random(seed, w, h, sub, ri):
    """The strongest differential: SOF2's multi-scan accumulation (DC
    successive approximation, AC spectral bands with EOB runs, AC bit
    refinement, per-scan restarts) must land the IDENTICAL quantized
    coefficients the single sequential scan carries — so the decoded
    pixels must be byte-equal. Any entropy bug in any scan kind breaks
    this."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    rast = Raster(w, h, 3, img.tobytes())
    seq = J.decode_jpeg(J.encode_jpeg(rast, subsampling=sub))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(rast, subsampling=sub, restart_interval=ri)
    )
    assert seq.pixels == prog.pixels


def test_progressive_grayscale_exact():
    v = block_constant(24, 16, 5)
    p = J.encode_jpeg_progressive(Raster(24, 16, 1, v.tobytes()), quant_luma=Q16)
    r = J.decode_jpeg(p)
    assert r.channels == 1 and r.pixels == v.tobytes()


def test_progressive_truncated_mid_scan_raises():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p = J.encode_jpeg_progressive(Raster(16, 16, 3, img.tobytes()))
    with pytest.raises(ValueError):
        J.decode_jpeg(p[: int(len(p) * 0.6)])


def test_truncated_and_garbage_raise_valueerror():
    v = block_constant(16, 16, 2)
    p = J.encode_jpeg(Raster(16, 16, 1, v.tobytes()))
    with pytest.raises(ValueError):
        J.decode_jpeg(p[: len(p) // 2])
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 4)
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg at all")


def test_dimension_bomb_guard():
    # a forged SOF0 with absurd dims must hit the shared pixel cap
    v = block_constant(8, 8, 3)
    p = bytearray(J.encode_jpeg(Raster(8, 8, 1, v.tobytes()), quant_luma=Q16))
    i = p.find(b"\xff\xc0")
    struct.pack_into(">HH", p, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="decompression-bomb"):
        J.decode_jpeg(bytes(p))


def test_zigzag_is_the_published_order():
    # spot-check the generated scan against the spec's first/last entries
    zz = J.ZIGZAG
    assert list(zz[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(zz[-6:]) == [54, 47, 55, 62, 63, 63] or list(zz[-6:]) == [
        61, 54, 47, 55, 62, 63,
    ]
    assert sorted(zz.tolist()) == list(range(64))


# ------------------------------------------------ MJPEG (AVI composition)


def test_mjpeg_avi_roundtrip_exact():
    from pasardassist_spark.operators import videocodec as V

    frames = [
        Raster(20, 13, 3, np.repeat(
            block_constant(20, 13, s)[:, :, None], 3, axis=2
        ).tobytes())
        for s in (1, 18, 35)
    ]
    p = V.encode_avi(
        frames, codec="mjpg",
        jpeg_opts=dict(
            subsampling="4:2:0", restart_interval=2,
            quant_luma=Q16, quant_chroma=Q16,
        ),
    )
    vid = V.decode_avi(p)
    assert (vid.width, vid.height, len(vid.frames)) == (20, 13, 3)
    for got, want in zip(vid.frames, frames):
        assert got.pixels == want.pixels


def test_mjpeg_lossy_frames_decode_consistently():
    """Random frames through default tables: the AVI route must produce
    byte-identical rasters to decoding each embedded JPEG directly."""
    from pasardassist_spark.operators import videocodec as V

    rng = np.random.RandomState(3)
    frames = [
        Raster(24, 16, 3, rng.randint(0, 256, (16, 24, 3)).astype(np.uint8).tobytes())
        for _ in range(2)
    ]
    p = V.encode_avi(frames, codec="mjpg")
    vid = V.decode_avi(p)
    direct = [J.decode_jpeg(J.encode_jpeg(f)) for f in frames]
    assert [f.pixels for f in vid.frames] == [f.pixels for f in direct]


def test_h264_fourcc_raises_at_the_ffmpeg_seam():
    from pasardassist_spark.operators import videocodec as V

    frames = [Raster(8, 8, 3, bytes(8 * 8 * 3))]
    p = bytearray(V.encode_avi(frames, codec="mjpg"))
    i = p.find(b"strf")
    j = p.find(b"MJPG", i)  # biCompression inside strf (strh precedes i)
    p[j : j + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="0x34363248"):
        V.decode_avi(bytes(p))


def test_dib_avi_still_roundtrips():
    from pasardassist_spark.operators import videocodec as V

    frames = [
        Raster(10, 6, 3, np.arange(10 * 6 * 3, dtype=np.uint8).tobytes()),
        Raster(10, 6, 3, (np.arange(10 * 6 * 3, dtype=np.uint8) * 3).tobytes()),
    ]
    vid = V.decode_avi(V.encode_avi(frames, codec="dib"))
    assert [f.pixels for f in vid.frames] == [f.pixels for f in frames]
