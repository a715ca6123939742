"""Property-based tests (hypothesis) for the round-15 parser surface:
every new codec path gets an adversarial generator, not just the
fixture-shaped inputs the driver rotation exercises."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    key=st.binary(min_size=4, max_size=56),
    iv=st.binary(min_size=8, max_size=8),
    data=st.binary(min_size=0, max_size=300),
)
def test_blowfish_cfb8_roundtrip_any_key(key, iv, data):
    from pasardassist_spark.operators.blowfish import (
        _pure_cfb8,
    )

    ct = _pure_cfb8(key, iv, data, encrypt=True)
    assert len(ct) == len(data)
    assert _pure_cfb8(key, iv, ct, encrypt=False) == data
    if data:
        assert ct != data or len(data) < 8  # keystream really applied


@settings(max_examples=60, deadline=None)
@given(rate=st.integers(min_value=1, max_value=2**32 - 1))
def test_extended80_roundtrips_any_integer_rate(rate):
    from pasardassist_spark.operators.aiffmeta import (
        _read_extended80,
        _write_extended80,
    )

    assert _read_extended80(_write_extended80(float(rate))) == float(rate)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_id3_unsync_escape_remove_inverse(data):
    from pasardassist_spark.operators.id3 import (
        _unsync_escape,
        _unsync_remove,
    )

    escaped = _unsync_escape(data)
    # the point of unsync: no FALSE FRAME SYNC (FF followed by 111xxxxx)
    # survives escaping — an inserted 0x00 after FF is the escape itself
    for i in range(len(escaped) - 1):
        if escaped[i] == 0xFF:
            assert escaped[i + 1] & 0xE0 != 0xE0
    assert _unsync_remove(escaped) == data


@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(min_value=1, max_value=12),
    size=st.integers(min_value=30, max_value=400),
    layer=st.sampled_from([1, 2, 3]),
)
def test_mp3_free_format_recovers_any_fixed_size(n_frames, size, layer):
    from pasardassist_spark.operators.mp3meta import encode_mp3, parse_mp3

    p = encode_mp3(
        version="1", sample_rate=44100, layer=layer,
        n_frames=n_frames, free_frame_size=size,
    )
    m = parse_mp3(p)
    assert m["n_frames"] == n_frames
    assert m["bitrate_kbps"] is None and m["layer"] == layer


@settings(max_examples=20, deadline=None)
@given(
    durs=st.lists(
        st.integers(min_value=0, max_value=500000), min_size=1, max_size=3
    ),
    n_fragments=st.integers(min_value=1, max_value=4),
    rich=st.booleans(),
)
def test_fmp4_duration_recovery_any_split(durs, n_fragments, rich):
    from pasardassist_spark.operators.mp4meta import (
        encode_fmp4_meta,
        parse_mp4_meta,
    )

    tracks = [
        (k + 1, "vide", "avc1", 64, 48, 30000, d)
        for k, d in enumerate(durs)
    ]
    p = encode_fmp4_meta(
        "dash", 1000, 777, tracks, n_fragments=n_fragments, rich_runs=rich
    )
    m = parse_mp4_meta(p)
    assert [t.duration_ms for t in m.tracks] == [
        d * 1000 // 30000 for d in durs
    ]


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=20),
    bpp=st.sampled_from([1, 4, 8]),
    rle=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_indexed_roundtrip_any_raster(w, h, bpp, rle, seed):
    import numpy as np

    from pasardassist_spark.operators import imagecodec as C

    if rle and bpp != 8:
        rle = False
    rng = np.random.default_rng(seed)
    ncol = min(1 << bpp, 9)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (h, w))
    r = C.Raster(w, h, 3, pal[idx].astype(np.uint8).tobytes())
    # palette dedup may merge identical colors; compare decoded PIXELS
    assert C.decode_bmp(C.encode_bmp_indexed(r, bpp, rle=rle)).pixels == (
        r.pixels
    )


@settings(max_examples=40, deadline=None)
@given(
    num=st.integers(min_value=1, max_value=10000),
    unit=st.sampled_from(["px", "pt", "pc", "in", "cm", "mm"]),
)
def test_svg_length_resolution_formula(num, unit):
    from pasardassist_spark.operators.svgmeta import (
        _UNIT_PX,
        encode_svg,
        parse_svg_meta,
    )

    m = parse_svg_meta(encode_svg(width=f"{num}{unit}", height="1px"))
    assert m.width_px == round(num * _UNIT_PX[unit], 2)


@settings(max_examples=20, deadline=None)
@given(
    entries=st.lists(
        st.tuples(
            st.sampled_from([16, 24, 32, 48, 64, 128, 256]),
            st.sampled_from([1, 4, 8, 24, 32]),
            st.booleans(),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_ico_any_directory_roundtrips(entries):
    from pasardassist_spark.operators.icometa import (
        encode_ico,
        parse_ico_meta,
    )

    spec = [
        (s, s, 32 if png else bpp, "png" if png else "dib")
        for s, bpp, png in entries
    ]
    m = parse_ico_meta(encode_ico(spec))
    assert m.n_entries == len(spec)
    for (s, _h, bpp, fmt), e in zip(spec, m.entries):
        assert (e.width, e.height, e.bpp, e.fmt) == (s, s, bpp, fmt)
