"""Property shelf for the round-13 metadata parsers (EXIF, ID3, XML):
round-trips hold for arbitrary values, and arbitrary junk never hangs
or crashes with anything but ValueError — the malformed-input contract
a 100 TB crawl holds every parser to."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pasardassist_spark.operators import exif as EX
from pasardassist_spark.operators import id3 as ID3
from pasardassist_spark.operators.mojibake import fix_mojibake_text

_ascii_text = st.text(
    st.characters(min_codepoint=0x20, max_codepoint=0x7E), min_size=1, max_size=40
)


@settings(max_examples=80, deadline=None)
@given(
    bo=st.sampled_from(["II", "MM"]),
    make=_ascii_text,
    model=_ascii_text,
    orientation=st.integers(1, 8),
    deg=st.integers(0, 179),
    minute=st.integers(0, 59),
    sec_m=st.integers(0, 59999),
)
def test_exif_roundtrip_property(bo, make, model, orientation, deg, minute, sec_m):
    app1 = EX.encode_exif_app1(
        byte_order=bo,
        make=make,
        model=model,
        orientation=orientation,
        dt_original="2021:01:02 03:04:05",
        lat_ref="N",
        lat_dms=((deg % 90, 1), (minute, 1), (sec_m, 1000)),
        lon_ref="E",
        lon_dms=((deg, 1), (minute, 1), (sec_m, 1000)),
    )
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
    meta = EX.parse_exif(jpeg)
    assert meta["byte_order"] == bo
    assert meta["make"] == make and meta["model"] == model
    assert meta["orientation"] == orientation
    assert meta["lon_mas"] == deg * 3_600_000 + minute * 60_000 + sec_m


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_exif_junk_never_hangs(junk):
    try:
        EX.parse_exif(b"\xff\xd8" + junk)
    except ValueError:
        pass  # the only allowed failure mode


@settings(max_examples=80, deadline=None)
@given(
    version=st.sampled_from([3, 4]),
    title=_ascii_text,
    artist=_ascii_text,
    track=_ascii_text,
)
def test_id3_roundtrip_property(version, title, artist, track):
    enc = 0x01 if version == 3 else 0x03
    tag = ID3.encode_id3v2(
        version=version,
        encoding=enc,
        frames={"TIT2": title, "TPE1": artist, "TRCK": track},
    )
    meta = ID3.parse_id3(tag + b"\xff\xfb")
    assert meta["TIT2"] == title
    assert meta["TPE1"] == artist
    assert meta["TRCK"] == track


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_id3_junk_never_hangs(junk):
    try:
        ID3.parse_id3(b"ID3" + junk)
    except ValueError:
        pass
    except NotImplementedError:
        pass  # flag-gated layouts (unsync/extended header) raise by name


@settings(max_examples=120, deadline=None)
@given(
    text=st.text(
        st.characters(min_codepoint=0x20, max_codepoint=0x24FF),
        max_size=60,
    ),
    gens=st.integers(0, 3),
)
def test_mojibake_repair_inverts_property(text, gens):
    """For text that survives the corruption loop, repair restores it —
    unless the ORIGINAL is itself mojibake-shaped (its latin-1 bytes
    decode as UTF-8, the inherent ambiguity), in which case repair may
    legitimately keep walking; assert convergence instead."""
    s = text
    try:
        for _ in range(gens):
            s = s.encode("utf-8").decode("latin-1")
    except UnicodeDecodeError:
        return  # corruption not representable; nothing to assert
    if s == text:
        gens = 0  # identity corruption (pure ASCII): gens unobservable
    fixed, n = fix_mojibake_text(s)
    if n == gens:
        assert fixed == text
    else:
        # over-walk only happens when the original was already
        # mojibake-shaped: its own repair must make progress
        f2, n2 = fix_mojibake_text(text)
        assert n2 > 0 and n > gens
