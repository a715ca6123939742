"""MPEG frame-header walk (operators/mp3meta.py) and the round-14
ID3v2 flag-byte guards (ADVICE r13)."""

import pytest

from pasardassist_spark.operators.id3 import (
    encode_id3v2,
    id3_tag_span,
    parse_id3,
)
from pasardassist_spark.operators.mp3meta import encode_mp3, parse_mp3


def test_cbr_all_versions_and_modes():
    for version, sr, spf in [("1", 44100, 1152), ("2", 24000, 576),
                             ("2.5", 8000, 576)]:
        for mode in ("stereo", "joint", "dual", "mono"):
            m = parse_mp3(
                encode_mp3(version=version, sample_rate=sr, mode=mode,
                           n_frames=9, bitrate=64)
            )
            assert m["version"] == version
            assert m["sample_rate"] == sr
            assert m["mode"] == mode
            assert m["n_frames"] == 9
            assert m["duration_us"] == 9 * spf * 1_000_000 // sr
            assert m["bitrate_kbps"] == 64
            assert m["vbr_method"] == "none"
            assert m["declared_frames"] is None


@pytest.mark.parametrize("vbr", ["xing", "vbri"])
@pytest.mark.parametrize("version,sr", [("1", 44100), ("2", 22050)])
@pytest.mark.parametrize("mode", ["stereo", "mono"])
def test_vbr_headers_both_locations(vbr, version, sr, mode):
    """Xing offset depends on (version, mono) side-info size; VBRI is
    fixed — all four geometries must locate."""
    m = parse_mp3(
        encode_mp3(version=version, sample_rate=sr, mode=mode,
                   n_frames=11, vbr=vbr)
    )
    assert m["vbr_method"] == vbr
    assert m["declared_frames"] == 11 == m["n_frames"]
    assert m["bitrate_kbps"] is None  # bitrates cycle


def test_tag_skips():
    tag = encode_id3v2(version=3, encoding=1, frames={"TIT2": "t"})
    payload = encode_mp3(n_frames=5, id3_tag=tag, id3v1=True)
    m = parse_mp3(payload)
    assert m["n_frames"] == 5
    # the ID3v2 span helper agrees with the tag writer
    assert id3_tag_span(payload) == len(tag)
    assert id3_tag_span(b"no tag here") == 0


def test_lost_sync_and_truncation():
    good = encode_mp3(n_frames=3)
    with pytest.raises(ValueError, match="trailing bytes"):
        parse_mp3(good[:-10])
    with pytest.raises(ValueError, match="sync"):
        parse_mp3(good[:200] + b"\x00garbage" + good[200:])
    with pytest.raises(ValueError, match="no audio frames"):
        parse_mp3(encode_id3v2(version=4, encoding=3, frames={"TIT2": "x"}))


def test_mid_stream_parameter_change_rejected():
    a = encode_mp3(version="1", n_frames=2, bitrate=64)
    b = encode_mp3(version="1", sample_rate=48000, n_frames=2, bitrate=64)
    with pytest.raises(ValueError, match="changed mid-stream"):
        parse_mp3(a + b)


def test_free_format_walks_by_sync_scan():
    """r15: bitrate index 0 = free format; the fixed frame size is
    recovered from the distance between consistent syncwords and
    bitrate_kbps reads None."""
    p = encode_mp3(
        version="1", sample_rate=44100, n_frames=7,
        free_frame_size=137, id3v1=True,
    )
    m = parse_mp3(p)
    assert m["n_frames"] == 7 and m["bitrate_kbps"] is None
    assert m["duration_us"] == 7 * 1152 * 1_000_000 // 44100
    # bad index 15 is a ValueError (malformed), not a named seam
    payload = bytearray(encode_mp3(n_frames=2))
    bad = bytes(payload[:2]) + bytes([(payload[2] & 0x0F) | 0xF0]) + bytes(
        payload[3:]
    )
    with pytest.raises(ValueError, match="bitrate index 15"):
        parse_mp3(bad)


def test_free_format_single_frame_runs_to_end():
    p = encode_mp3(n_frames=1, free_frame_size=200)
    m = parse_mp3(p)
    assert m["n_frames"] == 1 and m["bitrate_kbps"] is None


@pytest.mark.parametrize("layer", [1, 2])
@pytest.mark.parametrize("version,sr", [("1", 44100), ("2", 24000), ("2.5", 8000)])
def test_layers_one_and_two_walk(layer, version, sr):
    """r15: Layer I (4-byte slots, 384 samples/frame) and Layer II
    (coef 144, 1152 samples at EVERY version) walk end-to-end with
    their own bitrate tables; duration uses the layer's sample count."""
    p = encode_mp3(
        version=version, sample_rate=sr, layer=layer,
        n_frames=9, bitrate=96, mode="mono",
    )
    m = parse_mp3(p)
    assert m["layer"] == layer and m["n_frames"] == 9
    spf = 384 if layer == 1 else 1152
    assert m["duration_us"] == 9 * spf * 1_000_000 // sr
    assert m["bitrate_kbps"] == 96
    assert m["vbr_method"] == "none"


def test_layer_one_padding_is_one_slot():
    """Layer I padding adds a 4-byte SLOT, not a single byte."""
    from pasardassist_spark.operators.mp3meta import _frame_len

    base = _frame_len("1", 1, 96, 44100, 0)
    assert _frame_len("1", 1, 96, 44100, 1) == base + 4
    assert _frame_len("1", 3, 96, 44100, 1) == _frame_len("1", 3, 96, 44100, 0) + 1


def test_mid_stream_layer_change_raises():
    a = encode_mp3(n_frames=1, layer=2, bitrate=96)
    b = encode_mp3(n_frames=1, layer=3, bitrate=96)
    with pytest.raises(ValueError, match="changed mid-stream"):
        parse_mp3(a + b)


def test_vbr_header_rejected_outside_layer3():
    with pytest.raises(ValueError, match="Layer III conventions"):
        encode_mp3(n_frames=4, layer=2, vbr="xing")


def test_info_header_is_cbr_spelling():
    payload = bytearray(encode_mp3(n_frames=6, vbr="xing",
                                   vbr_bitrates=(96,)))
    payload[payload.index(b"Xing"):payload.index(b"Xing") + 4] = b"Info"
    m = parse_mp3(bytes(payload))
    assert m["vbr_method"] == "info"
    assert m["bitrate_kbps"] == 96  # single bitrate → nominal kept


# -------------------------------------------- ID3 flag guards (ADVICE) ---


def _flagged_tag(flag: int) -> bytes:
    tag = bytearray(encode_id3v2(version=4, encoding=3,
                                 frames={"TIT2": "x"}))
    tag[5] |= flag
    return bytes(tag)


def test_id3_tag_level_flags_now_read():
    """r15: the v2.4 tag-level unsync announce bit (frames carry their
    own 0x02) and a hand-flipped extended-header bit with no actual
    header both still need valid structure — the announce bit alone is
    informational and parses clean."""
    got = parse_id3(_flagged_tag(0x80))
    assert got["TIT2"] == "x"


def test_id3_frame_format_flags_raise_by_name():
    tag = bytearray(encode_id3v2(version=4, encoding=3,
                                 frames={"TIT2": "x"}))
    # frame header starts at 10: id(4) + size(4) + status + FORMAT
    tag[19] = 0x08  # compression
    with pytest.raises(NotImplementedError, match="format flags"):
        parse_id3(bytes(tag))


def test_id3_footer_flag_extends_span():
    tag = bytearray(encode_id3v2(version=4, encoding=3,
                                 frames={"TIT2": "x"}))
    base = id3_tag_span(bytes(tag))
    tag[5] |= 0x10
    assert id3_tag_span(bytes(tag) + bytes(10)) == base + 10


# ------------------------------------------- unsync + ext header (r15) ---


@pytest.mark.parametrize("version,encoding", [(3, 0), (3, 1), (4, 1), (4, 3)])
@pytest.mark.parametrize("ext", [False, True])
def test_id3_unsync_roundtrip(version, encoding, ext):
    """Tag-level (v2.3) and frame-level (v2.4) unsynchronisation must
    roundtrip — including values whose encodings contain real 0xFF
    bytes (latin-1 'y-diaeresis' = FF, the UTF-16 BOM FF FE, and FF
    followed by 00 in UTF-16LE), with and without an extended header
    in front of the first frame."""
    frames = {"TIT2": "naïve ÿ title", "TPE1": "artistÿ"}
    if encoding == 0:
        frames = {k: v.replace("ï", "i") for k, v in frames.items()}
    tag = encode_id3v2(
        version=version, encoding=encoding, frames=frames,
        unsync=True, extended_header=ext,
    )
    assert tag[5] & 0x80
    if ext:
        assert tag[5] & 0x40
    got = parse_id3(tag)
    assert got["version"] == version
    for k, v in frames.items():
        assert got[k] == v, (k, got[k], v)
    # the stored tag really was escaped: raw body contains FF 00 pairs
    if encoding == 1:
        assert b"\xff\x00" in tag


def test_id3_extended_header_skipped_both_versions():
    for version in (3, 4):
        tag = encode_id3v2(
            version=version, encoding=1,
            frames={"TALB": "album"}, extended_header=True,
        )
        got = parse_id3(tag)
        assert got["TALB"] == "album"


def test_id3_v24_data_length_indicator():
    """Format flag 0x01 prepends a syncsafe true-length; the body must
    be read past it."""
    from pasardassist_spark.operators.id3 import _syncsafe

    tag = bytearray(encode_id3v2(version=4, encoding=3,
                                 frames={"TIT2": "x"}))
    # frame at 10: insert 4-byte prefix into body, bump sizes
    body_at = 20
    old_size = tag[13 + 4]  # last syncsafe byte of 2-byte body
    payload = bytes(tag[body_at : body_at + old_size])
    new_body = _syncsafe(old_size) + payload
    out = (
        bytes(tag[:10])
        + tag[10:14]
        + _syncsafe(len(new_body))
        + bytes([0, 0x01])
        + new_body
    )
    out = out[:6] + _syncsafe(len(out) - 10) + out[10:]
    got = parse_id3(out)
    assert got["TIT2"] == "x"


def test_id3_v23_compression_still_raises():
    tag = bytearray(encode_id3v2(version=3, encoding=1,
                                 frames={"TIT2": "x"}))
    tag[19] = 0x80  # v2.3 compression bit
    with pytest.raises(NotImplementedError, match="format flags"):
        parse_id3(bytes(tag))


def test_id3_v22_roundtrip_and_mapping():
    """r15: ID3v2.2 — 3-char frame ids, 3-byte big-endian sizes, no
    flag bytes — reads through the v2.3+ name mapping."""
    tag = encode_id3v2(version=2, encoding=1, frames={
        "TIT2": "Old Rip", "TPE1": "Artist ÿ", "TALB": "Al",
        "TYER": "1999", "TRCK": "3/12",
    })
    assert tag[3] == 2 and b"TT2" in tag and b"TIT2" not in tag
    m = parse_id3(tag)
    assert m["version"] == 2 and m["TIT2"] == "Old Rip"
    assert m["TPE1"] == "Artist ÿ" and m["TYER"] == "1999"
    # latin-1 path too
    m0 = parse_id3(encode_id3v2(version=2, encoding=0,
                                frames={"TIT2": "plain"}))
    assert m0["TIT2"] == "plain"


def test_id3_v22_compression_bit_raises():
    tag = bytearray(encode_id3v2(version=2, encoding=0,
                                 frames={"TIT2": "x"}))
    tag[5] |= 0x40  # the never-defined v2.2 compression announce bit
    with pytest.raises(NotImplementedError, match="compression bit"):
        parse_id3(bytes(tag))


def test_id3_v22_truncated_frame_raises():
    tag = encode_id3v2(version=2, encoding=0, frames={"TIT2": "hello"},
                       padding=0)
    cut = bytearray(tag[:-3])
    # keep the declared tag size honest so the frame walk sees the cut
    from pasardassist_spark.operators.id3 import _syncsafe

    cut[6:10] = _syncsafe(len(cut) - 10)
    with pytest.raises(ValueError, match="truncated ID3 frame"):
        parse_id3(bytes(cut))


def test_free_format_unstable_length_raises():
    """r16 (ADVICE): the recovered free-format frame length must be
    stable across consecutive frames; two runs with different sizes (or
    a sync-like bit pattern inside a frame payload) raise loudly instead
    of silently mis-counting frames."""
    a = encode_mp3(version="1", sample_rate=44100, n_frames=2,
                   free_frame_size=137)
    b = encode_mp3(version="1", sample_rate=44100, n_frames=2,
                   free_frame_size=150)
    with pytest.raises(ValueError, match="unstable"):
        parse_mp3(a + b)


def test_free_format_embedded_fake_sync_raises():
    """A header-consistent byte pattern INSIDE a frame payload used to
    mis-measure the frame and cascade into wrong n_frames; the 3-frame
    stability check turns that into a loud ValueError."""
    p = bytearray(
        encode_mp3(version="1", sample_rate=44100, n_frames=4,
                   free_frame_size=137)
    )
    # copy the real 4-byte header into the middle of frame 2's payload
    f2 = len(p) - 4 * 137  # frames are back-to-back, no tags
    p[f2 + 137 + 60 : f2 + 137 + 64] = p[:4]
    with pytest.raises(ValueError, match="unstable"):
        parse_mp3(bytes(p))
