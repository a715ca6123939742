"""WAV codec + dHash tests: known-byte fixtures, hand-built containers
with extra chunks, rejection paths, and the cross-format perceptual-dedup
property the mm_dhash_dedup query relies on."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators import audiocodec as A
from pasardassist_spark.operators import imagecodec as IC
from pasardassist_spark.operators.multimodal import dhash_raster, synth_raster


def test_wav_roundtrip_mono():
    audio = A.PcmAudio(8000, 1, [0, 100, -100, 32767, -32768, 1])
    out = A.decode_wav(A.encode_wav(audio))
    assert out == audio


def test_wav_roundtrip_stereo():
    audio = A.PcmAudio(44100, 2, [1, -1, 2, -2, 3, -3, 4, -4])
    out = A.decode_wav(A.encode_wav(audio))
    assert out == audio


def test_wav_extra_chunks_and_alignment():
    """Decoder must walk past unknown chunks (LIST) and honor the odd-size
    word-alignment pad."""
    base = A.encode_wav(A.PcmAudio(8000, 1, [5, -5, 7]))
    # splice a 3-byte (odd) LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    spliced = (
        base[:fmt_end]
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
        + base[fmt_end:]
    )
    # fix the RIFF size field
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert A.decode_wav(spliced) == A.PcmAudio(8000, 1, [5, -5, 7])


def test_wav_rejects_non_pcm_and_non_16bit():
    good = bytearray(A.encode_wav(A.PcmAudio(8000, 1, [1, 2])))
    bad_tag = bytearray(good)
    struct.pack_into("<H", bad_tag, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError):
        A.decode_wav(bytes(bad_tag))
    # 8-bit integer PCM decodes since r15; a depth outside 8/16/24/32
    # still raises by name
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 34, 12)
    with pytest.raises(NotImplementedError):
        A.decode_wav(bytes(bad_bits))
    with pytest.raises(ValueError):
        A.decode_wav(b"OggS not a wav")


def test_audio_features_known_values():
    # samples: [3, -2, 0, 4] -> sq_sum 9+4+0+16=29; crossings: 3*-2<0 (1),
    # -2*0 not <0, 0*4 not <0 -> 1
    f = A.extract_audio_features(A.PcmAudio(1000, 1, [3, -2, 0, 4]))
    assert f.sq_sum == 29
    assert f.zero_crossings == 1
    assert f.n_samples == 4
    assert f.duration_ms == 4


def test_dhash_stable_across_containers():
    """The same raster encoded as PPM, BMP, and PNG hashes identically —
    the pixels-not-bytes property; a content hash would differ."""
    w, h, px = synth_raster(17)
    r = IC.Raster(w, h, 3, px)
    ref = dhash_raster(w, h, 3, px)
    for payload in (IC.encode_ppm(r), IC.encode_bmp(r), IC.encode_png(r)):
        d = IC.decode(payload)
        assert dhash_raster(d.width, d.height, d.channels, d.pixels) == ref


def test_dhash_known_grid():
    """Hand-checkable 9x8 raster (no resampling): gray strictly increases
    left-to-right on every row, so every bit is 1 -> both halves all-ones."""
    px = bytes(x * 10 for y in range(8) for x in range(9))  # gray channel
    hi, lo = dhash_raster(9, 8, 1, px)
    assert hi == 0xFFFFFFFF and lo == 0xFFFFFFFF
    # strictly decreasing -> all zero
    px2 = bytes(80 - x * 10 for y in range(8) for x in range(9))
    assert dhash_raster(9, 8, 1, px2) == (0, 0)


def test_dhash_near_pairs_banding_is_lossless(spark):
    """The 4-band candidate join finds EVERY pair within Hamming distance
    3 (pigeonhole) — compare against the naive all-pairs popcount on a
    corpus with planted exact and near duplicates."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.multimodal import (
        attach_image_payload,
        dhash_images,
        dhash_near_pairs,
    )

    df = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    hashes = dhash_images(
        attach_image_payload(df, seed_mod=37, mark_corner=(5, 2))
    ).cache()
    got = {
        (r.id_a, r.id_b, r.dist) for r in dhash_near_pairs(hashes, 3).collect()
    }
    rows = hashes.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d = bin((a.dhash_hi ^ b.dhash_hi)).count("1") + bin(
                (a.dhash_lo ^ b.dhash_lo)
            ).count("1")
            if d <= 3:
                p = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id), d)
                want.add(p)
    assert got == want
    assert any(d > 0 for _, _, d in want), "corpus must contain near (not just exact) dups"
    hashes.unpersist()

    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_pairs(hashes, max_dist=4)


def test_audio_stage_matches_reference(spark):
    from pasardassist_spark.operators.multimodal import (
        audio_features,
        synth_wav_samples,
    )

    df = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    for doc_id in range(20):
        n, samples = synth_wav_samples(doc_id)
        r = rows[doc_id]
        assert r.n_samples == n
        assert r.sq_sum == sum(s * s for s in samples)
        assert r.zero_crossings == sum(
            1 for a, b in zip(samples, samples[1:]) if a * b < 0
        )


def test_avi_roundtrip_multiframe():
    from pasardassist_spark.operators import videocodec as V

    frames = [
        IC.Raster(3, 2, 3, bytes((i * 11 + f * 7) % 256 for i in range(18)))
        for f in range(5)
    ]
    payload = V.encode_avi(frames, fps=25)
    assert V.sniff_avi(payload)
    video = V.decode_avi(payload)
    assert (video.width, video.height, video.fps) == (3, 2, 25)
    assert video.frames == frames


def test_avi_stride_padding():
    """Width 3 -> 9-byte rows padded to 12: the DIB stride logic."""
    from pasardassist_spark.operators import videocodec as V

    r = IC.Raster(3, 3, 3, bytes(range(27)))
    assert V.decode_avi(V.encode_avi([r])).frames == [r]


def test_avi_rejects_compressed_and_garbage():
    import struct

    from pasardassist_spark.operators import videocodec as V

    payload = bytearray(V.encode_avi([IC.Raster(2, 2, 3, bytes(12))]))
    # strf biCompression lives 16 bytes into the BITMAPINFOHEADER
    off = payload.index(b"strf") + 8 + 16
    # inter-frame codecs stay at the ffmpeg seam (MJPG is supported now —
    # its frames route through jpegcodec, so DIB bytes under an MJPG tag
    # fail as malformed JPEG, tested below)
    struct.pack_into("<I", payload, off, struct.unpack("<I", b"H264")[0])
    with pytest.raises(NotImplementedError):
        V.decode_avi(bytes(payload))
    struct.pack_into("<I", payload, off, 0x47504A4D)  # 'MJPG'
    with pytest.raises(ValueError):  # frame chunk bytes are not a JPEG
        V.decode_avi(bytes(payload))
    with pytest.raises(ValueError):
        V.decode_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        V.decode_avi(b"not even riff")


def test_sample_frame_indices_even_grid():
    from pasardassist_spark.operators.videocodec import sample_frame_indices

    assert sample_frame_indices(8, 4) == [0, 2, 4, 6]
    assert sample_frame_indices(2, 4) == [0, 0, 1, 1]
    assert sample_frame_indices(1, 4) == [0, 0, 0, 0]
    with pytest.raises(ValueError):
        sample_frame_indices(0, 4)


def test_video_frames_compose_with_image_stages():
    """Sampled frames are ordinary Rasters: dHash and resize run on them
    unchanged — the composition the Raster normalization buys."""
    from pasardassist_spark.operators import videocodec as V
    from pasardassist_spark.operators.multimodal import synth_video_frames

    n, w, h, rasters = synth_video_frames(42)
    video = V.decode_avi(
        V.encode_avi([IC.Raster(w, h, 3, px) for px in rasters])
    )
    fr = video.frames[0]
    hi, lo = dhash_raster(fr.width, fr.height, fr.channels, fr.pixels)
    assert 0 <= hi <= 0xFFFFFFFF and 0 <= lo <= 0xFFFFFFFF
    small = IC.resize_nearest(fr, 4, 4)
    assert (small.width, small.height) == (4, 4)


def test_avi_audio_first_stream_order():
    """An AVI listing an audio strl BEFORE the video strl: the strf of the
    audio stream (a WAVEFORMATEX) must not be parsed as a video header,
    and frames are read from the VIDEO stream's index ('01db'), skipping
    the audio data chunks ('00wb')."""
    import struct

    from pasardassist_spark.operators import videocodec as V

    r = IC.Raster(2, 2, 3, bytes(range(12)))
    base = V.encode_avi([r], fps=10)

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    # audio stream: strh fccType 'auds' + 16-byte WAVEFORMATEX strf
    a_strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00\x00\x00\x00",
                         0, 0, 0, 0, 1, 8000, 0, 4, 8, 0, 2, 0, 0, 0, 0)
    a_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    audio_strl = lst(b"strl", chunk(b"strh", a_strh) + chunk(b"strf", a_strf))

    # rebuild: avih + audio strl + video strl, movi with audio + video chunks
    avih_body = base[base.index(b"avih") + 8 : base.index(b"avih") + 8 + 56]
    v_strl_start = base.index(b"strl") - 8  # inside hdrl LIST
    # extract the original video strl LIST (LIST size + 'strl' + content)
    lsize = struct.unpack_from("<I", base, v_strl_start + 4 - 8 + 8)[0]
    # simpler: rebuild video strl from scratch (mirror encode_avi)
    frame_bytes = ((2 * 3 + 3) // 4) * 4 * 2
    v_strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
                         1, 10, 0, 1, frame_bytes, 0, 0, 0, 0, 2, 2)
    v_strf = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    video_strl = lst(b"strl", chunk(b"strh", v_strh) + chunk(b"strf", v_strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih_body) + audio_strl + video_strl)
    dib = V._raster_to_dib(r)
    movi = lst(b"movi", chunk(b"00wb", b"\x01\x02\x03\x04") + chunk(b"01db", dib))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    video = V.decode_avi(payload)
    assert video.frames == [r]


def test_corrupt_png_falls_back_in_extract_features(spark):
    """A payload with a valid PNG magic but garbage inside must take the
    digest fallback, not kill the task (zlib/struct errors normalize to
    ValueError in imagecodec.decode)."""
    from pasardassist_spark.operators.multimodal import extract_features, fake_decode

    bad_png = IC.PNG_MAGIC + b"\x00\x00\x00\x0dIHDRgarbagegarb" + b"\xde\xad" * 8
    df = spark.createDataFrame(
        [(1, bytearray(bad_png), {"kind": "image/png", "size": len(bad_png)})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    rows = extract_features(df).collect()
    assert len(rows) == 1
    assert (rows[0].width, rows[0].height) == fake_decode(bytes(bad_png))


def test_energy_fingerprint_gain_invariance_and_sensitivity():
    """Uniform gain preserves every energy-delta bit; time-local content
    edits flip bits; too-short signals are rejected."""
    from pasardassist_spark.operators.audiocodec import energy_fingerprint

    base = [((i * 13) % 700) - 350 for i in range(200)]
    fp = energy_fingerprint(base)
    for gain in (2, 3, -1):
        assert energy_fingerprint([s * gain for s in base]) == fp
    # zero one frame's worth of samples: the local energy ordering changes
    edited = base[:100] + [0] * 7 + base[107:]
    assert energy_fingerprint(edited) != fp
    with pytest.raises(ValueError):
        energy_fingerprint([1] * 10)


def test_audio_fp_stage_collapses_volume_variants(spark):
    from pasardassist_spark.operators.multimodal import (
        audio_fingerprints,
        synth_wav_variant,
    )

    df = spark.range(0, 303).withColumnRenamed("id", "doc_id")  # 3 gains/seed
    rows = audio_fingerprints(df).collect()
    by_seed: dict[int, set] = {}
    for r in rows:
        seed, _gain, _ = synth_wav_variant(r.doc_id)
        by_seed.setdefault(seed, set()).add(r.fingerprint)
    assert len(by_seed) == 101
    assert all(len(v) == 1 for v in by_seed.values()), "gain broke grouping"


def test_video_fingerprint_collapses_seed_groups_and_orders_frames(spark):
    from pasardassist_spark.operators import videocodec as V
    from pasardassist_spark.operators.multimodal import (
        synth_video_frames,
        video_fingerprints,
    )

    df = spark.range(0, 180).withColumnRenamed("id", "doc_id")
    rows = video_fingerprints(df, seed_mod=89).collect()
    by_seed: dict[int, set] = {}
    for r in rows:
        sig = (r.n_frames, r.first_hi, r.first_lo, r.last_hi, r.last_lo)
        by_seed.setdefault(r.doc_id % 89, set()).add(sig)
    assert all(len(v) == 1 for v in by_seed.values()), "same clip, different sig"
    assert len({next(iter(v)) for v in by_seed.values()}) > 50, "signatures degenerate"

    # frame-order sensitivity: reversing a clip's frames flips the
    # bookends (first != last for clips whose ends differ)
    n, w, h, rasters = synth_video_frames(7)
    fwd = V.decode_avi(V.encode_avi([IC.Raster(w, h, 3, px) for px in rasters]))
    rev = V.decode_avi(V.encode_avi([IC.Raster(w, h, 3, px) for px in reversed(rasters)]))
    f0 = dhash_raster(w, h, 3, fwd.frames[0].pixels)
    r0 = dhash_raster(w, h, 3, rev.frames[0].pixels)
    assert f0 != r0


def test_float_wav_roundtrip_exact_both_widths():
    """IEEE-float WAV (format tag 3): s/32767.0 written as float32 or
    float64 must normalize back to the EXACT PCM16 integers (the ADVICE
    convention: clip, x32767, round half even)."""
    from pasardassist_spark.operators import audiocodec as A

    samples = [0, 1, -1, 32767, -32767, 12345, -20000, 7]
    for bits in (32, 64):
        p = A.encode_wav_float(A.PcmAudio(8000, 1, samples), bits=bits)
        got = A.decode_wav(p)
        assert got.samples == samples, bits
        assert (got.sample_rate, got.channels) == (8000, 1)


def test_float_wav_clips_out_of_range():
    import struct

    from pasardassist_spark.operators import audiocodec as A

    data = struct.pack("<4f", 2.0, -3.5, 0.5, -0.25)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    got = A.decode_wav(p).samples
    assert got[0] == 32767 and got[1] == -32767  # clipped
    assert got[2] == round(0.5 * 32767) and got[3] == round(-0.25 * 32767)


def test_wav_unsupported_tags_still_raise_by_name():
    import struct

    from pasardassist_spark.operators import audiocodec as A

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 2"):
        A.decode_wav(p)
    # float tag with an unsupported width
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="float WAV bit depth"):
        A.decode_wav(p)


# ------------------------------------------------------- G.711 / ADPCM --


def test_g711_canonical_values_and_ranges():
    from pasardassist_spark.operators.audiocodec import _ALAW_TABLE, _ULAW_TABLE

    # ITU G.711 invariants: mu-law 0xFF is +0 and 0x7F is -0; the
    # canonical full-scale magnitudes are 32124 (mu) and 32256 (A)
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert max(_ULAW_TABLE) == 32124 and min(_ULAW_TABLE) == -32124
    assert max(_ALAW_TABLE) == 32256 and min(_ALAW_TABLE) == -32256
    # A-law has no zero: the two smallest magnitudes are +-8
    assert 0 not in _ALAW_TABLE and 8 in _ALAW_TABLE and -8 in _ALAW_TABLE
    # each table hits 256 distinct codes -> <=256 distinct values with
    # exactly the two zero codes collapsing for mu-law
    assert len(set(_ULAW_TABLE)) == 255 and len(set(_ALAW_TABLE)) == 256


def test_g711_encode_decode_fixpoint_all_codes():
    """decode(encode(decode(c))) == decode(c) for every code: the
    compressor maps each decoded midpoint back into its own bin."""
    from pasardassist_spark.operators.audiocodec import (
        _ALAW_TABLE, _ULAW_TABLE, linear_to_alaw, linear_to_ulaw,
    )

    for c in range(256):
        assert _ULAW_TABLE[linear_to_ulaw(_ULAW_TABLE[c])] == _ULAW_TABLE[c]
        assert _ALAW_TABLE[linear_to_alaw(_ALAW_TABLE[c])] == _ALAW_TABLE[c]


def test_g711_quantization_error_bounded():
    from pasardassist_spark.operators.audiocodec import (
        _ALAW_TABLE, _ULAW_TABLE, linear_to_alaw, linear_to_ulaw,
    )

    for s in range(-32768, 32768, 97):
        for table, enc, full in (
            (_ULAW_TABLE, linear_to_ulaw, 32124),
            (_ALAW_TABLE, linear_to_alaw, 32256),
        ):
            got = table[enc(s)]
            # log companding: error <= half the local step (~mag/16 + bias)
            tol = max(abs(s), 256) / 16 + 40 + max(0, abs(s) - full)
            assert abs(got - s) <= tol, (s, got)


def test_g711_container_roundtrip_both_laws():
    from pasardassist_spark.operators.audiocodec import (
        _ALAW_TABLE, _ULAW_TABLE, decode_wav, encode_wav_g711,
    )

    codes = bytes((i * 13 + 5) % 256 for i in range(300))
    for law, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
        au = decode_wav(encode_wav_g711(codes, 8000, law))
        assert au.sample_rate == 8000 and au.channels == 1
        assert au.samples == [table[b] for b in codes]
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(codes, 8000, "mp3")


def test_ima_adpcm_single_block_matches_reference_fold():
    from pasardassist_spark.operators.audiocodec import (
        _ima_step, decode_wav, encode_wav_ima_adpcm,
    )

    nibs = bytes((i * 11 + 2) % 16 for i in range(200))
    pred, idx = 4321, 33
    au = decode_wav(encode_wav_ima_adpcm(nibs, 16000, pred, idx))
    want = [pred]
    p, ix = pred, idx
    for n in nibs:
        p, ix = _ima_step(n, p, ix)
        want.append(p)
    assert au.samples == want


def test_ima_adpcm_clamps_predictor_and_index():
    from pasardassist_spark.operators.audiocodec import _ima_step

    # maximum positive nibble (7) from near-max predictor clamps at 32767
    p, ix = _ima_step(7, 32700, 88)
    assert p == 32767 and ix == 88
    # maximum negative nibble (15) from near-min clamps at -32768
    p, ix = _ima_step(15, -32700, 88)
    assert p == -32768 and ix == 88
    # small nibbles walk the index down to the 0 floor
    p, ix = _ima_step(0, 0, 0)
    assert ix == 0


def test_ima_adpcm_encoder_roundtrip_tracks_signal():
    """The encoder/decoder pair share the _ima_step fold, so after the
    initial step-size adaptation the reconstruction tracks the signal
    within the local quantizer step."""
    import math

    from pasardassist_spark.operators.audiocodec import (
        decode_wav, encode_wav_ima_adpcm_pcm,
    )

    sig = [int(11000 * math.sin(i / 9) + 2500 * math.sin(i / 2.7))
           for i in range(2021)]
    au = decode_wav(encode_wav_ima_adpcm_pcm(sig, 16000, block_samples=505))
    assert au.samples[0] == sig[0]  # block headers carry exact samples
    errs = [abs(a - b) for a, b in zip(au.samples, sig)]
    assert max(errs[100:]) < 1500
    assert sum(errs) / len(errs) < 300
    # multi-block: every block boundary restarts from an exact sample
    for k in (505, 1010, 1515):
        assert au.samples[k] == sig[k]


def test_ima_adpcm_stereo_interleave():
    """Stereo blocks: 4-byte nibble groups alternate channels; decoded
    samples interleave L/R."""
    import struct

    from pasardassist_spark.operators.audiocodec import _ima_step, decode_wav

    # hand-build one stereo block: headers L=(100, 10), R=(-200, 20),
    # then one 8-byte group = 8 nibbles per channel
    nl = [1, 9, 3, 12, 5, 14, 7, 0]
    nr = [2, 10, 4, 11, 6, 13, 8, 15]
    body_l = bytes((nl[i] | (nl[i + 1] << 4)) for i in range(0, 8, 2))
    body_r = bytes((nr[i] | (nr[i + 1] << 4)) for i in range(0, 8, 2))
    block = (struct.pack("<hBB", 100, 10, 0) + struct.pack("<hBB", -200, 20, 0)
             + body_l + body_r)
    spb = 9
    fmt = struct.pack("<HHIIHHHH", 17, 2, 8000, 8000, len(block), 4, 2, spb)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(block)) + block)
    au = decode_wav(payload)
    assert au.channels == 2
    wl, p, ix = [100], 100, 10
    for n in nl:
        p, ix = _ima_step(n, p, ix)
        wl.append(p)
    wr, p, ix = [-200], -200, 20
    for n in nr:
        p, ix = _ima_step(n, p, ix)
        wr.append(p)
    want = [v for pair in zip(wl, wr) for v in pair]
    assert au.samples == want


def test_ima_adpcm_error_contracts():
    from pasardassist_spark.operators.audiocodec import (
        decode_wav, encode_wav_ima_adpcm,
    )

    with pytest.raises(ValueError, match="even"):
        encode_wav_ima_adpcm(bytes([1, 2, 3]), 8000, 0, 0)
    with pytest.raises(ValueError, match="header state"):
        encode_wav_ima_adpcm(bytes([1, 2]), 8000, 0, 89)
    # corrupt in-container index byte
    payload = bytearray(encode_wav_ima_adpcm(bytes([1, 2, 3, 4]), 8000, 7, 7))
    i = payload.index(b"data") + 8 + 2
    payload[i] = 90
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(payload))


def test_wav_integer_depths_roundtrip():
    """r15: 8-bit (unsigned, midpoint 128), 24-bit (packed signed LE),
    and 32-bit integer PCM all decode into the PCM16 domain; 24/32
    widened from PCM16 recover EXACTLY, 8-bit after quantization."""
    import random

    from pasardassist_spark.operators.audiocodec import (
        PcmAudio,
        decode_wav,
        encode_wav_depth,
    )

    rng = random.Random(7)
    samples = [rng.randrange(-32768, 32768) for _ in range(300)]
    for bits in (24, 32):
        got = decode_wav(encode_wav_depth(PcmAudio(44100, 2, samples), bits))
        assert got.samples == samples
    q8 = [(s >> 8) << 8 for s in samples]
    got = decode_wav(encode_wav_depth(PcmAudio(8000, 1, q8), 8))
    assert got.samples == q8
    # unsupported integer depth still raises by name
    import struct

    import pytest

    bad = bytearray(encode_wav_depth(PcmAudio(8000, 1, q8), 8))
    at = bad.find(b"fmt ")
    struct.pack_into("<H", bad, at + 8 + 14, 12)  # bits field -> 12
    with pytest.raises(NotImplementedError, match="depth 12"):
        decode_wav(bytes(bad))
