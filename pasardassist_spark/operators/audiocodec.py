"""Pure-Python WAV (RIFF/PCM) codec — the audio half of the multimodal
decode story (reference parity: the reference stores media as opaque URLs,
src/modules/utils/utils.service.ts; here the payload bytes are
first-class).

Stdlib-only, like operators/imagecodec.py: the container has no audio
libraries, but PCM WAV needs none — the RIFF container is a length-tagged
chunk list and the samples are little-endian integers. Supported: PCM
(format tag 1) 16-bit mono/stereo; IEEE-float (tag 3) 32-/64-bit —
float samples normalize into the PCM16 domain by the ffmpeg/sox
convention (clip to [-1, 1], scale by 32767, round-half-even) so every
downstream feature stays integer-exact; G.711 mu-law/A-law (tags 7/6,
the ITU companding expansion in exact integer bit math); and IMA/DVI
ADPCM (tag 17, the 89-step differential fold, mono + stereo blocks).
Psychoacoustic codecs (MP3/OGG/FLAC/AAC) raise NotImplementedError at
the same seam an ffmpeg/soundfile build would plug into.

Feature extraction works in INTEGER arithmetic end-to-end (sum of squares,
zero crossings) so a SQL oracle can re-derive every number exactly — the
same closed-form-checkable discipline as the image raster checksums.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class PcmAudio(NamedTuple):
    sample_rate: int
    channels: int
    samples: list[int]  # interleaved 16-bit signed, -32768..32767


WAV_MAGIC = b"RIFF"


# Bomb guard (see _decode_wav): max samples decoded from an inline column.
MAX_SAMPLES = 1 << 25


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> PcmAudio:
    """Parse a RIFF/WAVE container: walk chunks (word-aligned), read fmt
    (integer PCM at 8/16/24/32-bit — r15 widened from 16-only — plus
    IEEE float, G.711, IMA ADPCM), then the data chunk's interleaved
    samples, all narrowed into the PCM16 domain. Error
    surface: ValueError (malformed — struct.error from short headers is
    normalized into it) or NotImplementedError (unsupported format)."""
    try:
        return _decode_wav(payload)
    except struct.error as exc:
        raise ValueError(f"malformed WAV payload: {exc}") from exc


def _decode_wav(payload: bytes) -> PcmAudio:
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    ln = len(payload)
    while pos + 8 <= ln:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag not in (1, 3, 6, 7, 17):
        raise NotImplementedError(
            f"WAV format tag {tag} unsupported (PCM, IEEE float, G.711 "
            "A-law/mu-law, IMA ADPCM only)"
        )
    if tag == 1 and bits not in (8, 16, 24, 32):
        raise NotImplementedError(
            f"WAV bit depth {bits} unsupported (8/16/24/32 integer PCM)"
        )
    if tag == 3 and bits not in (32, 64):
        raise NotImplementedError(
            f"float WAV bit depth {bits} unsupported (32/64 only)"
        )
    if tag in (6, 7) and bits != 8:
        raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
    if channels < 1:
        raise ValueError("bad WAV channel count")
    if tag == 17:
        return _decode_ima_adpcm(fmt, data, channels, rate)
    if tag in (6, 7):
        if len(data) > MAX_SAMPLES:
            raise ValueError(
                f"G.711 data chunk has {len(data)} samples, exceeding the "
                f"{MAX_SAMPLES} decode guard"
            )
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        return PcmAudio(rate, channels, [table[b] for b in data])
    width = bits // 8
    n = len(data) // width
    # Decompression-bomb guard, mirroring imagecodec's MAX_PIXELS: the
    # Python int list amplifies the payload ~14-28x in memory, so an
    # unchecked inline data chunk could balloon an executor. 2^25 samples
    # = ~6 min of 48 kHz stereo = 64 MiB payload -> bounded ~1.8 GiB peak.
    if n > MAX_SAMPLES:
        raise ValueError(
            f"WAV data chunk has {n} samples, exceeding the {MAX_SAMPLES} "
            "decode guard (route longer recordings through a chunked "
            "decode, not an inline column)"
        )
    if tag == 1:
        if bits == 16:
            samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
        elif bits == 8:
            # 8-bit WAV is UNSIGNED with midpoint 128 (the RIFF rule);
            # widen into the PCM16 domain
            samples = [(b - 128) << 8 for b in data[:n]]
        elif bits == 24:
            # packed signed little-endian 3-byte; truncate to the top
            # 16 bits (the dither-free sox/ffmpeg narrowing)
            raw = data[: n * 3]
            samples = [
                (
                    int.from_bytes(raw[i : i + 3], "little", signed=True)
                ) >> 8
                for i in range(0, n * 3, 3)
            ]
        else:  # 32-bit integer PCM
            samples = [
                v >> 16 for v in struct.unpack(f"<{n}i", data[: n * 4])
            ]
    else:
        # IEEE float in [-1, 1] -> PCM16 domain: clip, scale by 32767,
        # round half even (the ffmpeg/sox normalization) — deterministic,
        # so the integer feature oracles stay exact for float payloads
        floats = struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", data[: n * width])
        samples = [
            int(_round_half_even(max(-1.0, min(1.0, v)) * 32767.0))
            for v in floats
        ]
    return PcmAudio(rate, channels, samples)


def _round_half_even(x: float) -> float:
    # builtin round() IS banker's rounding for floats; named for intent
    return round(x)


def encode_wav_depth(audio: PcmAudio, bits: int) -> bytes:
    """Integer-PCM writer at 8/24/32-bit depth (fixture generator):
    widens the PCM16 samples so decode_wav's narrowing recovers them
    EXACTLY (8-bit drops the low byte — callers quantize first)."""
    if bits == 16:
        return encode_wav(audio)
    if bits == 8:
        data = bytes(((s >> 8) + 128) & 0xFF for s in audio.samples)
    elif bits == 24:
        data = b"".join(
            (s << 8).to_bytes(3, "little", signed=True)
            for s in audio.samples
        )
    elif bits == 32:
        data = struct.pack(
            f"<{len(audio.samples)}i", *[s << 16 for s in audio.samples]
        )
    else:
        raise ValueError(f"unsupported integer PCM depth {bits}")
    width = bits // 8
    byte_rate = audio.sample_rate * audio.channels * width
    fmt = struct.pack(
        "<HHIIHH", 1, audio.channels, audio.sample_rate, byte_rate,
        audio.channels * width, bits,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )


def encode_wav(audio: PcmAudio) -> bytes:
    """Minimal PCM16 writer (fixture generator and the synth-payload
    builder — canonical 44-byte header, one data chunk)."""
    data = struct.pack(f"<{len(audio.samples)}h", *audio.samples)
    byte_rate = audio.sample_rate * audio.channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, audio.channels, audio.sample_rate, byte_rate,
        audio.channels * 2, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float(audio: PcmAudio, bits: int = 32) -> bytes:
    """IEEE-float writer (format tag 3, 32- or 64-bit): PCM16-domain
    samples map to s/32767.0 — for |s| <= 32767 the float32 relative
    error (~6e-8) keeps the decode-side round-half-even landing back on
    s exactly, so float fixtures round-trip bit-exactly into the integer
    feature oracles."""
    if bits not in (32, 64):
        raise ValueError(f"float WAV bits must be 32 or 64, got {bits}")
    code = "f" if bits == 32 else "d"
    data = struct.pack(
        f"<{len(audio.samples)}{code}",
        *[s / 32767.0 for s in audio.samples],
    )
    width = bits // 8
    byte_rate = audio.sample_rate * audio.channels * width
    fmt = struct.pack(
        "<HHIIHH", 3, audio.channels, audio.sample_rate, byte_rate,
        audio.channels * width, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


N_FP_FRAMES = 32


def energy_fingerprint(samples: list[int], n_frames: int = N_FP_FRAMES) -> int:
    """Volume-invariant audio fingerprint: the signal splits into
    ``n_frames`` equal-ish frames (sample i -> frame (i*n_frames)//n, the
    same floor grid as video keyframe sampling), each frame folds to its
    integer energy (sum of squares), and bit f-1 records whether frame f
    has MORE energy than frame f-1 — a 31-bit energy-delta signature.

    This is the integer-exact skeleton of spectral fingerprinting
    (Chromaprint/Shazam record per-band energy DELTAS for the same
    reason): uniform gain scales every energy by gain^2, preserving every
    comparison, so re-encoded/re-leveled copies of a track fingerprint
    identically — while time-local content changes flip bits. All
    arithmetic is integer, so a SQL oracle re-derives the exact value.
    """
    n = len(samples)
    if n < n_frames:
        raise ValueError(f"need >= {n_frames} samples, got {n}")
    energies = [0] * n_frames
    for i, s in enumerate(samples):
        energies[(i * n_frames) // n] += s * s
    fp = 0
    for f in range(1, n_frames):
        if energies[f] > energies[f - 1]:
            fp |= 1 << (f - 1)
    return fp


class AudioFeatures(NamedTuple):
    sample_rate: int
    channels: int
    n_samples: int       # per channel
    duration_ms: int     # floor(n_samples * 1000 / rate)
    sq_sum: int          # sum of sample^2 over ALL samples (energy; exact)
    zero_crossings: int  # adjacent-pair strict sign flips (s[i-1]*s[i] < 0)


def extract_audio_features(audio: PcmAudio) -> AudioFeatures:
    """Integer-exact features: energy as the raw sum of squares (RMS =
    sqrt(sq_sum/n) is one float away when a reader wants it; keeping the
    integer makes the oracle comparison exact) and strict zero crossings
    over the interleaved stream."""
    s = audio.samples
    sq = sum(v * v for v in s)
    zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
    n = len(s) // audio.channels
    return AudioFeatures(
        audio.sample_rate,
        audio.channels,
        n,
        (n * 1000) // audio.sample_rate,
        sq,
        zc,
    )


# ------------------------------------------------------------- G.711 ------
# ITU-T G.711 companding (the telephony codec: 8-bit log-domain codes,
# format tags 6 = A-law, 7 = mu-law). The expansion formulas below are the
# classic public-domain CCITT reference arithmetic (as reproduced in
# sox/ffmpeg g711 implementations); both are pure integer bit math, so the
# SQL oracle re-derives every decoded sample exactly.


def _ulaw_to_linear(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_to_linear(code: int) -> int:
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_ULAW_TABLE = [_ulaw_to_linear(c) for c in range(256)]
_ALAW_TABLE = [_alaw_to_linear(c) for c in range(256)]


def linear_to_ulaw(s: int) -> int:
    """16-bit sample -> mu-law code (the compression direction; fixture
    generator + the fixpoint property decode(encode(decode(c))) ==
    decode(c) pins encoder/decoder consistency over all 256 codes)."""
    sign = 0x80 if s < 0 else 0x00
    mag = min(-s if s < 0 else s, 32635) + 0x84
    exp = min(max(mag.bit_length() - 8, 0), 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def linear_to_alaw(s: int) -> int:
    """16-bit sample -> A-law code (same fixpoint discipline)."""
    sign = 0x80 if s >= 0 else 0x00
    mag = min(s if s >= 0 else -s, 32767)
    if mag < 256:
        seg, m = 0, mag >> 4
    else:
        seg = min(mag.bit_length() - 8, 7)
        m = (mag >> (seg + 3)) & 0x0F
    return (sign | (seg << 4) | m) ^ 0x55


def encode_wav_g711(codes: bytes, sample_rate: int, law: str) -> bytes:
    """Container writer for raw G.711 code streams (format tag 6/7,
    8-bit mono) — the fixture path: the query synthesizes closed-form
    CODE bytes and certifies the expansion against the SQL bit math."""
    if law not in ("alaw", "ulaw"):
        raise ValueError(f"law must be 'alaw' or 'ulaw', got {law!r}")
    tag = 6 if law == "alaw" else 7
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------- IMA ADPCM -----
# IMA/DVI ADPCM (format tag 17): 4-bit differential codes over an 89-step
# quantizer table, one predictor+index header per channel per block. The
# decode fold is the IMA reference algorithm; it is STATEFUL, so the SQL
# oracle expresses it as a recursive-CTE fold (queries/documents.py-style
# closed-form nibbles), and multi-block/stereo paths are pytest-pinned.

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, idx


def _decode_ima_adpcm(fmt: bytes, data: bytes, channels: int, rate: int) -> PcmAudio:
    if channels not in (1, 2):
        raise NotImplementedError(
            f"IMA ADPCM with {channels} channels unsupported (mono/stereo)"
        )
    _tag, _ch, _rate, _br, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if bits != 4:
        raise ValueError(f"IMA ADPCM must be 4-bit, got {bits}")
    if len(fmt) >= 20:
        (spb,) = struct.unpack_from("<H", fmt, 18)
    else:
        spb = (block_align - 4 * channels) * 2 // channels + 1
    if block_align < 4 * channels:
        raise ValueError("IMA ADPCM block_align smaller than headers")
    est = (len(data) // max(block_align, 1) + 1) * spb * channels
    if est > MAX_SAMPLES:
        raise ValueError(
            f"IMA ADPCM stream would decode ~{est} samples, exceeding the "
            f"{MAX_SAMPLES} decode guard"
        )
    out: list[int] = []
    pos = 0
    while pos + 4 * channels <= len(data):
        block = data[pos : pos + block_align]
        pos += block_align
        preds, idxs, chans = [], [], []
        for c in range(channels):
            pred, idx, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} out of range")
            preds.append(pred)
            idxs.append(idx)
            chans.append([pred])
        body = block[4 * channels :]
        if channels == 1:
            for b in body:
                for nib in (b & 0x0F, b >> 4):
                    preds[0], idxs[0] = _ima_step(nib, preds[0], idxs[0])
                    chans[0].append(preds[0])
        else:
            # stereo: 4-byte (8-nibble) groups alternate channels
            for g in range(0, len(body) - 7, 8):
                for c in range(2):
                    for b in body[g + 4 * c : g + 4 * c + 4]:
                        for nib in (b & 0x0F, b >> 4):
                            preds[c], idxs[c] = _ima_step(nib, preds[c], idxs[c])
                            chans[c].append(preds[c])
        n = min(spb, min(len(ch) for ch in chans))
        for i in range(n):
            for c in range(channels):
                out.append(chans[c][i])
    return PcmAudio(rate, channels, out)


def encode_wav_ima_adpcm(
    nibbles: bytes,
    sample_rate: int,
    pred0: int,
    idx0: int,
    spb: int | None = None,
) -> bytes:
    """Single-block mono IMA ADPCM container writer (fixture generator):
    ``nibbles`` is the raw 4-bit code sequence (one value 0..15 per byte,
    even count), packed low-nibble-first behind a (pred0, idx0) header.
    The decoder emits pred0 then one sample per nibble."""
    if len(nibbles) % 2:
        raise ValueError("nibble count must be even (two per byte)")
    if not -32768 <= pred0 <= 32767 or not 0 <= idx0 <= 88:
        raise ValueError("bad IMA ADPCM block header state")
    body = bytes(
        (nibbles[i] & 0x0F) | ((nibbles[i + 1] & 0x0F) << 4)
        for i in range(0, len(nibbles), 2)
    )
    block_align = 4 + len(body)
    n_samples = len(nibbles) + 1 if spb is None else spb
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, sample_rate, sample_rate * block_align // max(n_samples, 1),
        block_align, 4, 2, n_samples,
    )
    data = struct.pack("<hBB", pred0, idx0, 0) + body
    body_riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body_riff)) + body_riff


def encode_wav_ima_adpcm_pcm(
    samples: list[int], sample_rate: int, block_samples: int = 505
) -> bytes:
    """Mono IMA ADPCM ENCODER (PCM16 -> 4-bit codes, multi-block): the
    compression direction, used by the roundtrip property tests — the
    decoder must reproduce the encoder's internal predictor stream
    EXACTLY (both run the same _ima_step fold)."""
    if block_samples % 2 == 0:
        raise ValueError("block_samples must be odd (header + even nibbles)")
    blocks = []
    idx = 0
    i = 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        i += block_samples
        pred = chunk[0]
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[idx]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            if diff < 0:
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(nib, pred, idx)
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)  # pad nibble; samples_per_block masks it out
        body = bytes(
            (nibs[j] & 0x0F) | ((nibs[j + 1] & 0x0F) << 4)
            for j in range(0, len(nibs), 2)
        )
        blocks.append((struct.pack("<hBB", chunk[0], idx, 0), body, len(chunk)))
        # NB: the per-block header index is the index AT BLOCK START; track
        # it before the block's first step for the next block header
    # re-run to fix header indices (encode pass above advanced idx inline)
    idx = 0
    out_blocks = []
    i = 0
    for hdr, body, n in blocks:
        pred = struct.unpack_from("<h", hdr, 0)[0]
        out_blocks.append(struct.pack("<hBB", pred, idx, 0) + body)
        for b in body:
            for nib in (b & 0x0F, b >> 4):
                pred, idx = _ima_step(nib, pred, idx)
        i += n
    block_align = 4 + (block_samples - 1 + 1) // 2
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, sample_rate,
        sample_rate * block_align // block_samples, block_align, 4, 2,
        block_samples,
    )
    data = b"".join(out_blocks)
    body_riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body_riff)) + body_riff


# ------------------------------------------------- RIFF LIST/INFO metadata

# Standard INFO sub-chunk ids (public RIFF/multimedia spec):
# INAM title, IART artist, ICRD creation date, ICMT comment, ISFT software
INFO_IDS = ("INAM", "IART", "ICRD", "ICMT", "ISFT")


def encode_wav_info(info: dict[str, str]) -> bytes:
    """A serialized LIST/INFO chunk (latin-1 ZSTR values, word-aligned
    sub-chunks — the RIFF discipline decode_wav's walk already obeys)."""
    body = b"INFO"
    for cid, value in info.items():
        if len(cid) != 4:
            raise ValueError(f"RIFF chunk id must be 4 chars: {cid!r}")
        z = value.encode("latin-1") + b"\x00"
        body += cid.encode("ascii") + struct.pack("<I", len(z)) + z
        if len(z) & 1:
            body += b"\x00"  # pad byte, excluded from declared size
    return b"LIST" + struct.pack("<I", len(body)) + body


def insert_wav_chunk(wav: bytes, chunk: bytes) -> bytes:
    """Splice a serialized chunk right after the WAVE form type (before
    fmt — legal per RIFF; parsers must walk, not assume offsets)."""
    if not sniff_wav(wav):
        raise ValueError("not a RIFF/WAVE payload")
    out = wav[:12] + chunk + wav[12:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def parse_wav_info(payload: bytes) -> dict[str, str]:
    """All LIST/INFO keyword→value pairs; the data chunk is skipped by
    declared size, never decoded — O(metadata bytes) per file."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    out: dict[str, str] = {}
    pos = 12
    ln = len(payload)
    while pos + 8 <= ln:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError("truncated WAV chunk")
        if cid == b"LIST" and body[:4] == b"INFO":
            sub = 4
            while sub + 8 <= len(body):
                sid, ssize = struct.unpack_from("<4sI", body, sub)
                sval = body[sub + 8 : sub + 8 + ssize]
                if len(sval) != ssize:
                    raise ValueError("truncated INFO sub-chunk")
                out[sid.decode("ascii", "replace")] = (
                    sval.split(b"\x00", 1)[0].decode("latin-1")
                )
                sub += 8 + ssize + (ssize & 1)
        pos += 8 + csize + (csize & 1)
    return out
