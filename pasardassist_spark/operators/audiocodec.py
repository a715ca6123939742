"""Pure-Python WAV (RIFF/PCM) codec — the audio half of the multimodal
decode story (reference parity: the reference stores media as opaque URLs,
src/modules/utils/utils.service.ts; here the payload bytes are
first-class).

Stdlib-only, like operators/imagecodec.py: the container has no audio
libraries, but PCM WAV needs none — the RIFF container is a length-tagged
chunk list and the samples are little-endian integers. Supported: PCM
(format tag 1) 16-bit mono/stereo, and IEEE-float (format tag 3) 32- or
64-bit, both at arbitrary sample rates — float samples normalize into
the PCM16 domain by the ffmpeg/sox convention (clip to [-1, 1], scale
by 32767, round-half-even), so every downstream feature stays
integer-exact. Anything else (ADPCM, extensible, MP3/OGG/FLAC) raises
NotImplementedError at the same seam an ffmpeg/soundfile build would
plug into.

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
    (PCM 16-bit only), then the data chunk's interleaved samples. Error
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
    if tag not in (1, 3):
        raise NotImplementedError(
            f"WAV format tag {tag} unsupported (PCM and IEEE float only)"
        )
    if tag == 1 and bits != 16:
        raise NotImplementedError(f"WAV bit depth {bits} unsupported (16 only)")
    if tag == 3 and bits not in (32, 64):
        raise NotImplementedError(
            f"float WAV bit depth {bits} unsupported (32/64 only)"
        )
    if channels < 1:
        raise ValueError("bad WAV channel count")
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
        samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
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
