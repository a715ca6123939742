"""MPEG audio (MP3) frame-header metadata — duration / bitrate /
sample-rate / channel mode WITHOUT decoding a single audio sample.

Reference parity: the reference pipeline indexes fetched media by typed
metadata only (src/utils payload handling); the numbers a crawl needs
from an .mp3 — playable duration, sample rate, CBR-vs-VBR, declared
frame counts — all live in the 4-byte MPEG frame headers and the
optional Xing/Info/VBRI header inside the FIRST frame.  This module is
the audio sibling of operators/exif.py (images) and completes the
story mm_id3_tags started: ID3 reads the prepended tag, this walks the
frames after it.  O(1) header reads per frame, O(n_frames) per file,
zero sample decode — MP3 synthesis filterbanks stay a named ffmpeg
seam (operators/audiocodec.py precedent).

From the public MPEG-1/2 audio framing layout (ISO/IEC 11172-3 §2.4.1
/ 13818-3) and the de-facto Xing and VBRI VBR header conventions:

- frame sync: 11 set bits; then version ID (1 / 2 / 2.5), layer,
  bitrate index, sample-rate index, padding bit, channel mode;
- frame length (Layer III) = floor(coef * bitrate / sample_rate) +
  padding, with coef 144 for MPEG-1 and 72 for MPEG-2/2.5 (576 vs
  1152 samples per frame over 8 bits/byte);
- Xing/Info rides after the side info of the first frame (side-info
  size depends on version and mono-ness), VBRI at a fixed 32-byte
  offset after the first header; both declare total frames/bytes;
- an ID3v2 tag may front the stream (operators/id3.py computes its
  span) and a 128-byte ID3v1 "TAG" may trail it.

All three MPEG audio layers are walked (r15 — Layer I broadcast
feeds and Layer II DAB/.mp2 files show up in real crawls): Layer I
frames are 4-byte slots (length = (12*bitrate/rate + pad) * 4,
384 samples/frame), Layer II uses the 144 coefficient with 1152
samples at every version, Layer III keeps the 144/72 version split.
The layer-specific bitrate tables (11172-3 Annex B) are complete;
FREE-FORMAT streams (bitrate index 0) recover their fixed frame size
by scanning to the next consistent syncword, per 11172-3 §2.4.2.3
(r15 — bitrate_kbps reads NULL); Xing/VBRI VBR headers are Layer III
conventions and are only looked for there.  Lost sync, truncated frames, and mid-stream
version/layer/rate changes raise ValueError — a torn file should
dead-letter loudly, not count wrong.
"""

from __future__ import annotations

from pasardassist_spark.operators.id3 import id3_tag_span

__all__ = ["encode_mp3", "parse_mp3"]

# bitrate tables, kbps, index 1..14 (0 = free, 15 = bad), keyed by
# (mpeg1?, layer) per ISO/IEC 11172-3 / 13818-3 (MPEG-2 shares one
# table for layers II and III)
_BITRATES_V1 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_BITRATES_V2 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
_BITRATES_V1_L1 = (
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
)
_BITRATES_V1_L2 = (
    None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
)
_BITRATES_V2_L1 = (
    None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256,
)


def _bitrate_table(version: str, layer: int):
    if version == "1":
        return {1: _BITRATES_V1_L1, 2: _BITRATES_V1_L2, 3: _BITRATES_V1}[
            layer
        ]
    return _BITRATES_V2_L1 if layer == 1 else _BITRATES_V2


def _frame_len(version: str, layer: int, bitrate: int, sample_rate: int,
               padding: int) -> int:
    if layer == 1:
        return (12 * bitrate * 1000 // sample_rate + padding) * 4
    if layer == 2:
        return 144 * bitrate * 1000 // sample_rate + padding
    coef = 144 if version == "1" else 72
    return coef * bitrate * 1000 // sample_rate + padding


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576

# sample rates by version key and 2-bit index
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_VERSION_BITS = {0b00: "2.5", 0b10: "2", 0b11: "1"}
_MODES = ("stereo", "joint", "dual", "mono")


def _frame_header(version: str, bitrate: int, sample_rate: int,
                  mode: str, layer: int = 3) -> tuple[bytes, int]:
    """Serialize one frame header (padding 0); returns (header,
    frame_length)."""
    vbits = {v: k for k, v in _VERSION_BITS.items()}[version]
    br_idx = _bitrate_table(version, layer).index(bitrate)
    sr_idx = _SAMPLE_RATES[version].index(sample_rate)
    mode_idx = _MODES.index(mode)
    lbits = {3: 0b01, 2: 0b10, 1: 0b11}[layer]
    b1 = 0xFF
    b2 = 0xE0 | (vbits << 3) | (lbits << 1) | 1  # no CRC
    b3 = (br_idx << 4) | (sr_idx << 2)  # padding 0, private 0
    b4 = mode_idx << 6
    flen = _frame_len(version, layer, bitrate, sample_rate, 0)
    return bytes([b1, b2, b3, b4]), flen


def _side_info_size(version: str, mode: str) -> int:
    if version == "1":
        return 17 if mode == "mono" else 32
    return 9 if mode == "mono" else 17


def encode_mp3(
    *,
    version: str = "1",
    sample_rate: int | None = None,
    mode: str = "stereo",
    n_frames: int = 8,
    bitrate: int = 128,
    vbr: str = "none",
    vbr_bitrates: tuple[int, ...] = (64, 96, 128),
    id3_tag: bytes = b"",
    id3v1: bool = False,
    layer: int = 3,
    free_frame_size: int | None = None,
) -> bytes:
    """Synthesize a conforming MPEG audio stream of ``n_frames`` frames
    with zeroed audio payloads (the parser never reads them).
    ``layer`` 1/2/3 — VBR headers are Layer III only.

    ``vbr``: "none" (CBR at ``bitrate``), "xing" (bitrates cycle
    ``vbr_bitrates``; first frame carries a Xing header declaring
    frames+bytes), or "vbri" (same cycling, Fraunhofer VBRI header at
    its fixed 32-byte offset).  ``id3_tag`` bytes are prepended
    verbatim; ``id3v1`` appends the 128-byte trailer."""
    if sample_rate is None:
        sample_rate = _SAMPLE_RATES[version][0]
    if vbr not in ("none", "xing", "vbri"):
        raise ValueError(f"unknown vbr mode {vbr!r}")
    if layer != 3 and vbr != "none":
        raise ValueError("Xing/VBRI headers are Layer III conventions")
    rates = [bitrate] * n_frames if vbr == "none" else [
        vbr_bitrates[i % len(vbr_bitrates)] for i in range(n_frames)
    ]
    frames: list[bytearray] = []
    for r in rates:
        if free_frame_size is not None:
            if vbr != "none":
                raise ValueError("free format is CBR by definition")
            hdr, _ = _frame_header(version, 32, sample_rate, mode, layer)
            hdr = bytes([hdr[0], hdr[1], hdr[2] & 0x0F, hdr[3]])  # br_idx 0
            frame = bytearray(free_frame_size)
        else:
            hdr, flen = _frame_header(version, r, sample_rate, mode, layer)
            frame = bytearray(flen)
        frame[:4] = hdr
        frames.append(frame)
    if vbr != "none":
        total_bytes = sum(len(f) for f in frames)
        first = frames[0]
        if vbr == "xing":
            off = 4 + _side_info_size(version, mode)
            blob = (
                b"Xing"
                + (0x3).to_bytes(4, "big")  # FRAMES | BYTES
                + n_frames.to_bytes(4, "big")
                + total_bytes.to_bytes(4, "big")
            )
        else:
            off = 4 + 32
            blob = (
                b"VBRI"
                + (1).to_bytes(2, "big")   # version
                + (0).to_bytes(2, "big")   # delay
                + (0).to_bytes(2, "big")   # quality
                + total_bytes.to_bytes(4, "big")
                + n_frames.to_bytes(4, "big")
                + (0).to_bytes(2, "big")   # TOC entries
                + (0).to_bytes(2, "big")   # TOC scale
                + (0).to_bytes(2, "big")   # TOC entry size
                + (0).to_bytes(2, "big")   # frames per TOC entry
            )
        if off + len(blob) > len(first):
            raise ValueError("first frame too small for VBR header")
        first[off : off + len(blob)] = blob
    out = bytearray(id3_tag)
    for f in frames:
        out += f
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def _parse_header(buf: bytes, pos: int) -> dict:
    if pos + 4 > len(buf):
        raise ValueError("truncated MPEG frame header")
    b1, b2, b3, b4 = buf[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        raise ValueError(f"lost MPEG frame sync at offset {pos}")
    vbits = (b2 >> 3) & 0b11
    version = _VERSION_BITS.get(vbits)
    if version is None:
        raise ValueError("reserved MPEG version id")
    layer = {0b01: 3, 0b10: 2, 0b11: 1}.get((b2 >> 1) & 0b11)
    if layer is None:
        raise ValueError("reserved MPEG layer")
    br_idx = (b3 >> 4) & 0xF
    if br_idx == 15:
        raise ValueError("bad MPEG bitrate index 15")
    # br_idx 0 = FREE FORMAT (r15): the bitrate is unstated and the
    # frame length must be recovered by scanning to the next sync
    bitrate = None if br_idx == 0 else _bitrate_table(version, layer)[br_idx]
    sr_idx = (b3 >> 2) & 0b11
    if sr_idx == 0b11:
        raise ValueError("reserved MPEG sample-rate index")
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    padding = (b3 >> 1) & 1
    mode = _MODES[(b4 >> 6) & 0b11]
    flen = (
        None
        if bitrate is None
        else _frame_len(version, layer, bitrate, sample_rate, padding)
    )
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "mode": mode,
        "padding": padding,
        "frame_len": flen,
    }


def _next_sync(buf: bytes, start: int, end: int, first: dict) -> int | None:
    """Offset of the next frame header CONSISTENT with ``first``
    (version/layer/rate/mode) — the free-format length recovery of
    ISO 11172-3 §2.4.2.3 ("the bit rate is constant and the decoder
    deduces the frame size from the distance between syncwords")."""
    i = start
    while i + 4 <= end:
        if buf[i] == 0xFF and (buf[i + 1] & 0xE0) == 0xE0:
            try:
                h = _parse_header(buf, i)
            except (ValueError, NotImplementedError):
                i += 1
                continue
            if (
                h["version"] == first["version"]
                and h["layer"] == first["layer"]
                and h["sample_rate"] == first["sample_rate"]
                and h["mode"] == first["mode"]
            ):
                return i
        i += 1
    return None


def _free_format_base(buf: bytes, pos: int, end: int, first: dict) -> int:
    """Padding-normalized free-format frame length, validated as STABLE
    across up to 3 consecutive frames (the usual free-format heuristic):
    a sync-like bit pattern inside real (non-zeroed) audio payload would
    otherwise mis-measure the first frame and cascade into wrong
    n_frames/duration silently.  ISO 11172-3 §2.4.2.3 fixes the
    free-format bitrate for the whole stream, so the recovered length —
    net of each frame's padding slot — must agree frame-to-frame; a
    disagreement raises instead of guessing."""
    slot = 4 if first["layer"] == 1 else 1
    bases: list[int] = []
    p = pos
    for _ in range(3):
        if p >= end:
            break
        h = _parse_header(buf, p)
        nxt = _next_sync(buf, p + 4, end, first)
        span = (nxt if nxt is not None else end) - p
        bases.append(span - h["padding"] * slot)
        if nxt is None:
            break
        p = nxt
    if len(set(bases)) > 1:
        raise ValueError(
            "free-format frame length unstable across consecutive frames "
            f"(padding-normalized lengths {bases})"
        )
    return bases[0]


def _read_vbr_header(buf: bytes, pos: int, h: dict) -> tuple[str, int | None]:
    """(method, declared_frames) from the FIRST frame: Xing/Info after
    the side info, or VBRI at its fixed offset.  Layer III only — the
    side-info layout the offsets rely on does not exist in I/II."""
    if h["layer"] != 3:
        return "none", None
    off = pos + 4 + _side_info_size(h["version"], h["mode"])
    magic = buf[off : off + 4]
    if magic in (b"Xing", b"Info"):
        flags = int.from_bytes(buf[off + 4 : off + 8], "big")
        frames = None
        if flags & 0x1:
            frames = int.from_bytes(buf[off + 8 : off + 12], "big")
        # "Info" is the CBR spelling of the same header (LAME emits it)
        return ("xing" if magic == b"Xing" else "info"), frames
    off = pos + 4 + 32
    if buf[off : off + 4] == b"VBRI":
        frames = int.from_bytes(buf[off + 14 : off + 18], "big")
        return "vbri", frames
    return "none", None


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame header of an MP3 stream (ID3v2 tag and ID3v1
    trailer skipped by declared size) and return::

        {version, sample_rate, mode, n_frames, duration_us,
         bitrate_kbps,           # nominal, None when bitrate varies
         vbr_method,             # none | xing | info | vbri
         declared_frames}        # from the VBR header, None without one

    duration_us is exact integer arithmetic: n_frames * samples_per
    frame * 1_000_000 // sample_rate.  Mid-stream version, sample-rate
    or mode changes raise ValueError (one stream, one clock)."""
    pos = id3_tag_span(payload)
    end = len(payload)
    # a trailing 128-byte ID3v1 tag is not frame data
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    if pos >= end:
        raise ValueError("MP3 stream has no audio frames")
    first = _parse_header(payload, pos)
    vbr_method, declared = _read_vbr_header(payload, pos, first)
    n_frames = 0
    bitrates: set[int] = set()
    free_base: int | None = None
    free_slot = 4 if first["layer"] == 1 else 1
    while pos < end:
        h = _parse_header(payload, pos)
        if (
            h["version"] != first["version"]
            or h["layer"] != first["layer"]
            or h["sample_rate"] != first["sample_rate"]
            or h["mode"] != first["mode"]
        ):
            raise ValueError("MPEG stream parameters changed mid-stream")
        flen = h["frame_len"]
        if flen is None:  # free format: stability-validated recovered length
            if free_base is None:
                free_base = _free_format_base(payload, pos, end, first)
            # frame size is DEDUCED (constant base + this frame's padding
            # slot), never re-scanned — a sync-like byte pair inside the
            # payload cannot shift the walk mid-stream
            flen = free_base + h["padding"] * free_slot
        bitrates.add(h["bitrate"])
        n_frames += 1
        pos += flen
    if pos != end:
        raise ValueError("trailing bytes after final MPEG frame")
    spf = _samples_per_frame(first["version"], first["layer"])
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "mode": first["mode"],
        "n_frames": n_frames,
        "duration_us": n_frames * spf * 1_000_000 // first["sample_rate"],
        "bitrate_kbps": first["bitrate"] if len(bitrates) == 1 else None,
        "vbr_method": vbr_method,
        "declared_frames": declared,
    }
