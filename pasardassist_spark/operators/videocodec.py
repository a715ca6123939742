"""Pure-Python AVI (RIFF) video codec — the video leg of the multimodal
decode story, closing the triple next to operators/imagecodec.py (images)
and operators/audiocodec.py (audio).

Stdlib-only against the public AVI/RIFF spec: an AVI file is a RIFF tree —
``LIST hdrl`` holds the ``avih`` main header (dimensions, frame count) and
one ``LIST strl`` per stream (``strh`` stream header + ``strf`` format,
which for video is a BITMAPINFOHEADER); ``LIST movi`` holds the frame
chunks (``00db`` = uncompressed DIB bits for stream 0). Supported:
uncompressed 24-bit RGB (biCompression=0 'DIB ') video streams, and —
since operators/jpegcodec.py exists — MJPEG (biCompression 'MJPG'),
where every frame chunk is a standalone baseline JPEG; inter-frame
codecs (H.264/VP9) raise NotImplementedError at the ffmpeg seam.

Frames decode to the same ``Raster`` type as the image codecs (bottom-up
BGR rows with 4-byte stride padding normalized to row-major RGB), so every
downstream image stage — dHash, resize, feature extraction — composes with
sampled video frames unchanged.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from pasardassist_spark.operators.imagecodec import (
    Raster,
    _check_dims,
    dib_to_rgb,
    rgb_to_dib,
)


class Video(NamedTuple):
    width: int
    height: int
    fps: int
    frames: list[Raster]


MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def sniff_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _dib_to_raster(body: bytes, w: int, h: int) -> Raster:
    """Uncompressed 24-bit DIB frame bits — the SAME pixel-array layout as
    BMP, so the shared imagecodec helpers do the work (one implementation
    to fix when stride/bpp handling ever changes)."""
    return Raster(w, h, 3, dib_to_rgb(body, 0, w, h, 3, top_down=False))


def _raster_to_dib(r: Raster) -> bytes:
    return rgb_to_dib(r)


def decode_avi(payload: bytes) -> Video:
    """Walk the RIFF tree: avih for dimensions/count, strh/strf to locate
    and verify the VIDEO stream (streams are indexed in strl order, and an
    strf is only parsed as a BITMAPINFOHEADER when its strh says 'vids' —
    an audio-first AVI must not be misparsed), movi for that stream's
    frame chunks. Error surface: ValueError (malformed; struct.error
    normalized) or NotImplementedError (compressed/unsupported)."""
    try:
        return _decode_avi(payload)
    except struct.error as exc:
        raise ValueError(f"malformed AVI payload: {exc}") from exc


def _decode_avi(payload: bytes) -> Video:
    if not sniff_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    w = h = 0
    fps = 0
    stream_idx = -1           # strl counter, in file order
    last_type = b""           # fccType of the most recent strh
    video_stream = None       # index of the verified video stream
    video_codec = None        # "dib" | "mjpg" for that stream
    frames: list[Raster] = []

    def walk(data: bytes, pos: int, end: int, depth: int = 0) -> None:
        nonlocal w, h, fps, stream_idx, last_type, video_stream, video_codec
        if depth > 16:
            # real AVI trees are <= 3 deep (hdrl > strl, movi > rec);
            # a crafted deep-nest must raise ValueError, not blow the
            # Python recursion limit out of the error contract
            raise ValueError("AVI LIST nesting too deep")
        while pos + 8 <= end:
            cid, csize = struct.unpack_from("<4sI", data, pos)
            body_start = pos + 8
            if body_start + csize > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                ltype = data[body_start : body_start + 4]
                if ltype == b"strl":
                    stream_idx += 1
                    last_type = b""
                walk(data, body_start + 4, body_start + csize, depth + 1)
            elif cid == b"avih":
                # MainAVIHeader: dwMicroSecPerFrame, ..., dwWidth (off 32),
                # dwHeight (off 36). The fields are unpacked at fixed
                # offsets from the shared buffer, so the chunk's OWN size
                # must cover them — otherwise a short avih would silently
                # consume bytes of the next chunk as width/height.
                if csize < 40:
                    raise ValueError("truncated avih chunk")
                usec = struct.unpack_from("<I", data, body_start)[0]
                fps = round(1_000_000 / usec) if usec else 0
                w = struct.unpack_from("<I", data, body_start + 32)[0]
                h = struct.unpack_from("<I", data, body_start + 36)[0]
                # bomb guard BEFORE any frame allocates w*h*3
                _check_dims(w, h)
            elif cid == b"strh":
                if csize < 4:
                    raise ValueError("truncated strh chunk")
                last_type = bytes(struct.unpack_from("<4s", data, body_start)[0])
            elif cid == b"strf" and last_type == b"vids" and video_stream is None:
                # BITMAPINFOHEADER: biBitCount at off 14, biCompression at
                # off 16 — same fixed-offset unpack hazard as avih above.
                if csize < 20:
                    raise ValueError("truncated strf chunk")
                compression = struct.unpack_from("<I", data, body_start + 16)[0]
                bpp = struct.unpack_from("<H", data, body_start + 14)[0]
                if compression == MJPG_FOURCC:
                    video_codec = "mjpg"  # each frame chunk is a full JPEG
                elif compression == 0:
                    if bpp != 24:
                        raise NotImplementedError(f"AVI bpp {bpp} unsupported")
                    video_codec = "dib"
                else:
                    raise NotImplementedError(
                        f"AVI compression {compression:#x} unsupported "
                        "(uncompressed DIB and MJPG only; H.264/VP9 need "
                        "ffmpeg)"
                    )
                video_stream = stream_idx
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                if video_stream is None or int(cid[:2]) != video_stream:
                    pass  # another stream's data (audio '01wb' etc.)
                else:
                    if not w or not h:
                        raise ValueError("AVI frame chunk before avih header")
                    body = data[body_start : body_start + csize]
                    if video_codec == "mjpg":
                        # standalone baseline JPEG per frame; its SOF
                        # carries the authoritative dimensions
                        from pasardassist_spark.operators.jpegcodec import (
                            decode_jpeg,
                        )

                        frames.append(decode_jpeg(body))
                    else:
                        frames.append(_dib_to_raster(body, w, h))
            pos = body_start + csize + (csize & 1)  # word-aligned

    walk(payload, 12, len(payload))
    if not w or not h:
        raise ValueError("AVI missing avih header")
    if video_stream is None:
        raise ValueError("AVI has no supported video stream")
    return Video(w, h, fps, frames)


def encode_avi(
    frames: list[Raster],
    fps: int = 10,
    codec: str = "dib",
    jpeg_opts: dict | None = None,
) -> bytes:
    """Minimal AVI writer (fixture generator and the synthetic payload
    builder): one video stream, canonical hdrl + movi. ``codec``:
    "dib" (uncompressed 24-bit, ``00db`` chunks) or "mjpg" (each frame
    encoded as a standalone baseline JPEG via operators/jpegcodec.py,
    ``00dc`` chunks, fccHandler/biCompression 'MJPG'); ``jpeg_opts``
    passes through to encode_jpeg (subsampling/quant/restart)."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    w, h = frames[0].width, frames[0].height
    if any(f.width != w or f.height != h for f in frames):
        raise ValueError("all frames must share dimensions")
    if codec == "dib":
        bodies = [_raster_to_dib(f) for f in frames]
        handler, comp, data_cid = b"DIB ", 0, b"00db"
    elif codec == "mjpg":
        from pasardassist_spark.operators.jpegcodec import encode_jpeg

        bodies = [encode_jpeg(f, **(jpeg_opts or {})) for f in frames]
        handler, comp, data_cid = b"MJPG", MJPG_FOURCC, b"00dc"
    else:
        raise ValueError(f"unknown AVI codec {codec!r}")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frame_bytes = max(
        ((w * 3 + 3) // 4) * 4 * h, max(len(b) for b in bodies)
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,          # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0, 0,                      # padding, flags
        len(frames),               # dwTotalFrames
        0, 1,                      # initial frames, streams
        frame_bytes,               # suggested buffer
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,                    # scale, rate -> fps
        0, len(frames), frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(data_cid, d) for d in bodies))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Evenly-spaced keyframe indices — the same (i*n)//k grid the stub
    stage used for byte offsets, now applied to real frames."""
    if n_frames < 1:
        raise ValueError("empty video")
    return [(i * n_frames) // k for i in range(k)]
