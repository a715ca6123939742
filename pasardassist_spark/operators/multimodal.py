"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a ``binary``
column (or a pointer into object storage) next to a typed metadata struct,
and run decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing here — schema, batch iteration, column pruning
(metadata-only queries never touch the payload column) — is real and tested.

Decode is REAL for PPM/PGM, uncompressed BMP, and 8-bit PNG via the
stdlib-only codecs in operators/imagecodec.py (``decode_images`` /
``resize_images`` run them distributed). Formats needing external codec
libraries (JPEG/WebP/video) raise NotImplementedError at the same seam a
production PIL/libvips/ffmpeg build would plug into; the digest-derived
``fake_decode`` remains only as the fallback for non-image payloads so the
text-payload plumbing queries stay independently checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id long, kind string, n_bytes long, width int, height int"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(F.col(text_col)).cast("long").alias("size"),
        ),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder: PPM/PGM, uncompressed BMP, and 8-bit PNG are decoded
    by the pure-Python codecs in operators/imagecodec.py (stdlib only —
    zlib inflates PNG IDAT; all five scanline filters reversed). Raises
    NotImplementedError only for containers with no decoder (JPEG/WebP/
    video — a production build plugs PIL/libvips/ffmpeg into the same
    seam)."""
    from pasardassist_spark.operators import imagecodec

    r = imagecodec.decode(payload)
    return r.width, r.height


def synth_raster(doc_id: int) -> tuple[int, int, bytes]:
    """Deterministic synthetic RGB raster for a document id. Dimensions are
    pure arithmetic over doc_id (so a SQL oracle re-derives them without
    touching bytes); pixel (x, y, c) = (x*7 + y*13 + c*29 + doc_id) % 256."""
    w = int(doc_id) % 61 + 4
    h = (int(doc_id) * 7) % 53 + 4
    px = bytearray(w * h * 3)
    i = 0
    for y in range(h):
        for x in range(w):
            base = x * 7 + y * 13 + int(doc_id)
            px[i] = base % 256
            px[i + 1] = (base + 29) % 256
            px[i + 2] = (base + 58) % 256
            i += 3
    return w, h, bytes(px)


IMAGE_KINDS = ("image/x-portable-pixmap", "image/bmp", "image/png")


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL image payloads (not digest stand-ins): each row gets a
    deterministic synthetic raster encoded into an actual container —
    format rotates doc_id % 3 over PPM / BMP / PNG — so downstream stages
    exercise the pure-Python decoders on genuine file bytes. Arrow-batched
    mapInPandas; at 100 TB this stage is the 'fetch/transcode' map pass."""
    from pasardassist_spark.operators import imagecodec

    schema = f"{id_col} long, kind string, payload binary"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds, payloads = [], []
            for doc_id in pdf[id_col]:
                w, h, px = synth_raster(int(doc_id))
                r = imagecodec.Raster(w, h, 3, px)
                fmt = int(doc_id) % 3
                if fmt == 0:
                    payloads.append(imagecodec.encode_ppm(r))
                elif fmt == 1:
                    payloads.append(imagecodec.encode_bmp(r))
                else:
                    payloads.append(imagecodec.encode_png(r))
                kinds.append(IMAGE_KINDS[fmt])
            yield pd.DataFrame(
                {id_col: pdf[id_col], "kind": kinds, "payload": payloads}
            )

    return df.select(id_col).mapInPandas(_batches, schema)


DECODE_SCHEMA = (
    "doc_id long, kind string, width int, height int, channels int, pixel_sum long"
)


def decode_images(df: DataFrame) -> DataFrame:
    """REAL decode stage: parse each payload with the pure-Python codecs
    and emit dimensions plus a raster checksum (sum of all decoded pixel
    bytes — any mis-decoded byte, filter bug, or BGR/RGB swap shifts it).
    Same mapInPandas shape as extract_features, but no fallback: every
    payload must decode."""
    from pasardassist_spark.operators import imagecodec

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "kind": [], "width": [], "height": [],
                "channels": [], "pixel_sum": [],
            }
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                r = imagecodec.decode(payload)
                out["doc_id"].append(doc_id)
                out["kind"].append(kind)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["channels"].append(r.channels)
                out["pixel_sum"].append(sum(r.pixels))
            yield pd.DataFrame(out)

    return df.select("doc_id", "kind", "payload").mapInPandas(
        _batches, DECODE_SCHEMA
    )


REAL_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, thumb binary"
)


def resize_images(df: DataFrame, max_side: int = 16) -> DataFrame:
    """REAL resize stage: decode → nearest-neighbor resample → re-encode as
    binary PPM (P6). Aspect-preserving: scale = min(max_side/max(w,h), 1),
    target dims floor(dim*scale) floored at 1 — identical math to the stub
    stage so both share one SQL oracle form. The thumb column is a genuine
    decodable image; its byte length is header + out_w*out_h*3."""
    from pasardassist_spark.operators import imagecodec

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "out_w": [], "out_h": [], "thumb": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                r = imagecodec.decode(payload)
                scale = min(max_side / max(r.width, r.height), 1.0)
                ow = max(int(r.width * scale), 1)
                oh = max(int(r.height * scale), 1)
                thumb = imagecodec.encode_ppm(
                    imagecodec.resize_nearest(
                        r if r.channels == 3 else imagecodec.Raster(
                            r.width, r.height, 3,
                            bytes(b for v in r.pixels for b in (v, v, v)),
                        ),
                        ow, oh,
                    )
                )
                out["doc_id"].append(doc_id)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["thumb"].append(thumb)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_batches, REAL_RESIZE_SCHEMA)


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in decode: dimensions derived from the payload
    digest (so tests and oracles can verify the plumbing end-to-end)."""
    h = hashlib.md5(payload).hexdigest()
    return int(h[:4], 16) % 1024, int(h[4:8], 16) % 1024


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: one pandas batch in, one out — the shape a real
    decode/resize/frame-sample stage uses. Payload bytes never pass through
    Python row-by-row; Arrow moves them in columnar batches.

    Payloads whose magic bytes identify a supported image container
    (PPM/PGM/BMP/PNG) go through the REAL decoder (operators/imagecodec);
    anything else (the text/plain stand-ins) keeps the deterministic
    digest-derived dimensions so non-image plumbing stays checkable.
    """
    from pasardassist_spark.operators import imagecodec

    def _dims(payload: bytes) -> tuple[int, int]:
        if imagecodec.sniff_format(payload):
            return decode_image(payload)
        return fake_decode(payload)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, out_w int, out_h int, thumb binary"


def resize_thumbnails(df: DataFrame, max_side: int = 128) -> DataFrame:
    """Arrow-batched resize stage: aspect-preserving target dimensions plus a
    thumbnail payload. Dimension math is real (what a resize must compute);
    the pixel work is the documented stub — a production build calls
    PIL.Image.thumbnail where ``_thumb_bytes`` truncates. Output thumbnails
    stay a ``binary`` column, so the stage composes with further mapInPandas
    stages exactly like a real codec pipeline."""

    def _thumb_bytes(payload: bytes, w: int, h: int) -> bytes:
        # STUB pixel path: deterministic truncation proportional to area
        # ratio; PIL/libvips plug in here.
        keep = max(1, int(len(payload) * min(1.0, (w * h) / (1024 * 1024))))
        return payload[:keep]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(fake_decode)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            scale = (max_side / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            out_w = (w * scale).astype("int32").clip(lower=1)
            out_h = (h * scale).astype("int32").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_w": out_w,
                    "out_h": out_h,
                    "thumb": [
                        _thumb_bytes(p, ow, oh)
                        for p, ow, oh in zip(pdf["payload"], out_w, out_h)
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame binary"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (video analog): 1 payload row fans out to
    ``n_frames`` evenly-spaced frame rows — the ST5 explode shape driven
    through Python because frame extraction needs a codec. Offsets are the
    real part (even spacing over the byte length); the frame bytes are the
    stub (a fixed-size slice at the offset; ffmpeg plugs in here)."""
    frame_len = 16

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload))
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(bytes(payload[off : off + frame_len]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)
