"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a ``binary``
column (or a pointer into object storage) next to a typed metadata struct,
and run decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing here — schema, batch iteration, column pruning
(metadata-only queries never touch the payload column) — is real and tested;
the *decoder* is a deterministic stub because no image/audio codec libraries
exist in this container. ``decode_image`` raises NotImplementedError at the
exact point a real codec (PIL/libvips/ffmpeg) would plug in.
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
    """Real decoder plug-point. STUB: codec libraries are not available in
    this container; a production build swaps in PIL/libvips here."""
    raise NotImplementedError("image codecs not available; use fake_decode")


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
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(fake_decode)
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
