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
