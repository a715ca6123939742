"""Multimodal plumbing query: binary payload + metadata -> mapInPandas
feature extraction. The oracle recomputes the deterministic stub decode in
pure SQL (hex-digit arithmetic over md5), so the whole Arrow/mapInPandas
path is value-checked against an independent derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasardassist_spark.operators.multimodal import attach_payload, extract_features
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


def _hexval(expr: str) -> str:
    return f"(instr('0123456789abcdef', {expr}) - 1)"


def _hex4_to_int(start: int) -> str:
    """SQL for int(md5_hex[start:start+4], 16) over md5(text)."""
    digits = [
        f"{_hexval(f'substr(md5(text), {start + i}, 1)')} * {16 ** (3 - i)}" for i in range(4)
    ]
    return "(" + " + ".join(digits) + ")"


@query(
    "mm_decode_features",
    oracle=f"""
    SELECT doc_id,
           'text/plain' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST({_hex4_to_int(1)} % 1024 AS INTEGER) AS width,
           CAST({_hex4_to_int(5)} % 1024 AS INTEGER) AS height
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction: binary payload column + metadata
    struct driven through an Arrow-batched mapInPandas decode stage (the
    decoder itself is the documented deterministic stub — real codecs are
    the one missing library in this container)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(attach_payload(d))


@query(
    "mm_resize_thumbs",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, text,
               CAST({_hex4_to_int(1)} % 1024 AS INTEGER) AS width,
               CAST({_hex4_to_int(5)} % 1024 AS INTEGER) AS height
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, text, width, height,
               LEAST(128.0 / GREATEST(width, height), 1.0) AS scale
        FROM dims
    ),
    outdims AS (
        SELECT doc_id, text, width, height,
               GREATEST(CAST(floor(width * scale) AS INTEGER), 1) AS out_w,
               GREATEST(CAST(floor(height * scale) AS INTEGER), 1) AS out_h
        FROM scaled
    )
    SELECT doc_id, width, height, out_w, out_h,
           md5(substr(text, 1,
               GREATEST(1, CAST(floor(length(text)
                   * LEAST(1.0, (out_w * out_h) / 1048576.0)) AS INTEGER))
           )) AS thumb_md5,
           CAST(GREATEST(1, CAST(floor(length(text)
               * LEAST(1.0, (out_w * out_h) / 1048576.0)) AS INTEGER)) AS BIGINT)
               AS thumb_len
    FROM outdims
    """,
)
def mm_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage: aspect-preserving thumbnail dimensions plus
    a (stub) thumbnail payload per document, Arrow-batched. The oracle
    re-derives the dimension math and the deterministic stub truncation in
    SQL over the same bytes (documents are ASCII, so VARCHAR ops equal byte
    ops); thumbnails are compared by md5 + length, not raw binary."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.multimodal import resize_thumbnails

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = resize_thumbnails(attach_payload(d))
    return out.select(
        "doc_id",
        "width",
        "height",
        "out_w",
        "out_h",
        F.md5("thumb").alias("thumb_md5"),
        F.octet_length("thumb").cast("long").alias("thumb_len"),
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, GREATEST(1, length(text)) AS n FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST((i * n) // 4 AS BIGINT) AS frame_offset,
           md5(substr(text, CAST((i * n) // 4 AS BIGINT) + 1, 16)) AS frame_md5
    FROM base CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: each payload fans out to 4 evenly-spaced
    frame rows (the video keyframe shape; ST5 fan-out driven through the
    codec-requiring Python stage). Offsets are exact; frame bytes are the
    documented stub slice, value-checked via md5."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.multimodal import sample_frames

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = sample_frames(attach_payload(d))
    return out.select(
        "doc_id", "frame_idx", "frame_offset", F.md5("frame").alias("frame_md5")
    )
