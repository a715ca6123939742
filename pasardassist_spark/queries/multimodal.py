"""Multimodal plumbing query: binary payload + metadata -> mapInPandas
feature extraction. The oracle recomputes the deterministic stub decode in
pure SQL (hex-digit arithmetic over md5), so the whole Arrow/mapInPandas
path is value-checked against an independent derivation.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints here
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
    struct driven through an Arrow-batched mapInPandas decode stage. These
    text/plain payloads take the deterministic digest fallback (the oracle
    re-derives it in SQL); real image bytes take the pure-Python decoders —
    see mm_decode_real for that branch's hash-checked coverage."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(attach_payload(d))


@query(
    "mm_decode_real",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 61 + 4 AS w,
               (doc_id * 7) % 53 + 4 AS h,
               CASE doc_id % 3
                   WHEN 0 THEN 'image/x-portable-pixmap'
                   WHEN 1 THEN 'image/bmp'
                   ELSE 'image/png'
               END AS kind
        FROM documents
    )
    SELECT d.doc_id,
           d.kind,
           CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           3 AS channels,
           CAST(SUM(
                 (x.x * 7 + y.y * 13 + d.doc_id) % 256
               + (x.x * 7 + y.y * 13 + d.doc_id + 29) % 256
               + (x.x * 7 + y.y * 13 + d.doc_id + 58) % 256
           ) AS BIGINT) AS pixel_sum
    FROM dims d
    JOIN (SELECT unnest(range(0, 65)) AS x) x ON x.x < d.w
    JOIN (SELECT unnest(range(0, 57)) AS y) y ON y.y < d.h
    GROUP BY d.doc_id, d.kind, d.w, d.h
    """,
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: every document gets a genuine image
    payload (format rotates PPM / BMP / PNG by doc_id % 3; deterministic
    synthetic raster), which the pure-Python codecs in
    operators/imagecodec.py then parse back — netpbm header scan, BMP
    BGR/stride/bottom-up handling, PNG zlib-inflate + scanline unfilter.
    The oracle re-derives dimensions AND the full raster checksum from
    doc_id arithmetic alone, so a hash match certifies byte-exact decode
    across all three containers on 500 real files (encode and decode only
    share the Raster type, not parsing logic)."""
    from pasardassist_spark.operators.multimodal import (
        attach_image_payload,
        decode_images,
    )

    d = load(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_image_payload(d))


@query(
    "mm_resize_real",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               doc_id % 61 + 4 AS w,
               (doc_id * 7) % 53 + 4 AS h
        FROM documents
    ),
    outdims AS (
        SELECT doc_id, w, h,
               GREATEST(CAST(floor(w * LEAST(16.0 / GREATEST(w, h), 1.0))
                   AS INTEGER), 1) AS ow,
               GREATEST(CAST(floor(h * LEAST(16.0 / GREATEST(w, h), 1.0))
                   AS INTEGER), 1) AS oh
        FROM dims
    )
    SELECT d.doc_id,
           CAST(d.w AS INTEGER) AS width,
           CAST(d.h AS INTEGER) AS height,
           CAST(d.ow AS INTEGER) AS out_w,
           CAST(d.oh AS INTEGER) AS out_h,
           CAST(length('P6' || chr(10) || d.ow || ' ' || d.oh
               || chr(10) || '255' || chr(10)) + d.ow * d.oh * 3
               AS BIGINT) AS thumb_len,
           CAST(SUM(
                 ((x.x * d.w) // d.ow * 7 + (y.y * d.h) // d.oh * 13
                   + d.doc_id) % 256
               + ((x.x * d.w) // d.ow * 7 + (y.y * d.h) // d.oh * 13
                   + d.doc_id + 29) % 256
               + ((x.x * d.w) // d.ow * 7 + (y.y * d.h) // d.oh * 13
                   + d.doc_id + 58) % 256
           ) AS BIGINT) AS thumb_sum
    FROM outdims d
    JOIN (SELECT unnest(range(0, 17)) AS x) x ON x.x < d.ow
    JOIN (SELECT unnest(range(0, 17)) AS y) y ON y.y < d.oh
    GROUP BY d.doc_id, d.w, d.h, d.ow, d.oh
    """,
)
def mm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize: decode each genuine payload, nearest-neighbor resample
    to a 16px-max thumbnail, re-encode as binary PPM. The oracle re-derives
    the resampled raster checksum from pure arithmetic (nearest-neighbor
    source coordinate = (dst*src)//out), so the hash match certifies the
    actual pixel work — decode, point-sampling grid, PPM re-encode — not
    just the dimension math."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from pasardassist_spark.operators.multimodal import (
        attach_image_payload,
        resize_images,
    )

    @pandas_udf("long")
    def thumb_pixel_sum(thumb: pd.Series) -> pd.Series:
        from pasardassist_spark.operators import imagecodec

        return thumb.map(lambda b: sum(imagecodec.decode(b).pixels))

    d = load(spark, sf_dir, "documents").select("doc_id")
    out = resize_images(attach_image_payload(d), max_side=16)
    return out.select(
        "doc_id",
        "width",
        "height",
        "out_w",
        "out_h",
        (F.octet_length("thumb")).cast("long").alias("thumb_len"),
        thumb_pixel_sum("thumb").alias("thumb_sum"),
    )


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
