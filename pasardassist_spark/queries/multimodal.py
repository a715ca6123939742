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
