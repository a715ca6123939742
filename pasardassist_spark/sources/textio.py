"""Text-format source connectors (JSONL) with schema enforcement.

The reference ingests from schemaless MongoDB; a lake engine's equivalent
loose-format boundary is newline-delimited JSON. The contract here: reads
ALWAYS pass an explicit schema (never infer — at 100 TB schema inference
is a full extra pass over the data, and drift silently changes dtypes,
the exact failure mode the events-ts incident demonstrated), and the
corrupt-record policy is explicit per call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write as newline-delimited JSON (one object per line, the
    interchange format of every public corpus pipeline)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced JSONL read. ``mode``:

    - FAILFAST (default): any malformed line aborts the job — right for
      closed-loop roundtrips where corruption means a bug;
    - PERMISSIVE + a ``_corrupt_record`` column: quarantine-style ingest
      of third-party corpora, where bad lines route to a DLQ instead of
      poisoning the batch.
    """
    if mode == "PERMISSIVE" and "_corrupt_record" not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType(), True)]
        )
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Write as headered CSV. Free-text columns force the full quoting
    dialect: fields containing delimiter/quote/newline are quoted, quotes
    doubled — the dialect ``read_csv`` reverses exactly."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-enforced CSV read (same contract as read_jsonl: never infer
    — inference is an extra full pass and a silent-drift hazard). multiLine
    handles quoted embedded newlines in text columns; PERMISSIVE adds the
    ``_corrupt_record`` DLQ column, FAILFAST aborts on any malformed row."""
    if mode == "PERMISSIVE" and "_corrupt_record" not in schema.fieldNames():
        schema = StructType(
            list(schema.fields)
            + [StructField("_corrupt_record", StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
