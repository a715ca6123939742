"""Lake layout: bucketed silver tables for shuffle-free joins (SURVEY.md §4).

At 100 TB the recurring cost in the reference's query mix is the fact–fact
join (orders ⋈ lineitem-shaped: every marketplace listing joins orders to
tokens on the same key, every stats job re-joins the same tables). Writing
both sides bucketed BY THE JOIN KEY makes that join shuffle-free forever:
Spark's scan planner exposes the bucket hash-partitioning, so SortMergeJoin
consumes both sides in place — no Exchange on either side, verified by
``tests/test_lake.py`` against the physical plan.

Bucket count is the knob that must be chosen at write time: at 100 TB,
buckets ≈ total-data / target-partition-size (e.g. 100 TB / 256 MB ≈ 400k is
too many files per table — in practice bucket the HOT silver tables at
O(10k) and let AQE coalesce reads). Local tests use 8.

``saveAsTable`` goes through the session catalog (in-memory here, Hive/Glue
on a cluster); plain ``.parquet()`` paths cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 8
) -> None:
    """Write ``df`` as a bucketed, sorted managed table. Sorting within
    buckets by the join key lets SortMergeJoin skip its sort too."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Bronze layout: events partitioned by event date (the reference
    domain's natural pruning axis — every dashboard query carries a time
    bound). A day-bounded query then reads ONLY its partitions' files:
    Catalyst turns the `event_date` predicate into a PartitionFilter
    (directory pruning at planning time, no file footers touched) —
    asserted in tests/test_lake.py."""
    from pyspark.sql import functions as F

    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
