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


# --- standing silver layout for the hot fact-fact paths ---------------------
#
# The two slowest warm queries in the bench (a11_collection_stats and
# j2_composite_key) are both fact⋈fact joins that re-shuffle the same tables
# every run. On a real lake the silver layer is WRITTEN bucketed by the join
# key once, and every subsequent query consumes the bucketing in place —
# amortized across thousands of runs, which is exactly the reference's cron
# workload shape (statisticCollectionItems every 10 min). These helpers
# materialize that layout; the bench times the query-on-bucketed path
# separately from the plain-parquet path so both numbers are visible.

SILVER_BUCKETS = 8  # local test knob; O(10k) at 100 TB, AQE coalesces reads


def prepare_silver(spark: SparkSession, sf_dir: str, n_buckets: int = SILVER_BUCKETS) -> None:
    """One-time silver write: orders+lineitem bucketed by orderkey (the a11
    join key) and lineitem bucketed by (partkey, suppkey) (the j2 self-join
    and group key). Idempotent per session."""
    import shutil
    from urllib.parse import urlparse

    from pasardassist_spark.tables import load

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    for t in ("silver_orders_by_ok", "silver_lineitem_by_ok", "silver_lineitem_by_ps"):
        # A fresh session's in-memory catalog doesn't know tables a previous
        # process wrote, but their warehouse dirs persist and block
        # saveAsTable — drop both sides.
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if warehouse:
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    write_bucketed(o, "silver_orders_by_ok", ["o_orderkey"], n_buckets)
    write_bucketed(li, "silver_lineitem_by_ok", ["l_orderkey"], n_buckets)
    write_bucketed(
        li, "silver_lineitem_by_ps", ["l_partkey", "l_suppkey"], n_buckets
    )


def a11_collection_stats_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a11 flagship on the silver layout: the lineitem⋈orders join consumes
    bucket partitioning in place (zero Exchange on the join — plan-tested);
    the only remaining shuffle is the l_suppkey aggregation."""
    from pyspark.sql import functions as F

    from pasardassist_spark.queries.aggregates import _disc_price
    from pasardassist_spark.tables import load

    li = read_table(spark, "silver_lineitem_by_ok")
    o = read_table(spark, "silver_orders_by_ok").select("o_orderkey", "o_custkey")
    s = load(spark, sf_dir, "supplier")
    disc_price = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    stats = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("items"),
            F.countDistinct("o_custkey").alias("owners"),
            F.sum(F.when(F.col("l_linestatus") == "F", disc_price).otherwise(zero))
            .cast("double")
            .alias("trade_volume"),
            F.min(F.when(F.col("l_returnflag") != "A", F.col("l_extendedprice"))).alias(
                "lowest_price"
            ),
        )
    )
    return stats.join(F.broadcast(s), stats.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "items", "owners", "trade_volume", "lowest_price"
    )


def j2_composite_key_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j2 on the silver layout: lineitem bucketed by (l_partkey, l_suppkey)
    makes BOTH the group-by partial aggregation and the self-join consume
    the bucket partitioning — the whole query plans with zero Exchange."""
    from pyspark.sql import functions as F

    li = read_table(spark, "silver_lineitem_by_ps")
    g = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("ps_qty")
    )
    return (
        li.join(g, ["l_partkey", "l_suppkey"])
        .filter(F.col("ps_qty") > 100)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "ps_qty")
    )


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
