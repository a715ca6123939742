"""Bucketed-table layout tests: the co-located join must plan with NO
shuffle on either side, and results must equal the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.plans import plan, shuffle_count
from pasardassist_spark.sources.lake import read_table, write_bucketed
from pasardassist_spark.tables import load


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    # managed tables land in the session's default warehouse dir
    # (spark-warehouse/ under cwd, gitignored); dropped at the end.
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "bkt_lineitem", ["o_orderkey"], 8
    )

    bo, bl = read_table(spark, "bkt_orders"), read_table(spark, "bkt_lineitem")
    joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    p = plan(joined)
    # the join itself consumes bucket partitioning in place: the only
    # allowed Exchange is the tiny post-join aggregation shuffle
    assert shuffle_count(p) <= 1, p

    plain = o.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    got = {(r.o_orderstatus, r.n) for r in joined.collect()}
    want = {(r.o_orderstatus, r.n) for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    import re

    from pasardassist_spark.sources.lake import write_date_partitioned

    ev = load(spark, sf_dir, "events")
    path = str(tmp_path / "bronze_events")
    write_date_partitioned(ev, path)

    one_day = ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").first().d
    q = spark.read.parquet(path).filter(F.col("event_date") == one_day)
    p = plan(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "event_date" in m.group(1), p  # predicate became dir pruning
    # pruned read returns exactly that day's rows
    want = ev.filter(F.to_date("ts") == one_day).count()
    assert q.count() == want and want > 0
