"""distributed_row_number / ntile_from_rank (round-16): must equal the
single-node window forms VALUE-FOR-VALUE on every shape that matters —
ties broken by a unique key, descending orders via negated bucket keys,
n < k, n % k != 0 — while planning the bucketed two-phase shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from pasardassist_spark.operators.packing import (
    distributed_row_number,
    ntile_from_rank,
)


def _frame(spark, n=997, seed=7):
    # values with heavy ties (mod 31) + a unique tiebreaker id
    return spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        F.pmod(F.col("id") * 2654435761 % 2**31, F.lit(31)).cast("long").alias("v"),
    )


@pytest.mark.parametrize("k", [1, 3, 5, 10, 64, 2000])
def test_ntile_matches_builtin_ascending(spark, k):
    df = _frame(spark)
    n = df.count()
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("tile")
    )
    rk = distributed_row_number(df, F.col("v"), ["v", "id"], out="rk", n_buckets=16)
    got = rk.select(
        "id", ntile_from_rank(F.col("rk"), F.lit(n).cast("long"), k).alias("tile")
    )
    diffs = (
        want.alias("w")
        .join(got.alias("g"), "id")
        .filter(F.col("w.tile") != F.col("g.tile"))
        .count()
    )
    assert diffs == 0


def test_row_number_matches_builtin_descending(spark):
    """DESC metric order via a negated bucket key; decimal-ish doubles."""
    df = _frame(spark).withColumn("m", F.col("v") * 1.5 + 0.25)
    want = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("m"), F.asc("id")))
        .alias("rk"),
    )
    got = distributed_row_number(
        df, -F.col("m"), [F.desc("m"), F.asc("id")], out="rk", n_buckets=16
    ).select("id", "rk")
    diffs = (
        want.alias("w")
        .join(got.alias("g"), "id")
        .filter(F.col("w.rk") != F.col("g.rk"))
        .count()
    )
    assert diffs == 0


def test_small_n_and_empty(spark):
    # n < k: NTILE gives tile = rk
    df = spark.range(4).select(F.col("id").alias("id"), F.col("id").alias("v"))
    rk = distributed_row_number(df, F.col("v"), ["v", "id"])
    got = {
        r.id: r.tile
        for r in rk.select(
            "id", ntile_from_rank(F.col("rk"), F.lit(4).cast("long"), 10).alias("tile")
        ).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3, 3: 4}
    empty = df.filter(F.lit(False))
    out = distributed_row_number(empty, F.col("v"), ["v", "id"])
    assert out.count() == 0


def test_plan_is_bucketed_not_single_partition(spark):
    df = _frame(spark, n=5000)
    got = distributed_row_number(df, F.col("v"), ["v", "id"], n_buckets=16)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pb" in plan
    # the only SinglePartition window is the 16-row offsets frame
    import re

    specs = re.findall(r"windowspecdefinition\((\w+)#\d+", plan)
    assert specs and all(c == "_pb" for c in specs), specs


@pytest.mark.parametrize("name", ["rfm_segments", "stat_gini_lorenz"])
def test_distributed_branch_matches_oracle(spark, name, monkeypatch):
    """The adaptive dispatch's DISTRIBUTED branch (forced via threshold 0)
    must hash-match the same DuckDB NTILE oracle the plain-window branch
    matches — both strategies are value-identical."""
    from pasardassist_spark.operators import packing
    from pasardassist_spark.queries.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR
    from tests.oracle_compare import assert_matches_oracle

    _load_all()
    monkeypatch.setattr(packing, "SINGLE_SORT_MAX_ROWS", 0)
    spark.catalog.clearCache()
    spec = REGISTRY[name]
    assert_matches_oracle(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR, name=name)


def test_null_bucket_key_raises_loudly(spark):
    """A null/NaN bucket key cannot be placed consistently with the
    single-node window's NULLS FIRST/LAST rule, so it must RAISE (r16
    review: F.least used to clamp nulls silently into the last bucket,
    misranking them)."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0)], "id long, v double"
    )
    with pytest.raises(Exception, match="null"):
        distributed_row_number(df, F.col("v"), ["v", "id"]).collect()
