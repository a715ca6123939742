"""Mondrian k-anonymization (operators/mondrian.py): the k guarantee,
the partition property, range containment, and the 1-D cut structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasardassist_spark.operators.mondrian import mondrian_anonymize
from pasardassist_spark.tables import load


def test_invariants_on_customer(spark, sf_dir):
    src = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    n = src.count()
    k = 25
    out = mondrian_anonymize(src, ["c_acctbal", "c_nationkey"], k).persist()
    assert out.count() == n, "row grain preserved"
    # every class >= k, classes partition the rows
    cls = out.groupBy("class_id").agg(
        F.count(F.lit(1)).alias("n"), F.first("class_size").alias("sz")
    )
    bad = cls.filter((F.col("n") < k) | (F.col("n") != F.col("sz"))).count()
    assert bad == 0
    assert cls.agg(F.sum("n")).first()[0] == n
    # range containment: each original value lies inside its release range
    j = out.join(src, "c_custkey")
    assert j.filter(
        (F.col("c_acctbal") < F.col("c_acctbal_lo"))
        | (F.col("c_acctbal") > F.col("c_acctbal_hi"))
        | (F.col("c_nationkey") < F.col("c_nationkey_lo"))
        | (F.col("c_nationkey") > F.col("c_nationkey_hi"))
    ).count() == 0
    # the release actually generalized: more than one class, and classes
    # are not all-of-space (max range < global range on some class)
    n_cls = cls.count()
    assert n_cls > 1
    # utility monotonicity: larger k -> no more classes
    bigger = mondrian_anonymize(src, ["c_acctbal", "c_nationkey"], 4 * k)
    assert bigger.select("class_id").distinct().count() <= n_cls
    out.unpersist()


def test_one_dim_cuts_are_disjoint_intervals(spark):
    """Relaxed Mondrian on one dimension produces value-disjoint leaf
    intervals (ties go left at each median), ordered on the line."""
    rows = [(i, float(v)) for i, v in enumerate(
        [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987]
    )]
    df = spark.createDataFrame(rows, "id int, v double")
    out = mondrian_anonymize(df, ["v"], 4)
    leaves = sorted(
        {(r.v_lo, r.v_hi) for r in out.collect()}
    )
    assert len(leaves) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(leaves, leaves[1:]):
        assert hi1 < lo2, f"overlapping leaf intervals: {leaves}"
    sizes = out.groupBy("class_id").count().collect()
    assert all(r["count"] >= 4 for r in sizes)


def test_k_larger_than_half_means_single_class(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id int, v double"
    )
    out = mondrian_anonymize(df, ["v"], 6)  # no cut can give two >= 6 sides
    assert out.select("class_id").distinct().count() == 1
    row = out.first()
    assert (row.v_lo, row.v_hi, row.class_size) == (0.0, 9.0, 10)


def test_null_qi_raises_loudly(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 5.0)], "id int, v double"
    )
    with pytest.raises(Exception, match="null"):
        mondrian_anonymize(df, ["v"], 1).count()
    with pytest.raises(ValueError, match="k must be"):
        mondrian_anonymize(df, ["v"], 0)


def test_degenerate_inputs(spark):
    """r17 review: an empty frame returns the empty release with the full
    output schema (not a TypeError at float(None)); an all-null QI column
    raises the contract error eagerly on the driver."""
    empty = spark.createDataFrame([], "id int, v double")
    out = mondrian_anonymize(empty, ["v"], 2)
    assert out.count() == 0
    assert out.columns == ["id", "v_lo", "v_hi", "class_id", "class_size"]
    all_null = spark.createDataFrame([(1, None), (2, None)], "id int, v double")
    with pytest.raises(ValueError, match="null on every"):
        mondrian_anonymize(all_null, ["v"], 1)
