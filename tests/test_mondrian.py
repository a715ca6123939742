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


def test_n_below_k_raises(spark):
    """r17 ADVICE: 0 < N < k means the root can never split AND never
    satisfy k — the operator must refuse, not emit a class of size N."""
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id int, v double"
    )
    with pytest.raises(ValueError, match="unattainable"):
        mondrian_anonymize(df, ["v"], 5)


def test_internal_name_clash_raises(spark):
    """r17 ADVICE: input columns colliding with internal/output names
    fail loudly (the packing operators' _INTERNAL contract)."""
    for bad in ("class_id", "_lbl", "v_lo"):
        df = spark.createDataFrame(
            [(float(i), i) for i in range(8)], f"v double, `{bad}` int"
        )
        with pytest.raises(ValueError, match="collide"):
            mondrian_anonymize(df, ["v"], 2)


def _release_invariants(out, src, qi, k):
    n = src.count()
    assert out.count() == n
    cls = out.groupBy("class_id").agg(
        F.count(F.lit(1)).alias("n"), F.first("class_size").alias("sz")
    )
    assert cls.filter(
        (F.col("n") < k) | (F.col("n") != F.col("sz"))
    ).count() == 0
    assert cls.agg(F.sum("n")).first()[0] == n
    j = out.join(src, src.columns[0])
    cond = None
    for c in qi:
        bad = (F.col(c) < F.col(f"{c}_lo")) | (F.col(c) > F.col(f"{c}_hi"))
        cond = bad if cond is None else (cond | bad)
    assert j.filter(cond).count() == 0
    return cls.count()


def test_strict_splits_where_relaxed_stops(spark):
    """The tie-pathological fixture from the module note: the widest
    dimension ('z', massively tied at its median) always fails the exact
    side check; relaxed leafs the root, strict falls back to the uniform
    dimension and keeps splitting — finer classes, same k guarantee."""
    rows = [(i, 0.0 if i < 15 else 1000.0, float(i)) for i in range(16)]
    src = spark.createDataFrame(rows, "id int, z double, a double")
    relaxed = mondrian_anonymize(src, ["z", "a"], 4)
    strict = mondrian_anonymize(src, ["z", "a"], 4, strict=True)
    n_relaxed = _release_invariants(relaxed, src, ["z", "a"], 4)
    n_strict = _release_invariants(strict, src, ["z", "a"], 4)
    assert n_relaxed == 1, "widest-dim tie must leaf the relaxed root"
    assert n_strict == 4, "strict retries the uniform dim at every level"


def test_strict_invariants_on_customer(spark, sf_dir):
    src = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    k = 25
    qi = ["c_acctbal", "c_nationkey"]
    strict = mondrian_anonymize(src, qi, k, strict=True)
    n_strict = _release_invariants(strict, src, qi, k)
    relaxed_n = (
        mondrian_anonymize(src, qi, k).select("class_id").distinct().count()
    )
    # strict never produces COARSER classes than relaxed
    assert n_strict >= relaxed_n
