"""Semantic checks for the trend family (queries/trends.py) beyond the
oracle hash-compare: spine density, LOCF carry, EWMA fixed points, and
z-score baseline hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all

_load_all()


def test_gap_fill_is_dense_and_locf_carries(spark, sf_dir):
    df = REGISTRY["ts_gap_fill"].fn(spark, sf_dir).cache()
    try:
        types = df.select("event_type").distinct().count()
        days = df.select("day").distinct().count()
        assert df.count() == types * days, "spine is not the full cross grid"
        # gap rows: zero events, NULL day_value, but locf_value present
        # whenever any prior day for that type had data
        gaps = df.filter(F.col("n_events") == 0)
        assert gaps.filter(F.col("day_value").isNotNull()).count() == 0
        # LOCF equals the most recent non-null day_value before the gap
        w_ok = df.filter(
            F.col("locf_value").isNotNull() & (F.col("n_events") > 0)
        )
        assert w_ok.filter(
            F.col("locf_value") != F.col("day_value")
        ).count() == 0, "LOCF must equal day_value on observed days"
    finally:
        df.unpersist()


def test_ewma_constant_series_fixed_point(spark, sf_dir):
    # On days where the last 8 observations are identical, the renormalized
    # EWMA equals that value exactly. Verify algebraically on real data by
    # checking ewma is always within [min, max] of the trailing window.
    df = REGISTRY["ts_ewma"].fn(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)
    chk = df.select(
        "event_type",
        "day",
        "ewma",
        F.min("day_value").over(w).alias("lo"),
        F.max("day_value").over(w).alias("hi"),
    )
    bad = chk.filter(
        (F.col("ewma") < F.col("lo") - 1e-6)
        | (F.col("ewma") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0, "EWMA left the convex hull of its window"


def test_zscore_baseline_hygiene(spark, sf_dir):
    df = REGISTRY["ts_zscore_anomaly"].fn(spark, sf_dir).cache()
    try:
        # fewer than 3 baseline days -> no score, never an anomaly
        young = df.filter(F.col("baseline_days") < 3)
        assert young.filter(F.col("zscore").isNotNull()).count() == 0
        assert young.filter(F.col("is_anomaly")).count() == 0
        # every anomaly has a score with |z| > 2
        assert (
            df.filter(F.col("is_anomaly"))
            .filter(F.abs("zscore") <= 2.0)
            .count()
            == 0
        )
    finally:
        df.unpersist()
