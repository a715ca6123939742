"""Semantic checks for the experimentation family beyond the oracle
hash-compare (queries/experiments.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

_load_all()


def test_ab_ztest_accounting(spark, sf_dir):
    row = REGISTRY["ab_proportion_ztest"].fn(spark, sf_dir).collect()[0]
    n_cust = load(spark, sf_dir, "customer").count()
    assert row.n_a + row.n_b == n_cust, "every unit lands in exactly one arm"
    assert 0 <= row.conv_a <= row.n_a and 0 <= row.conv_b <= row.n_b
    assert 0.0 < row.rate_a < 1.0 and 0.0 < row.rate_b < 1.0, (
        "degenerate conversion rate — z-test uninformative"
    )
    # hash split should be near 50/50 (binomial 6-sigma bound)
    frac = row.n_a / (row.n_a + row.n_b)
    assert abs(frac - 0.5) < 6 * 0.5 / (n_cust**0.5)


def test_cuped_preserves_overall_mean(spark, sf_dir):
    """CUPED shifts each variant mean by -theta*(mean_x_v - mean_x_all);
    the unit-weighted average of those shifts is identically zero, so the
    pooled mean of the adjusted metric must equal the pooled raw mean."""
    rows = REGISTRY["ab_cuped_adjust"].fn(spark, sf_dir).collect()
    assert {r.variant for r in rows} == {"A", "B"}
    n = sum(r.n_units for r in rows)
    raw = sum(r.n_units * r.mean_metric for r in rows) / n
    adj = sum(r.n_units * r.mean_adjusted for r in rows) / n
    assert abs(raw - adj) < 1e-3, "CUPED must not move the pooled mean"
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1, "theta is global, identical on every row"


def test_path_transitions_are_probabilities(spark, sf_dir):
    df = REGISTRY["path_transitions"].fn(spark, sf_dir).cache()
    try:
        per_src = df.groupBy("src").agg(
            F.count(F.lit(1)).alias("k"), F.sum("p").alias("psum")
        )
        bad = per_src.filter(
            (F.col("k") > 5) | (F.col("psum") > 1.0 + 1e-6)
        )
        assert bad.count() == 0
        assert df.filter((F.col("p") <= 0) | (F.col("p") > 1)).count() == 0
    finally:
        df.unpersist()


def test_rfm_covers_all_ordering_customers(spark, sf_dir):
    df = REGISTRY["rfm_segments"].fn(spark, sf_dir).cache()
    try:
        total = df.agg(F.sum("n_customers")).first()[0]
        want = (
            load(spark, sf_dir, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert total == want
        lims = df.agg(
            F.min("r"), F.max("r"), F.min("f"), F.max("f"),
            F.min("m"), F.max("m"),
        ).first()
        assert min(lims) >= 1 and max(lims) <= 5
    finally:
        df.unpersist()
