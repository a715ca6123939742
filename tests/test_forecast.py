"""Holt-Winters contracts (operators/forecast.py): the Spark path equals
the sequential reference on identical series, seasonal signals are
recovered, short series raise."""

from __future__ import annotations

import numpy as np
import pytest

from pasardassist_spark.operators.forecast import (
    HW_HORIZON,
    HW_SEASON,
    holt_winters_additive,
)


def test_pure_seasonal_signal_recovered():
    # exact 7-periodic signal: forecasts must continue the pattern
    pattern = np.array([10.0, 12, 9, 14, 11, 8, 13])
    x = np.tile(pattern, 8)  # 56 points
    fc, sse = holt_winters_additive(x)
    np.testing.assert_allclose(fc, pattern, atol=0.5)
    assert sse < 1e-18  # one-step predictions exact on a pure cycle


def test_linear_trend_extrapolated():
    # 24 seasons of pure trend: the (spurious) initial seasonal
    # estimates have decayed and the forecast is the line
    x = np.arange(1, 169, dtype=float)
    fc, _ = holt_winters_additive(x)
    np.testing.assert_allclose(fc, np.arange(169, 169 + HW_HORIZON), atol=0.1)


def test_short_series_raises():
    with pytest.raises(ValueError, match="needs >= "):
        holt_winters_additive(np.ones(2 * HW_SEASON - 1))


def test_spark_query_matches_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from pasardassist_spark.queries.registry import REGISTRY, _load_all
    from pasardassist_spark.tables import load

    _load_all()
    got = {
        r.h: (r.forecast, r.sse_insample)
        for r in REGISTRY["ts_holt_winters"].fn(spark, sf_dir).collect()
    }
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum("value").alias("x"))
        .orderBy("day")
        .collect()
    )
    fc, sse = holt_winters_additive(np.array([r.x for r in daily]))
    assert set(got) == set(range(1, HW_HORIZON + 1))
    for h in got:
        assert got[h][0] == pytest.approx(float(fc[h - 1]), abs=1e-5)
        assert got[h][1] == pytest.approx(float(sse), rel=1e-6)
