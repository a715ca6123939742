"""Distributed IRLS logistic regression (operators/glm.py) pinned
against its sequential numpy twin on identical rows, plus recovery of
known generating coefficients on synthetic data."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pasardassist_spark.operators.glm import (
    irls_logistic,
    irls_logistic_reference,
)


def _synthetic(n=4000, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.normal(size=(n, 2))
    true_beta = np.array([0.5, 1.5, -2.0])  # intercept, b1, b2
    eta = true_beta[0] + X @ true_beta[1:]
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    return X, y, true_beta


def test_distributed_matches_numpy_twin(spark):
    X, y, _ = _synthetic()
    pdf = [(float(a), float(b), float(c)) for (a, b), c in zip(X, y)]
    df = spark.createDataFrame(pdf, "x1 double, x2 double, y double")
    beta_d, se, n = irls_logistic(df, ["x1", "x2"], "y")
    beta_r = irls_logistic_reference(X, y)
    assert n == len(y)
    np.testing.assert_allclose(beta_d, beta_r, atol=1e-6)
    assert np.all(se > 0)


def test_recovers_generating_coefficients(spark):
    X, y, true_beta = _synthetic(n=20000, seed=11)
    pdf = [(float(a), float(b), float(c)) for (a, b), c in zip(X, y)]
    df = spark.createDataFrame(pdf, "x1 double, x2 double, y double")
    beta_d, se, _ = irls_logistic(df, ["x1", "x2"], "y")
    # each estimate within ~4 standard errors of the generator
    assert np.all(np.abs(beta_d - true_beta) < 4 * se + 0.15)


def test_clamp_survives_separable_data(spark):
    # perfectly separable data diverges in unclamped Newton; the +-30
    # clamp must keep H invertible through all iterations
    rows = [(float(i), 1.0 if i > 0 else 0.0) for i in range(-50, 51) if i]
    df = spark.createDataFrame(rows, "x1 double, y double")
    beta_d, se, n = irls_logistic(df, ["x1"], "y")
    assert n == 100 and np.isfinite(beta_d).all() and np.isfinite(se).all()
    assert beta_d[1] > 0  # slope sign right even when diverging


def test_registered_query_shape(spark, sf_dir):
    from pasardassist_spark.queries.registry import REGISTRY, _load_all

    _load_all()
    df = REGISTRY["ml_logreg_irls"].fn(spark, sf_dir)
    rows = {r.feature: r for r in df.collect()}
    assert set(rows) == {"intercept", "x_value", "x_hour", "x_log_events"}
    assert all(r.n_rows > 0 and r.std_err > 0 for r in rows.values())
