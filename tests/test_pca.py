"""PCA operator guarantees (operators/pca.py): moment-merge correctness
vs direct numpy, component orthonormality, variance ordering, and
projection consistency."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pasardassist_spark.operators.pca import (
    fit_components,
    moment_summaries,
    pca_project,
)
from pasardassist_spark.operators.similarity import as_double
from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

_load_all()

K = 8


def _corpus(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )


def test_distributed_moments_match_direct_numpy(spark, sf_dir):
    emb = _corpus(spark, sf_dir)
    X = np.stack([r.v for r in emb.orderBy("vec_id").collect()])
    mu, W, vals = fit_components(moment_summaries(emb, "v"), K)
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False)
    direct = np.sort(np.linalg.eigvalsh(cov))[::-1][:K]
    assert np.allclose(np.sort(vals)[::-1], direct, rtol=1e-8), (
        "merged moments must reproduce the exact covariance spectrum"
    )


def test_components_orthonormal_and_variance_ordered(spark, sf_dir):
    emb = _corpus(spark, sf_dir)
    mu, W, vals = fit_components(moment_summaries(emb, "v"), K)
    assert np.allclose(W.T @ W, np.eye(K), atol=1e-8)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(K - 1))
    # per-component projected variance == eigenvalue (the PCA identity)
    proj = pca_project(emb, "v", "vec_id", K)
    Y = np.stack([r.proj for r in proj.collect()])
    assert np.allclose(Y.var(axis=0, ddof=1), vals, rtol=1e-6)
    # deterministic sign convention
    for j in range(K):
        i = int(np.argmax(np.abs(W[:, j])))
        assert W[i, j] > 0


def test_pca_beats_any_other_k_dim_projection_on_variance(spark, sf_dir):
    """Captured variance must be the top-K eigenvalue mass — strictly
    more than a random orthonormal K-frame captures (optimality smoke)."""
    emb = _corpus(spark, sf_dir)
    X = np.stack([r.v for r in emb.collect()])
    mu, W, vals = fit_components(moment_summaries(emb, "v"), K)
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.standard_normal((X.shape[1], K)))
    var_pca = ((X - X.mean(0)) @ W).var(axis=0, ddof=1).sum()
    var_rand = ((X - X.mean(0)) @ Q).var(axis=0, ddof=1).sum()
    assert var_pca >= var_rand


def test_registered_query_shape(spark, sf_dir):
    df = REGISTRY["emb_pca_project"].fn(spark, sf_dir)
    rows = df.limit(5).collect()
    # proj is serialized as a comma-joined 6dp string (driver comparator
    # cannot hash list cells) — parse it back and check dimensionality
    assert all(len(r.proj.split(",")) == K for r in rows)
    assert all(
        all(abs(float(x)) < 1e6 for x in r.proj.split(",")) for r in rows
    )
    assert df.count() == load(spark, sf_dir, "embeddings").count()


def test_zca_whitened_covariance_is_identity(spark):
    """The defining property: the whitened sample covariance is I (up to
    the eps regularizer), and the whitened mean is 0."""
    import numpy as np

    from pasardassist_spark.operators.pca import zca_whiten

    rng = np.random.RandomState(7)
    A = rng.randn(4, 4)
    X = rng.randn(400, 4) @ A + np.array([1.0, -2.0, 0.5, 3.0])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        schema="vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(8)
    out = zca_whiten(df, "embedding", "vec_id", eps=1e-9)
    Y = np.stack([np.asarray(r.proj) for r in out.collect()])
    assert np.allclose(Y.mean(axis=0), 0.0, atol=1e-8)
    cov = np.cov(Y, rowvar=False)
    assert np.allclose(cov, np.eye(4), atol=1e-5)


def test_zca_matches_direct_numpy(spark):
    import numpy as np

    from pasardassist_spark.operators.pca import zca_whiten

    rng = np.random.RandomState(11)
    X = rng.randn(60, 3) * np.array([3.0, 1.0, 0.2]) + 5.0
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        schema="vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(5)
    got = {
        r.vec_id: np.asarray(r.proj)
        for r in zca_whiten(df, "embedding", "vec_id", eps=1e-6).collect()
    }
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2)
    Wz = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0) + 1e-6)) @ vecs.T
    ref = (X - mu) @ Wz  # Wz symmetric: right-multiply == transform
    for i in range(60):
        assert np.allclose(got[i], ref[i], atol=1e-8)
