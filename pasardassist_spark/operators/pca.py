"""Distributed PCA for embedding columns: one-pass moment accumulation,
driver-side eigendecomposition, distributed projection.

The split mirrors the k-means train/assign split already used for IVF
(operators/similarity.py): the d x d covariance is TINY (64-dim -> 32 KB)
while the data is huge, so each partition folds its rows into
(count, sum-vector, X^T X grid) via mapInPandas — O(partition) work,
O(d^2) state — and those summaries merge by elementwise sum exactly like
a sketch. The eigendecomposition of the d x d matrix is microseconds of
driver numpy; the resulting components broadcast back and the projection
is an Arrow-batched matmul over the full corpus. No step ever shuffles
the data itself: the only exchange carries d^2-sized moment rows.

At 100 TB: moment accumulation is a scan; merge cost is
(#partitions x d^2) floats; projection is a second scan. This is the
standard production shape (Halko-style randomized variants drop in the
same skeleton when d grows past a few thousand).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def moment_summaries(emb: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition (n, sum, flattened X^T X) rows."""
    import numpy as np
    import pandas as pd

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        xtx = None
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            xtx = g if xtx is None else xtx + g
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
        )

    return emb.select(vec_col).mapInPandas(
        fold, "n long, s array<double>, xtx array<double>"
    )


def fit_components(summaries: DataFrame, k: int):
    """Merge the moment rows and eigendecompose on the driver. Returns
    (mu, W) — mean vector and column-orthonormal d x k loading matrix,
    components ordered by descending eigenvalue with a deterministic
    sign convention (largest-|.| coordinate positive) so results are
    stable across BLAS builds."""
    import numpy as np

    rows = summaries.collect()  # one small row per partition
    n = sum(r.n for r in rows)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    d = s.shape[0]
    xtx = np.sum([np.asarray(r.xtx).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (xtx - n * np.outer(mu, mu)) / (n - 1)
    # symmetrize against float drift before eigh
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return mu, W, vals[order]


def project(emb: DataFrame, vec_col: str, id_col: str, mu, W) -> DataFrame:
    """Distributed projection y = W^T (x - mu), Arrow-batched matmul."""
    import numpy as np
    import pandas as pd

    mu_b = mu.tolist()
    W_b = W.tolist()

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.asarray(mu_b)
        w = np.asarray(W_b)
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - m) @ w
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "proj": list(Y)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} long, proj array<double>"
    )


def pca_project(emb: DataFrame, vec_col: str, id_col: str, k: int) -> DataFrame:
    mu, W, _ = fit_components(moment_summaries(emb, vec_col), k)
    return project(emb, vec_col, id_col, mu, W)


def fit_whitener(summaries: DataFrame, eps: float = 1e-6):
    """ZCA whitening transform (Bell & Sejnowski 1997's zero-phase
    convention): Wz = V diag(1/sqrt(eigval + eps)) V^T from the same
    merged moments as PCA. Wz is symmetric and basis-aligned, so the
    whitened space stays interpretable per-dimension — the standard
    embedding-preprocessing alternative to plain PCA. Sign conventions
    are irrelevant here (V diag V^T is sign-invariant), making the
    transform deterministic across BLAS builds up to float tolerance."""
    import numpy as np

    rows = summaries.collect()  # one small row per partition
    n = sum(r.n for r in rows)
    if n < 2:
        raise ValueError("whitening needs at least 2 rows")
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    d = s.shape[0]
    xtx = np.sum([np.asarray(r.xtx).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (xtx - n * np.outer(mu, mu)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)
    Wz = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)) @ vecs.T
    return mu, Wz


def zca_whiten(
    emb: DataFrame, vec_col: str, id_col: str, eps: float = 1e-6
) -> DataFrame:
    """Distributed ZCA whitening: moment fold -> driver eigh -> Arrow
    matmul scan; the data itself never shuffles (pca_project's shape)."""
    mu, Wz = fit_whitener(moment_summaries(emb, vec_col), eps)
    return project(emb, vec_col, id_col, mu, Wz)
