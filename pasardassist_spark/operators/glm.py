"""Distributed generalized linear model fitting via IRLS — the MLlib/
statsmodels algorithm re-expressed as plain DataFrame aggregates.

Each Newton/IRLS iteration needs exactly two moment blocks:

    g = X^T (y - p)          (d sums)
    H = X^T diag(w) X        (d(d+1)/2 sums, w = p(1-p))

Both are single partial-merging hash aggregates over the feature frame —
all column products stay JVM-side in one WholeStageCodegen span; the ONLY
driver traffic per iteration is the 1-row moment vector (metadata-scale:
~d^2 doubles), solved as a d x d system in numpy and folded back into the
next iteration's expressions as literals.  This is the textbook
"aggregate statistics, solve small" split every distributed GLM uses
(Spark MLlib LogisticRegression does the same with treeAggregate); cost
is ITERS scans of a cached projection, never a shuffle of data rows.

The linear predictor is clamped to +-30 before exp (sigmoid saturates at
~1e-13 beyond that), making the iteration numerically stable without
changing any non-degenerate fit.  tests/test_glm.py pins the distributed
path against a sequential numpy IRLS on the identical rows to 1e-8.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, functions as F

IRLS_ITERS = 8
_CLAMP = 30.0


def _sigmoid_col(eta: Column) -> Column:
    e = F.least(F.greatest(eta, F.lit(-_CLAMP)), F.lit(_CLAMP))
    return 1.0 / (1.0 + F.exp(-e))


def irls_logistic(
    df: DataFrame, feature_cols: list[str], label_col: str,
    iters: int = IRLS_ITERS,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Fit logistic regression (intercept prepended) by IRLS.

    Returns (beta, standard errors from the final inverse Hessian, n).
    ``df`` should be persisted by the caller if the input is not a
    cheap scan — each iteration is one aggregate over it."""
    names = ["__icpt"] + list(feature_cols)
    d = len(names)
    feats = df.select(
        F.lit(1.0).alias("__icpt"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    beta = np.zeros(d)
    n = 0
    for _ in range(iters):
        eta = sum(
            (F.col(c) * float(b) for c, b in zip(names[1:], beta[1:])),
            F.lit(float(beta[0])),
        )
        p = _sigmoid_col(eta)
        w = p * (1.0 - p)
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for i, ci in enumerate(names):
            aggs.append(
                F.sum(F.col(ci) * (F.col("__y") - p)).alias(f"g{i}")
            )
            for j, cj in enumerate(names[: i + 1]):
                aggs.append(
                    F.sum(F.col(ci) * F.col(cj) * w).alias(f"h{i}_{j}")
                )
        row = feats.agg(*aggs).collect()[0]  # 1 row, ~d^2 doubles
        n = row["__n"]
        g = np.array([row[f"g{i}"] for i in range(d)])
        H = np.zeros((d, d))
        for i in range(d):
            for j in range(i + 1):
                H[i, j] = H[j, i] = row[f"h{i}_{j}"]
        beta = beta + np.linalg.solve(H, g)
    # ADVICE r13: the loop's last H was built at the PENULTIMATE beta —
    # one extra Hessian-only aggregate at the final beta, so std_err/z
    # describe the reported coefficients, not the previous Newton step
    eta = sum(
        (F.col(c) * float(b) for c, b in zip(names[1:], beta[1:])),
        F.lit(float(beta[0])),
    )
    p = _sigmoid_col(eta)
    w = p * (1.0 - p)
    aggs = []
    for i, ci in enumerate(names):
        for j, cj in enumerate(names[: i + 1]):
            aggs.append(F.sum(F.col(ci) * F.col(cj) * w).alias(f"h{i}_{j}"))
    row = feats.agg(*aggs).collect()[0]
    for i in range(d):
        for j in range(i + 1):
            H[i, j] = H[j, i] = row[f"h{i}_{j}"]
    se = np.sqrt(np.diag(np.linalg.inv(H)))
    return beta, se, n


def irls_logistic_reference(
    X: np.ndarray, y: np.ndarray, iters: int = IRLS_ITERS
) -> np.ndarray:
    """Sequential numpy twin of irls_logistic (same clamp, same iteration
    count, intercept prepended) — the pytest oracle."""
    Xb = np.hstack([np.ones((len(X), 1)), X])
    beta = np.zeros(Xb.shape[1])
    for _ in range(iters):
        eta = np.clip(Xb @ beta, -_CLAMP, _CLAMP)
        p = 1.0 / (1.0 + np.exp(-eta))
        w = p * (1.0 - p)
        g = Xb.T @ (y - p)
        H = (Xb * w[:, None]).T @ Xb
        beta = beta + np.linalg.solve(H, g)
    return beta
