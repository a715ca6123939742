"""Exact distributed median — the banded two-pass selection.

``F.median`` / ``F.expr("percentile(c, 0.5)")`` are exact but buffer the
ENTIRE column in one final reducer: at stat_theilsen_line's K=1e4 design
point that is ~1e8 slope doubles (~400 MB) in a single task — the
documented single-reducer ceiling (and measured as 98% of that query's
wall at bench scale). percentile_approx partial-merges map-side but is
not exact, so it cannot back a DuckDB ``median`` oracle.

The classic fix keeps both: selection by value-band narrowing.

1. one parallel pass: ``n = count``, plus percentile_approx at
   0.5 ± pad with accuracy A. The sketch's rank guarantee (error
   <= n/A) makes [lo, hi] a certified bracket of the middle ranks when
   pad >= 2/A: rank(lo) <= n(0.5 - 1/A) and rank(hi) >= n(0.5 + 1/A).
2. one parallel pass: count of values strictly below ``lo`` and the
   band rows ``lo <= v <= hi`` — expected ~n * (2*pad + 2/A) rows
   (~6e-4 * n at the defaults: 60 k rows at n=1e8), collected and
   selected driver-side at the exact global ranks. Even n averages the
   two middles, matching both Spark's and DuckDB's ``median``.

Every corpus-sized stage partial-aggregates map-side; nothing bigger
than the band ever reaches one task. If the sketch guarantee is somehow
violated (it cannot be, by the published bound — this is a guard, not a
branch we expect) the helper falls back to the exact single-reducer
median rather than return a wrong answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ACC = 10_000  # percentile_approx accuracy: rank error <= n / _ACC
_PAD = 2.0 / _ACC  # quantile offsets bracketing the middle ranks


def exact_median_scalar(df: DataFrame, col: str) -> tuple[float | None, int]:
    """Exact median of ``df[col]`` as a driver-side scalar, plus the
    non-null count. Two fully-parallel passes; only the ~6e-4 * n value
    band is ever collected. Returns (None, 0) on an empty/all-null column.
    """
    c = F.col(col)
    head = df.agg(
        F.count(c).alias("n"),
        F.percentile_approx(c, 0.5 - _PAD, _ACC).alias("lo"),
        F.percentile_approx(c, 0.5 + _PAD, _ACC).alias("hi"),
    ).first()
    n = int(head.n)
    if n == 0:
        return None, 0
    lo, hi = float(head.lo), float(head.hi)
    # 1-based middle ranks: r1 == r2 for odd n, adjacent middles for even
    r1, r2 = (n + 1) // 2, (n + 2) // 2
    stats = df.agg(
        F.sum(F.when(c < lo, 1).otherwise(0)).cast("long").alias("below"),
        F.sort_array(
            F.collect_list(F.when((c >= lo) & (c <= hi), c))
        ).alias("band"),
    ).first()
    below, band = int(stats.below), list(stats.band)
    i1, i2 = r1 - below - 1, r2 - below - 1  # 0-based offsets into band
    if i1 < 0 or i2 >= len(band):
        # Sketch-guarantee guard (unreachable by the published bound):
        # fall back to the exact single-reducer median.
        return (
            float(df.agg(F.median(c)).first()[0]),
            n,
        )
    return (band[i1] + band[i2]) / 2.0, n
