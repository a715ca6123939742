"""As-of join — a custom operator Spark lacks natively (SURVEY.md §2.10).

Semantics: for each left row, attach the LATEST right row with the same key
whose timestamp is <= the left timestamp (backward as-of; the standard
"price in effect at trade time" join). The reference hand-rolls this shape
wherever it stamps an event with the then-current CoinMarketCap rate
(tasks.common.ts:94-122 caches the latest rate and reads it at write time —
an as-of join with whatever happened to be cached; the Spark form is
deterministic by construction).

Implementation (composition of existing DataFrame ops — no UDF, no range
explosion): tag and UNION both sides, then one window per key ordered by
(ts, side) with ``last(value, ignorenulls=True)`` carrying each right value
forward onto subsequent left rows. Cost: ONE hash shuffle of |left| +
|right| rows and a per-key sort — the same price as the join itself; never
the quadratic left×right-candidates a naive range join plans.

Skew note: the window partitions by the join key, so a LOW-cardinality key
(e.g. a handful of currencies) concentrates the sort on few tasks. For that
shape, pre-bucket by time range instead (compose with
``operators.rangejoin.range_join`` using the right side's validity
intervals), or pick a composite key; the classic salting trick does NOT
apply — the carry-forward needs all of a key's rows in one partition. Right rows
sort BEFORE left rows at equal timestamps, so an exactly-at-ts right row is
visible (inclusive <=, matching DuckDB's ASOF JOIN, which the driver oracle
uses as the independent implementation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: left rows gain ``value_cols`` from the latest
    right row (per ``keys``) with ``right_ts <= left_ts``; no match => null.
    All of ``left``'s columns are preserved.

    Contract: ``value_cols`` must not collide with left's columns (checked);
    right rows with a null timestamp are dropped (DuckDB ASOF semantics —
    ``ts >= NULL`` never matches; without the drop they would sort first
    and be carried onto everything)."""
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    right = right.filter(F.col(right_ts).isNotNull())
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    combined = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = combined.select(
        *lcols,
        "_side",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
