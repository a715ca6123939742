"""As-of join — a custom operator Spark lacks natively (SURVEY.md §2.10).

Semantics: for each left row, attach the LATEST right row with the same key
whose timestamp is <= the left timestamp (backward as-of; the standard
"price in effect at trade time" join). The reference hand-rolls this shape
wherever it stamps an event with the then-current CoinMarketCap rate
(tasks.common.ts:94-122 caches the latest rate and reads it at write time —
an as-of join with whatever happened to be cached; the Spark form is
deterministic by construction).

Two physical strategies, chosen by the RIGHT side's shape:

- :func:`asof_join` (union + window): tag and UNION both sides, then one
  window per key ordered by (ts, side) with ``last(value, ignorenulls=True)``
  carrying each right value forward onto subsequent left rows. Cost: ONE
  hash shuffle of |left| + |right| rows and a per-key sort. The right
  strategy when the KEY is high-cardinality (wallets, tokens) so the sort
  spreads over many tasks.

- :func:`asof_join_broadcast` (dense broadcast lookup): when the right side
  is dim-sized (a rate feed: few keys x a bounded time span), precompute a
  dense per-(key, time-bucket) lookup — in-bucket right rows as a sorted
  array plus the carried "latest before this bucket" row — broadcast it,
  and resolve each left row with ONE broadcast hash join and a JVM array
  probe. The big side never shuffles and never sorts; this is the
  scale-safe form for low-cardinality keys, where the union+window form
  would concentrate the whole fact table onto |keys| tasks.

NULL semantics (both forms, matching DuckDB's ASOF JOIN, which the driver
oracle uses as the independent implementation): right rows with a null key
or null timestamp never match anything; left rows with a null key or null
timestamp match nothing and keep null values. Right rows sort BEFORE left
rows at equal timestamps, so an exactly-at-ts right row is visible
(inclusive <=).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Internal working names; caller frames must not already use them.
_INTERNAL = ("_ats", "_side", "_b", "_rows", "_carry", "_maxb")


def _check_collisions(df: DataFrame, value_cols: Sequence[str], side: str) -> None:
    clash = (set(_INTERNAL) | {f"_v_{c}" for c in value_cols}) & set(df.columns)
    if clash:
        raise ValueError(
            f"{side} columns collide with asof-join internal names: {sorted(clash)}"
        )


def _ts_micros(df: DataFrame, col: str) -> Column:
    """Integral microseconds for either TIMESTAMP* or integral columns."""
    if df.schema[col].dataType.typeName().startswith("timestamp"):
        return F.unix_micros(F.col(col))
    return F.col(col).cast("long")


def _non_null_keys(keys: Sequence[str]) -> Column:
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    return cond


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join, union+window strategy (high-cardinality keys).

    Left rows gain ``value_cols`` from the latest right row (per ``keys``)
    with ``right_ts <= left_ts``; no match => null. All of ``left``'s
    columns are preserved.

    Contract: ``value_cols`` must not collide with left's columns, and
    neither side may use the internal working names (both checked). Right
    rows with a null timestamp OR null key are dropped before the union —
    Spark's ``Window.partitionBy`` groups NULL keys together, so without
    the key filter a null-key right row would be carried onto null-key left
    rows, diverging from equi-join/DuckDB-ASOF null semantics.
    """
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    _check_collisions(left, value_cols, "left")
    _check_collisions(right, value_cols, "right")
    right = right.filter(F.col(right_ts).isNotNull() & _non_null_keys(keys))
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


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    bucket_width_us: int = 86_400_000_000,  # 1 day
) -> DataFrame:
    """Backward as-of join, dense-broadcast strategy (dim-sized right side).

    Identical semantics to :func:`asof_join`; different physical plan. The
    right side is compiled into a dense per-(key, bucket) lookup covering
    every bucket from each key's first right row to the global last right
    row, where each dense row carries

    - ``_rows``: the bucket's own right rows as an array of structs sorted
      by timestamp, and
    - ``_carry``: the latest right row from any EARLIER bucket,

    and is broadcast. Each left row computes its (clamped) bucket, probes
    the lookup with one broadcast hash join, and resolves JVM-side:
    the last in-bucket row with ``rts <= ts``, else the carry. Left rows
    after the last right bucket clamp onto it — their ``ts`` exceeds every
    in-bucket ``rts``, so the probe still picks the key's overall latest
    row, which is the correct as-of match.

    Cost: ZERO shuffle and zero sort of the left side — the fact table
    streams through a broadcast join at scan speed. All shuffles touch only
    the dim-sized right (one partial-agg, one tiny window).

    Sizing rule (documented contract, not checked): the broadcast lookup
    holds |keys| x (time-span / bucket_width) rows + the right rows
    themselves — e.g. 1 000 rate series x 10 years of daily buckets
    ~ 3.7 M small rows. Pick ``bucket_width_us`` near the right side's
    update cadence so ``_rows`` arrays stay O(1); if keys x span outgrows
    the broadcast threshold, use :func:`asof_join` instead.
    """
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    _check_collisions(left, value_cols, "left")
    _check_collisions(right, value_cols, "right")

    r_us = _ts_micros(right, right_ts)
    row_struct = F.struct(
        r_us.alias("_rts"), *[F.col(c).alias(f"_v_{c}") for c in value_cols]
    )
    rb = (
        right.filter(F.col(right_ts).isNotNull() & _non_null_keys(keys))
        .select(*keys, F.floor(r_us / bucket_width_us).alias("_b"), row_struct.alias("_r"))
    )
    in_bucket = rb.groupBy(*keys, "_b").agg(
        F.sort_array(F.collect_list("_r")).alias("_rows")
    )
    # Per-key bucket extent. (The dim lineage is referenced twice — once for
    # the extent, once for the buckets; at scale `right` is a real dimension
    # table, so the rescan is noise. Never reference `left` twice.)
    summary = rb.groupBy(*keys).agg(
        F.min("_b").alias("_minb"), F.max("_b").alias("_maxb")
    )
    # Dense bucket axis per key: first right bucket .. last right bucket,
    # with each bucket's own rows and the carried latest-from-earlier row.
    dense = (
        summary.select(*keys, F.explode(F.sequence("_minb", "_maxb")).alias("_b"))
        .join(in_bucket, [*keys, "_b"], "left")
    )
    wcarry = W.partitionBy(*keys).orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    dense = dense.withColumn(
        "_carry",
        F.last(F.try_element_at("_rows", F.lit(-1)), ignorenulls=True).over(wcarry),
    )

    # Probe: clamp each left row's bucket into the key's extent (a left row
    # after the key's last right bucket still as-of-matches that bucket's
    # latest row, because its ts exceeds every in-bucket rts), then resolve
    # with one broadcast equi-join and a JVM array probe. Both joins build
    # on the dim side — the left side never shuffles.
    l_us = _ts_micros(left, left_ts)
    probe = (
        left.join(F.broadcast(summary), list(keys), "left")
        .withColumn(
            "_b",
            F.when(
                l_us.isNotNull() & F.col("_maxb").isNotNull(),
                F.least(F.floor(l_us / bucket_width_us), F.col("_maxb")),
            ),
        )
        .join(F.broadcast(dense), [*keys, "_b"], "left")
    )
    matched = F.filter("_rows", lambda x: x["_rts"] <= l_us)
    chosen = F.coalesce(F.try_element_at(matched, F.lit(-1)), F.col("_carry"))
    return probe.select(
        *lcols, *[chosen[f"_v_{c}"].alias(c) for c in value_cols]
    )


def asof_join_nearest_broadcast(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_us: int,
    delta_col: str | None = None,
    bucket_width_us: int = 86_400_000_000,
) -> DataFrame:
    """NEAREST-within-tolerance as-of join (pandas ``merge_asof``
    direction='nearest'): each left row gains ``value_cols`` from the right
    row (per ``keys``) whose timestamp is CLOSEST to the left timestamp and
    within ``tolerance_us`` microseconds, on either side; ties (equidistant
    backward/forward match) resolve to the EARLIER right row. No match
    within tolerance => nulls.

    Physical plan: two passes of :func:`asof_join_broadcast` — the backward
    pass as-is, the forward pass on NEGATED microsecond timestamps (the
    backward as-of of a time-reversed axis IS the forward as-of) — then a
    row-local nearest/tolerance resolve. The fact side streams through two
    broadcast hash joins with zero shuffle and zero sort; all shuffles
    touch only the dim-sized right side, twice. Same sizing contract as
    asof_join_broadcast.

    ``delta_col``: optionally emit |left_ts - matched right_ts| in
    microseconds (BIGINT, null when unmatched) under this name.
    """
    lcols = list(left.columns)
    internal = {"_mts", "_neg_ts", "_neg_rts"}
    clash = (
        internal
        | {f"_bk_{c}" for c in [*value_cols, "_mts"]}
        | {f"_fw_{c}" for c in [*value_cols, "_mts"]}
    ) & set(lcols)
    if clash:
        raise ValueError(f"left columns collide with internal names: {sorted(clash)}")

    r = right.withColumn("_mts", _ts_micros(right, right_ts))
    back = asof_join_broadcast(
        left, r, keys, left_ts, right_ts, [*value_cols, "_mts"],
        bucket_width_us=bucket_width_us,
    )
    for c in [*value_cols, "_mts"]:
        back = back.withColumnRenamed(c, f"_bk_{c}")

    lneg = back.withColumn("_neg_ts", -_ts_micros(back, left_ts))
    rneg = r.withColumn("_neg_rts", -F.col("_mts"))
    fwd = asof_join_broadcast(
        lneg, rneg, keys, "_neg_ts", "_neg_rts", [*value_cols, "_mts"],
        bucket_width_us=bucket_width_us,
    )
    for c in [*value_cols, "_mts"]:
        fwd = fwd.withColumnRenamed(c, f"_fw_{c}")

    lts = _ts_micros(fwd, left_ts)
    d_back = lts - F.col("_bk__mts")
    d_fwd = F.col("_fw__mts") - lts
    b_ok = F.col("_bk__mts").isNotNull() & (d_back <= tolerance_us)
    f_ok = F.col("_fw__mts").isNotNull() & (d_fwd <= tolerance_us)
    # tie (d_back == d_fwd) -> backward, i.e. the earlier right row
    use_back = b_ok & (~f_ok | (d_back <= d_fwd))
    use_fwd = f_ok & ~use_back
    out = [
        F.when(use_back, F.col(f"_bk_{c}"))
        .when(use_fwd, F.col(f"_fw_{c}"))
        .alias(c)
        for c in value_cols
    ]
    if delta_col is not None:
        out.append(
            F.when(use_back, d_back).when(use_fwd, d_fwd)
            .cast("long")
            .alias(delta_col)
        )
    return fwd.select(*lcols, *out)
