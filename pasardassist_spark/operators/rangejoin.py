"""Range (interval) join — point-in-interval matching without a quadratic
plan (SURVEY.md §2.10).

Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` join as
BroadcastNestedLoop/cartesian — quadratic. The scalable form is band
bucketing: quantize time into fixed-width buckets, explode each interval
into the buckets it covers, equi-join points to intervals on
(keys, bucket), then verify exact containment. Cost:
O(points + intervals × spans) shuffle on an equi-key — the standard
interval-join shape every streams/Flink/Trino engine uses internally.

Bucket width is the tuning knob: ~the typical interval length, so most
intervals explode into O(1) buckets while each point probes exactly one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join: each point row gains every interval row (same ``keys``)
    with ``start <= ts <= end``. Timestamps are integral (e.g. micros).
    Non-key column names must not overlap between the two sides (checked)."""
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(f"non-key columns exist on both sides: {sorted(clash)}")
    internal = {"_b"} & (set(points.columns) | set(intervals.columns))
    if internal:
        raise ValueError(
            f"columns collide with range-join internal names: {sorted(internal)}"
        )
    p = points.withColumn("_b", (F.col(ts_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, [*keys, "_b"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_b")
    )


def band_self_join(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
    eps: float,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Band (theta) self-join: all row pairs sharing ``keys`` whose
    ``value_col`` differ by at most ``eps`` — the |a.v - b.v| <= eps
    predicate no equi-join can express directly. Bucket decomposition
    makes it an equi-join: each row lands in bucket floor(v / eps); a
    qualifying pair's buckets differ by at most 1, so probing each row's
    bucket and its two neighbors on ONE side covers every pair exactly
    once (the probe buckets are distinct, so no pair is emitted twice
    and no post-join dedup is needed).

    Scale: the shuffle key is (keys, bucket) — comparisons never cross a
    key group or leave a 3-bucket band, so the fan-out is bounded by
    band density, not group size. eps sets the granularity; a pile-up of
    identical values in one bucket is ordinary key skew (AQE skew-join /
    salting territory, like any hot equi-join key).

    Returns both rows' id and value columns with ``id_a < id_b``; each
    ``carry`` column rides along as ``<col>_a`` / ``<col>_b`` so callers
    can apply a secondary (non-band) predicate to the candidate pairs
    without re-joining payloads by id afterwards.
    """
    if not eps > 0:
        raise ValueError(
            f"eps must be > 0 (got {eps}): bucket width 0 divides by zero; "
            "for exact equality use a plain equi-join on value_col"
        )
    b = F.floor(F.col(value_col) / F.lit(eps)).cast("long")
    left = df.select(
        *keys,
        F.col(id_col).alias("id_a"),
        F.col(value_col).alias("value_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        b.alias("_b"),
    )
    right = df.select(
        *keys,
        F.col(id_col).alias("id_b"),
        F.col(value_col).alias("value_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
        F.explode(F.array(b - 1, b, b + 1)).alias("_b"),
    )
    return (
        left.join(right, [*keys, "_b"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("value_a") - F.col("value_b")) <= eps)
        )
        .drop("_b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_width: int,
) -> DataFrame:
    """Interval x interval overlap join (half-open [start, end) x
    [start, end), same ``keys``): every pair whose intervals intersect,
    without a per-key cross join.

    Bucket decomposition: each interval explodes onto the fixed-width
    buckets it covers, candidates equi-join on (keys, bucket), and —
    the standard dedup trick — a pair is EMITTED only in the single
    bucket containing max(left_start, right_start), so each overlapping
    pair appears exactly once with no post-join DISTINCT.

    Scale: shuffle key is (keys, bucket); per-bucket fan-out is the
    number of intervals alive in that bucket, so ``bucket_width`` trades
    explode factor (long intervals cover many buckets) against bucket
    density — size it near the typical interval length. Skewed hot
    buckets are ordinary equi-join skew (AQE/salting).

    Bounds columns must be numeric (e.g. epoch micros). Non-key column
    names must not overlap between the sides.
    """
    ls, le = left_bounds
    rs, re = right_bounds
    overlap_cols = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"non-key columns collide across sides: {sorted(overlap_cols)}"
        )
    w = int(bucket_width)
    if w < 1:
        raise ValueError(f"bucket_width must be >= 1 (got {bucket_width})")

    def buckets(s: str, e: str):
        # [start, end) covers floor(s/w) .. floor((e-1)/w); empty/invalid
        # intervals (e <= s) cover nothing and drop out of the join.
        lo = F.floor(F.col(s) / w).cast("long")
        hi = F.floor((F.col(e) - 1) / w).cast("long")
        return F.when(
            F.col(e) > F.col(s), F.sequence(lo, hi)
        ).otherwise(F.array().cast("array<long>"))

    lx = left.withColumn("_b", F.explode(buckets(ls, le)))
    rx = right.withColumn("_b", F.explode(buckets(rs, re)))
    emit_bucket = F.floor(F.greatest(F.col(ls), F.col(rs)) / w).cast("long")
    return (
        lx.join(rx, [*keys, "_b"])
        .filter(
            (F.col(ls) < F.col(re))
            & (F.col(rs) < F.col(le))
            & (F.col("_b") == emit_bucket)
        )
        .drop("_b")
    )
