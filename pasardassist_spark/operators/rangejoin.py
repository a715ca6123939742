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

    Returns both rows' id and value columns with ``id_a < id_b``.
    """
    b = F.floor(F.col(value_col) / F.lit(eps)).cast("long")
    left = df.select(
        *keys,
        F.col(id_col).alias("id_a"),
        F.col(value_col).alias("value_a"),
        b.alias("_b"),
    )
    right = df.select(
        *keys,
        F.col(id_col).alias("id_b"),
        F.col(value_col).alias("value_b"),
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
