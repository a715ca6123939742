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
