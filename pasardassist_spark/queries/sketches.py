"""Sketch-backed distribution queries: Count-Min frequencies and the
hash-coordinated sample quantile sketch.

Both are mergeable summaries — the property that matters at 100 TB,
where "recompute over all history" is off the table and rollups must
combine partial summaries associatively (same design rationale as the
HLL rollup, queries/analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pasardassist_spark.operators.sketches import (
    cm_estimate,
    cm_merge,
    cm_partition_sketches,
)
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


@query("cm_sketch_freq")  # sketch estimates: rows-only driver check by design
def cm_sketch_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates per event type: per-partition grids
    fold via mapInPandas, merge by elementwise sum (the only exchange
    carries sketch cells, KBs), point-query the merged 32 KB grid on the
    driver. est >= true is a hard guarantee; the overshoot bound
    (est - true <= ~N*depth/width at this grid size) is pytest-asserted
    against exact counts in tests/test_sketches.py. Output is
    sketch-specific, so the driver records a rows-only check — the
    pytest bound is the correctness gate."""
    ev = load(spark, sf_dir, "events")
    grid = cm_merge(cm_partition_sketches(ev, "event_type"))
    keys = [r.event_type for r in ev.select("event_type").distinct().collect()]
    rows = [(k, cm_estimate(grid, k)) for k in sorted(keys)]
    return spark.createDataFrame(rows, "event_type string, est_count long")


# ~6% deterministic row sample: same 16-bit md5 gate as samp_deterministic
QS_GATE_BP = 600


@query(
    "qsketch_percentiles",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_sample,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events
    WHERE (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 4, 1)) - 1)
        < {QS_GATE_BP * 65536 // 10000}
    GROUP BY event_type
    """,
)
def qsketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch via a hash-coordinated sample: keep a row iff the
    first 16 bits of md5(event_id) pass a fixed gate, then take EXACT
    percentiles of the kept rows. Because the gate is a pure function of
    the row identity, the sample is (a) deterministic — same rows kept on
    any engine, partitioning, or rerun, which is why this sketch is
    fully ORACLE-CHECKABLE unlike t-digest/KLL whose internals are
    engine-specific — and (b) MERGEABLE: the union of gated samples of
    any two corpus slices IS the gated sample of their union (pytest
    pins this). Rank error is O(1/sqrt(gate_rate * N)), asserted against
    the exact a13 percentiles in tests/test_sketches.py. At 100 TB the
    gate runs scan-local and the sort cost drops by the gate factor."""
    ev = load(spark, sf_dir, "events")
    gate = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        ev.filter(gate < QS_GATE_BP * 65536 // 10000)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.9)).alias("p90"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
    )
