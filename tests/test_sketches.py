"""Error-bound and mergeability guarantees for the sketch family
(operators/sketches.py, queries/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    cm_estimate,
    cm_merge,
    cm_partition_sketches,
)
from pasardassist_spark.queries.registry import REGISTRY, _load_all
from pasardassist_spark.tables import load

_load_all()


def test_cm_estimates_bound_true_counts(spark, sf_dir):
    """est >= true is the Count-Min hard guarantee; the overshoot is at
    most the colliding mass, bounded loosely here by 4*N/width per
    depth-row minimum (generous vs the eps*N expectation, tight enough
    to catch a broken hash or merge)."""
    ev = load(spark, sf_dir, "events")
    true = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true.values())
    grid = cm_merge(cm_partition_sketches(ev, "event_type"))
    assert sum(grid) == n_total * CM_DEPTH, "every row ingested depth times"
    for k, t in true.items():
        est = cm_estimate(grid, k)
        assert est >= t, f"{k}: CM must never undercount"
        assert est - t <= 4 * n_total / CM_WIDTH + 1, f"{k}: overshoot {est - t}"


def test_cm_sketch_is_mergeable(spark, sf_dir):
    """Grid(full) == Grid(half1) + Grid(half2), elementwise — the
    property that lets per-day sketches roll up without rescanning."""
    ev = load(spark, sf_dir, "events")
    full = cm_merge(cm_partition_sketches(ev, "event_type"))
    h1 = cm_merge(
        cm_partition_sketches(ev.filter(F.col("event_id") % 2 == 0), "event_type")
    )
    h2 = cm_merge(
        cm_partition_sketches(ev.filter(F.col("event_id") % 2 == 1), "event_type")
    )
    assert [a + b for a, b in zip(h1, h2)] == full


def test_qsketch_sample_is_mergeable_and_rank_accurate(spark, sf_dir):
    """(a) The gated sample of the union equals the union of gated
    samples (hash-coordination = mergeability). (b) The sample
    percentile's rank in the TRUE distribution is within a
    1/sqrt(n_sample) band of the target quantile."""
    from pasardassist_spark.queries.sketches import QS_GATE_BP

    ev = load(spark, sf_dir, "events")
    gate = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10
    ).cast("long") < QS_GATE_BP * 65536 // 10000
    full_ids = {r.event_id for r in ev.filter(gate).select("event_id").collect()}
    union_ids = set()
    for par in (0, 1):
        part = ev.filter(F.col("event_id") % 2 == par).filter(gate)
        union_ids |= {r.event_id for r in part.select("event_id").collect()}
    assert union_ids == full_ids

    est = {
        r.event_type: r
        for r in REGISTRY["qsketch_percentiles"].fn(spark, sf_dir).collect()
    }
    ev_cached = ev.select("event_type", "value").cache()
    try:
        for et, row in est.items():
            n = ev_cached.filter(F.col("event_type") == et).count()
            for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
                v = getattr(row, q)
                below = (
                    ev_cached.filter(F.col("event_type") == et)
                    .filter(F.col("value") <= v)
                    .count()
                )
                tol = 3.0 / (row.n_sample**0.5) + 1.0 / n
                assert abs(below / n - target) <= tol, (
                    f"{et}.{q}: rank {below / n:.4f} vs {target} (tol {tol:.4f})"
                )
    finally:
        ev_cached.unpersist()


def test_bloom_no_false_negatives_and_sane_fpr(spark, sf_dir):
    """Bloom's structural guarantee: every present word hits; the
    synthetic absent probes bound the false-positive rate (4096 bits /
    3 hashes at this vocab load runs far below 50%)."""
    from pasardassist_spark.queries.registry import REGISTRY

    rows = REGISTRY["sketch_bloom_filter"].fn(spark, sf_dir).collect()
    present = [r for r in rows if r.present]
    absent = [r for r in rows if not r.present]
    assert present and absent
    assert all(r.bloom_hit for r in present)
    fpr = sum(r.bloom_hit for r in absent) / len(absent)
    assert fpr < 0.5
