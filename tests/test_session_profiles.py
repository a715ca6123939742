"""Deployment-profile config as code (r17 VERDICT #3).

``session.build_conf`` is a pure dict so the sizing rules — cluster
shuffle parallelism 3x total cores, AQE skew gates, scan split size,
stats-derived broadcast threshold — are testable without a JVM; the
final test then proves the cluster profile's REAL skew thresholds
(256 MiB partition gate, 3x median factor, 128 MiB advisory) engage
AQE's OptimizeSkewedJoin on a hot-key fixture, not just parse.
"""

from __future__ import annotations

import pytest

from pasardassist_spark.session import broadcast_threshold, build_conf

MB = 1024 * 1024


def test_local_profile_sizing(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    conf = build_conf("local")
    assert conf["spark.sql.shuffle.partitions"] == "8"
    # shared invariants (oracle comparability + Arrow slow path)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.session.timeZone"] == "UTC"
    assert conf["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert conf["spark.sql.legacy.parquet.nanosAsLong"] == "true"


def test_cluster_profile_sizing_explicit_cores():
    conf = build_conf("cluster", total_cores=4000)
    # 3x total executor cores; AQE coalesces the excess post-shuffle
    assert conf["spark.sql.shuffle.partitions"] == str(3 * 4000)
    assert conf["spark.sql.adaptive.coalescePartitions.enabled"] == "true"
    # skew gate must sit at/above the advisory size or splits re-coalesce
    thresh = int(
        conf["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"]
    )
    advisory = int(conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"])
    assert thresh >= advisory
    assert thresh == 256 * MB
    assert conf["spark.sql.adaptive.skewJoin.skewedPartitionFactor"] == "3"
    # 256 MiB scan splits: ~400k tasks for a 100 TB scan
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == 256 * MB
    # shuffle data must survive executor decommission at this scale
    assert conf["spark.decommission.enabled"] == "true"


def test_cluster_profile_sizing_from_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TOTAL_CORES", "512")
    conf = build_conf("cluster")
    assert conf["spark.sql.shuffle.partitions"] == str(3 * 512)


def test_unknown_profile_raises():
    with pytest.raises(ValueError, match="unknown profile"):
        build_conf("yarn-client")


def test_broadcast_threshold_from_dim_stats():
    # None -> conservative floor
    assert broadcast_threshold(None) == 64 * MB
    # 2x headroom over the measured largest dimension
    assert broadcast_threshold(100 * MB) == 200 * MB
    # small dims never drop below the floor ...
    assert broadcast_threshold(1 * MB) == 64 * MB
    # ... and a mis-measured "dimension" can never OOM the driver
    assert broadcast_threshold(100 * 1024 * MB) == 512 * MB
    conf = build_conf("cluster", total_cores=400, largest_dim_bytes=100 * MB)
    assert conf["spark.sql.autoBroadcastJoinThreshold"] == str(200 * MB)


def test_cluster_skew_gates_engage_at_real_thresholds(spark):
    """Drive a hot-key join whose hot partition exceeds the cluster
    profile's REAL 256 MiB skew gate (incompressible sha2 pad defeats
    shuffle lz4, ~1.4M x 512 B hot rows) and assert AQE splits it
    (``skew=true`` in the final adaptive plan). Only the skew-relevant
    keys are scoped in — shuffle.partitions is parallelism sizing, not
    skew behavior, and 12k tasks would swamp local[8]."""
    from pyspark.sql import functions as F

    from pasardassist_spark.plans.runtime_filters import _scoped_confs

    conf = build_conf("cluster", total_cores=4000)
    scoped = {
        k: v
        for k, v in conf.items()
        if "skewJoin" in k
        or "advisoryPartitionSize" in k
        or k == "spark.sql.adaptive.enabled"
    }
    # force the shuffle join + keep the skewed partition visible
    scoped["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    scoped["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    scoped["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    with _scoped_confs(spark, scoped):
        pad = F.concat(
            *[
                F.sha2(
                    F.concat(F.col("id").cast("string"), F.lit(str(i))), 256
                )
                for i in range(8)
            ]
        )
        hot = F.when(F.col("id") % 20 > 0, F.lit(7)).otherwise(F.col("id"))
        big = spark.range(1_500_000).select(hot.alias("k"), pad.alias("pad"))
        dim = spark.range(200).select(
            F.col("id").alias("k"), F.lit("d").alias("w")
        )
        j = big.join(dim, "k").select(F.sum(F.length("pad")).alias("s"))
        j.collect()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p, (
            "cluster-profile skew gates did not split the hot partition"
        )
