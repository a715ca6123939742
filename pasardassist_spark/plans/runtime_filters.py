"""Runtime bloom-filter semi-join reduction (Catalyst's
InjectRuntimeFilter rule, Spark 3.3+).

When a fact⋈fact shuffle join has a selective predicate on one side,
Spark can build a bloom filter over that side's join keys and push a
``might_contain`` probe into the OTHER side's scan — rows that cannot
match are dropped before the shuffle, which is exactly the semi-join
reduction a 100 TB join needs (the shuffle is the cost; the bloom probe
is map-local).

Spark's defaults gate the rule on estimated sizes
(``applicationSideScanSizeThreshold`` = 10 GB — correct for a real lake,
permanently off at our test scale), so the effect is invisible in
local-mode plans unless tuned. ``runtime_filter_session`` scopes the
thresholds the way a cluster job config would; the plan-shape guarantee
(filter injected, probe on the big side) is asserted in
tests/test_plans.py rather than left to configuration luck.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_TUNED = {
    # always consider the probe side regardless of its estimated scan size
    # (local-mode estimates are KB-scale; a real lake clears the 10 GB bar)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # allow building the filter from creation sides up to 100 MB post-filter
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextmanager
def _scoped_confs(spark: SparkSession, keys: dict[str, str]):
    """Set SQL confs for the scope, restoring the EXPLICIT prior state on
    exit: a conf the session had never set is unset again (``conf.get(k)``
    without a default would return the built-in default and exit would then
    pin it — session-global drift). Not reentrant per (session, key):
    nested scopes touching the same key restore whatever the outer scope
    set, which is correct, but concurrent threads on one session race."""
    saved: dict[str, str | None] = {}
    for k, v in keys.items():
        saved[k] = spark.conf.get(k, None)  # None == was never set
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@contextmanager
def runtime_filter_session(spark: SparkSession, force_shuffle_join: bool = True):
    """Scope runtime-bloom-filter tuning (and optionally disable broadcast
    so the join actually shuffles — the regime where the filter matters).
    Restores previous conf values on exit (see _scoped_confs)."""
    keys = dict(_TUNED)
    if force_shuffle_join:
        keys["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        keys["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    with _scoped_confs(spark, keys):
        yield spark


_SKEW_TUNED = {
    # Local-mode partition sizes are KB-scale, so the default skew gates
    # (256 MB threshold, 5x median factor) never fire; scope them down the
    # way a cluster job config keyed to its shuffle sizes would.
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@contextmanager
def skew_join_session(spark: SparkSession):
    """Scope AQE skew-join tuning: a hot join key's oversized shuffle
    partition is split into multiple tasks at runtime (OptimizeSkewedJoin
    — the planner-side complement to the manual salting in
    operators/skew.py, which remains the tool for skewed AGGREGATIONS
    where AQE cannot split a group). Restores prior confs on exit
    (see _scoped_confs)."""
    with _scoped_confs(spark, _SKEW_TUNED):
        yield spark
