"""Session cache discipline (r18 VERDICT finding 5 / r19 item 9).

Several operators persist() decision-sized intermediates (band
signatures, adjacency frames, k-means assignment proxies) and several
iterative operators localCheckpoint() per round. Neither can unpersist
eagerly: the RETURNED plan still references the blocks, so releasing
them inside the operator would force a recompute (or, for
localCheckpoint, break the plan outright — checkpointed RDDs are not
recomputable). The contract is therefore **caller-owns-cache-lifetime**:
the session owner releases caches between independent queries. bench.py
and tools/full_sweep.py do this between entries; a long-lived production
session should call :func:`release_all` at the same boundary (after the
terminal action of each query whose result it has fully consumed), or
cache accumulates for the session lifetime.

``spark.catalog.clearCache()`` alone is NOT enough: it evicts SQL-cache
entries (InMemoryRelations from persist()) but leaves localCheckpoint
block RDDs pinned (they are plain persisted RDDs, invisible to the SQL
cache manager). :func:`release_all` drops both; :func:`lingering_rdds`
is the audit readout a sweep can assert on (pytest:
tests/test_caching.py pins "zero lingering cached RDDs after release").
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def lingering_rdds(spark: SparkSession) -> int:
    """Number of RDDs currently pinned with a storage level in this
    session — SQL-cache relations AND localCheckpoint block RDDs."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def release_all(spark: SparkSession) -> int:
    """Release every cached/persisted RDD the session holds: clear the
    SQL cache, then unpersist any remaining persistent RDDs
    (localCheckpoint blocks). Returns the number of RDDs that were still
    pinned after clearCache (the localCheckpoint population).

    Safe ONLY at a query boundary: any DataFrame whose plan references a
    released localCheckpoint cannot be executed again."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = jmap.size()
    for rdd in list(jmap.values()):
        rdd.unpersist(False)
    return n
