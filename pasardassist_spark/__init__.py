"""pasardassist_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PasarProtocol/PasarDAssist (reference at
/root/reference, read-only).

The reference is a NestJS + MongoDB backend: streaming ingestion of blockchain
contract events into append logs + upserted entity tables, and a 47-endpoint
query API of filters / lookups / latest-per-key dedup / group aggregations /
pagination (see SURVEY.md). This package re-expresses that surface Spark-first:

- ``session``    — SparkSession factory tuned for local[32] tests and for
                   cluster-scale defaults (AQE, skew join, UTC, Arrow).
- ``tables``     — loaders for the driver test tables (TESTDATA.md).
- ``operators``  — reusable composite operators (latest/top-k per key,
                   pagination, dedup family, similarity/ANN, as-of and range
                   joins, skew salting, state-machine folds, multimodal and
                   text stages).
- ``functions``  — deterministic column-expression helpers (decimal money
                   math, uint256 hex, event classification).
- ``sources``    — enrichment stage (batched RPC, retry rounds), rates feed,
                   lake layouts (bucketed tables, date partitioning).
- ``queries``    — the registry binding every SURVEY.md §2 operator to a
                   runnable query + DuckDB oracle (driver contract).
- ``streaming``  — Structured Streaming: bronze event log -> bucketed silver
                   state (incremental MERGE, compaction), entity folds,
                   dynamic source registration, sessionization,
                   stream-stream attribution.
- ``plans``      — physical-plan inspection backing the plan-shape tests.
- ``api``        — the reference's endpoint families as DataFrame builders.
"""

from pasardassist_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
