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
- ``operators``  — reusable composite operators (latest_per_key, pagination,
                   multi-count, dedup family, similarity search, text stats).
- ``functions``  — deterministic column-expression helpers (decimal money
                   math, uint256 hex, event classification).
- ``queries``    — the registry binding every SURVEY.md §2 operator to a
                   runnable query + DuckDB oracle (driver contract).
- ``streaming``  — Structured Streaming ingestion: bronze event log ->
                   silver latest-state entities (reference "tasks" half).
"""

from pasardassist_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
