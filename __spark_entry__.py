"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship collection-stats query (SURVEY.md §3.3) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator registry
from pasardassist_spark.queries (one entry per SURVEY.md §2 operator, DuckDB
oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pasardassist_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pasardassist_spark.queries.aggregates import a11_collection_stats

    return a11_collection_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
