"""Physical-plan inspection — the scale contract made testable (SURVEY.md §4).

Correctness tests pin WHAT a query returns; these helpers pin HOW it runs:
filters reaching the parquet scan (``PushedFilters``), projections pruning
the read schema (``ReadSchema``), dimension joins broadcasting, expressions
staying inside whole-stage codegen (``*(n)`` spans), shuffle counts. At
100 TB a regression in any of these is a 100x cost regression even though
every value test still passes — so plan shape is asserted in CI
(tests/test_plans.py) exactly like row values.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan(df: DataFrame, mode: str = "formatted") -> str:
    """The optimized physical plan as text (pre-execution; AQE may still
    re-plan at runtime — use :func:`executed_plan` for post-AQE shape)."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def executed_plan(df: DataFrame) -> str:
    """The executed (post-AQE) plan; requires the query to have run."""
    return df._jdf.queryExecution().executedPlan().toString()


def read_schemas(p: str) -> list[set[str]]:
    """Column sets actually read by each parquet scan in a formatted plan."""
    return [
        set(re.findall(r"(\w+):", m))
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", p)
    ]


def shuffle_count(p: str) -> int:
    """Number of Exchange operators in a formatted plan (each is a shuffle;
    broadcast exchanges are counted separately by Spark as BroadcastExchange
    and excluded here)."""
    return len(re.findall(r"\(\d+\) Exchange\b", p))


def data_shuffle_count(p: str) -> int:
    """Exchanges that move DATA rows: hash/range repartitions. Excludes
    ``Exchange SinglePartition`` nodes, which in an aggregate pipeline
    carry one partial-agg row per upstream task (a global count's merge
    step — O(partitions) longs, metadata traffic, not a data shuffle).
    Plan tests that claim "shuffle-free" for a query ending in a global
    total use this; anything hash- or range-partitioned still counts."""
    single = len(re.findall(r"\(\d+\) Exchange\nInput[^\n]*\nArguments: SinglePartition", p))
    return shuffle_count(p) - single
