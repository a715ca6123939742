"""Query registry — binds every implemented operator to the driver contract.

Each entry is a named PySpark query ``fn(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
hash-compares both at sf0.01 (row count + schema + order-insensitive value
hash), so:

- every computed column is aliased identically on both sides;
- money aggregates use the decimal-exact pattern (functions/money.py);
- every sort feeding a LIMIT has an explicit total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => not SQL-expressible; driver does rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from pasardassist_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        enrichment,
        multimodal,
        quality,
        relational,
        sampling,
        similarity,
        text,
        timeseries,
    )

    _LOADED = True
