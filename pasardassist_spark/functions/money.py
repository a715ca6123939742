"""Deterministic money math.

The reference stores wei amounts as lossy JS doubles (>= 2^53 hazard —
reference src/modules/app/app.service.ts:642-645, src/constants.ts:5). This
engine fixes that by doing all money arithmetic in DecimalType: sums over
decimals are exact and associative, so results are reproducible across
engines, partitionings, and task orderings — a hard requirement both for the
DuckDB oracle hash-compare and for rerunning jobs at 100 TB where partial
aggregation order is nondeterministic.

Pattern: cast inputs to a fixed decimal type, multiply with explicit result
casts (so Spark never hits the >38-precision scale-reduction path, which
rounds), sum exactly, cast to double only at the output edge.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec2(col: Column | str) -> Column:
    """Cast a 2-decimal money/measure column to DECIMAL(18,2) (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dec4(col: Column) -> Column:
    """Explicit DECIMAL(18,4) cast for products of two dec2 factors."""
    return col.cast("decimal(18,4)")


def small2(col: Column | str) -> Column:
    """DECIMAL(4,2) cast for small factors like (1 - discount)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def dsum(col: Column) -> Column:
    """Exact decimal sum surfaced as DOUBLE (the comparison edge type)."""
    return F.sum(col).cast("double")


def dsum_when(cond: Column, col: Column) -> Column:
    """sum(CASE WHEN cond THEN col ELSE 0 END) with decimal-exact semantics."""
    zero = F.lit(0).cast("decimal(18,4)")
    return F.sum(F.when(cond, col.cast("decimal(18,4)")).otherwise(zero)).cast("double")
