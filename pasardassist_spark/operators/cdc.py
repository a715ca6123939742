"""Generic snapshot diff — the CDC core behind cdc_snapshot_diff
(queries/analytics.py) factored as a reusable operator, and its
composition with the generational store's time travel: "what changed
between generation N and M" as a queryable audit.

Scale contract (same as the query form): ONE full-outer equi-join on the
key — Exchange-free when both snapshots share a bucketed layout — and the
unchanged-row filter (null-safe equality over the compare columns) drops
the bulk before anything materializes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows added / removed / changed from ``old`` to ``new`` (unchanged
    rows dropped — the delta IS the product). ``compare_cols`` defaults
    to every non-key column the snapshots share; comparison is null-safe
    (NULL -> value counts as a change, NULL -> NULL does not). Output:
    the keys, ``change_type``, and ``old_<c>`` / ``new_<c>`` for each
    compared column."""
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    a = old.select(*keys, *compare_cols).alias("a")
    b = new.select(*keys, *compare_cols).alias("b")
    cond = None
    for k in keys:
        e = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = e if cond is None else cond & e
    j = a.join(b, cond, "full_outer")
    a_key, b_key = F.col(f"a.{keys[0]}"), F.col(f"b.{keys[0]}")
    same = None
    for c in compare_cols:
        e = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        same = e if same is None else same & e
    changed = a_key.isNull() | b_key.isNull() | ~same if same is not None else (
        a_key.isNull() | b_key.isNull()
    )
    return j.where(changed).select(
        *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
        F.when(a_key.isNull(), "added")
        .when(b_key.isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        *[F.col(f"a.{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"b.{c}").alias(f"new_{c}") for c in compare_cols],
    )


def state_diff(
    spark: SparkSession,
    state_dir: str,
    keys: Sequence[str],
    v_old: int | str,
    v_new: int | str | None = None,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Audit two retained generations of a generational state store:
    time-travel reads (streaming/ingest.py:read_state) + snapshot_diff.
    ``v_new`` defaults to the latest committed generation. Raises (via
    read_state) when a version is outside the retained window."""
    from pasardassist_spark.streaming.ingest import read_state

    old = read_state(spark, state_dir, version=v_old)
    new = read_state(spark, state_dir, version=v_new)
    if old is None or new is None:
        raise ValueError(f"no committed state under {state_dir}")
    return snapshot_diff(old, new, keys, compare_cols)
