"""Sort + offset/limit pagination and the count+page pattern.

The reference runs every paged endpoint twice: once with ``$count`` and once
with ``$sort/$skip/$limit`` (reference src/modules/app/app.service.ts:738-754;
SURVEY.md §2.6 O2/O4). Here the total is a distributed global aggregate
(map-side partial counts, one row out) broadcast-cross-joined onto the page —
never a ``count(*) OVER ()`` empty window, which would drag the whole
filtered set onto a single partition. The count branch is column-pruned to
nothing by Catalyst (count(1) reads no data columns), so the second scan is
metadata-cheap next to the page's sort.

Scale notes: a global ``orderBy`` is a range-partitioned shuffle; with a
``limit`` Spark plans TakeOrderedAndProject (per-partition top-(offset+limit)
heaps, then a single merge) — no full sort materializes, so deep scans stay
cheap and only pathological offsets (offset ~ table size) degrade, same as
every SQL engine. The caller must pass a deterministic (total) sort order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def paginate(df: DataFrame, order: Sequence[Column], page_num: int, page_size: int) -> DataFrame:
    """Page ``page_num`` (1-based) of ``df`` under ``order``."""
    if page_num < 1 or page_size < 1:
        raise ValueError("pageNum and pageSize must be >= 1")
    return df.orderBy(*order).offset((page_num - 1) * page_size).limit(page_size)


def count_and_page(
    df: DataFrame,
    order: Sequence[Column],
    page_num: int,
    page_size: int,
    total_col: str = "total",
) -> DataFrame:
    """Page rows with the filtered-set total attached to each row.

    The total comes from a partial-aggregated global count (one row),
    broadcast onto the page rows — no single-partition window anywhere.
    """
    total = df.groupBy().agg(F.count(F.lit(1)).alias(total_col))
    with_total = df.crossJoin(F.broadcast(total))
    return paginate(with_total, order, page_num, page_size)
