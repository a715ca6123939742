"""Sort + offset/limit pagination and the count+page pattern.

The reference runs every paged endpoint twice: once with ``$count`` and once
with ``$sort/$skip/$limit`` (reference src/modules/app/app.service.ts:738-754;
SURVEY.md §2.6 O2/O4). Here both come from ONE pass: the page via
``orderBy + offset + limit``, the total via ``count(*) OVER ()`` attached to
each page row — no second scan.

Scale notes: a global ``orderBy`` is a range-partitioned shuffle; with a
``limit`` Spark plans TakeOrderedAndProject (per-partition top-(offset+limit)
heaps, then a single merge) — no full sort materializes, so deep scans stay
cheap and only pathological offsets (offset ~ table size) degrade, same as
every SQL engine. The caller must pass a deterministic (total) sort order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


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
    """Page rows with the filtered-set total attached to each row (one pass)."""
    with_total = df.withColumn(total_col, F.count(F.lit(1)).over(W.partitionBy()))
    return paginate(with_total, order, page_num, page_size)
