"""Count-Min sketch: mergeable sublinear frequency estimation.

Complements the existing sketch family (Misra-Gries candidates in
queries/analytics.py, HLL distinct rollups): Misra-Gries answers "which
keys are heavy", Count-Min answers "how often does THIS key occur" for
any key, with a one-sided error bound — est >= true always, and
est <= true + eps*N with probability 1 - delta (eps = e/width,
delta = e^-depth; Cormode & Muthukrishnan 2005).

Distribution shape (the reason a sketch earns its place at 100 TB):
phase 1 folds each partition into a depth x width counter grid via
mapInPandas — O(partition) work, O(1) state; phase 2 merges grids by
ELEMENTWISE SUM, which is exactly one posexplode + groupBy(pos) over
(#partitions x depth x width) rows — KBs, not data. The merged grid is
~32 KB and broadcasts anywhere; estimates are a driver-side min over
depth positions. No full-data shuffle ever happens: the only exchange
carries sketch cells.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_positions(key: str) -> list[int]:
    """Row j's counter index for ``key`` — md5("{j}:{key}") mod width.
    Shared by build (executors) and query (driver), so the two sides can
    never disagree on the hash family."""
    return [
        int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:8], 16)
        % CM_WIDTH
        for j in range(CM_DEPTH)
    ]


def cm_partition_sketches(df: DataFrame, key_col: str) -> DataFrame:
    """Phase 1: one flattened depth*width counter grid per input
    partition. value_counts() batches the per-key increment so the
    python loop runs over DISTINCT keys in the partition, not rows."""
    import numpy as np
    import pandas as pd

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(CM_DEPTH * CM_WIDTH, dtype=np.int64)
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                for j, pos in enumerate(cm_positions(str(key))):
                    counts[j * CM_WIDTH + pos] += int(c)
        yield pd.DataFrame({"counts": [counts.tolist()]})

    return df.select(key_col).mapInPandas(fold, "counts array<long>")


def cm_merge(sketches: DataFrame) -> list[int]:
    """Phase 2: elementwise-sum the per-partition grids. The exchange
    carries (partitions x cells) sketch rows — KBs — and the merged grid
    collects to the driver (the same small-summary pattern as the
    Misra-Gries merge)."""
    merged = (
        sketches.select(
            F.posexplode("counts").alias("pos", "c")
        )
        .groupBy("pos")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    grid = [0] * (CM_DEPTH * CM_WIDTH)
    for r in merged:
        grid[r.pos] = r.c
    return grid


def cm_estimate(grid: list[int], key: str) -> int:
    """Point estimate: min over the depth rows' counters."""
    return min(grid[j * CM_WIDTH + pos] for j, pos in enumerate(cm_positions(key)))
