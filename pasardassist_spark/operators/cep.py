"""Complex event processing: contiguous sequence-pattern matching over
per-key event streams — the MATCH_RECOGNIZE/CEP shape (cf. HYPERSONIC,
SIGMOD'22; SQL:2016 row-pattern matching), which the reference's
fixed-shape timeline endpoints (reference src/modules/app/
app.service.ts:966-1007) cannot express.

Semantics: a pattern of k step-predicates matches at row p of a key's
event-time-ordered stream iff row p satisfies step 1, row p+1 satisfies
step 2, ..., row p+k-1 satisfies step k (STRICTLY CONTIGUOUS — SQL
MATCH_RECOGNIZE's default AFTER MATCH SKIP TO NEXT ROW with no
permutation; every overlapping match is emitted), optionally within a
time budget from first to last row.

Plan shape: each step predicate evaluates ROW-LOCALLY into a boolean
column, then the match condition is a conjunction of LEADs of those
booleans — k-1 LEADs over ONE per-key window exchange, no self-joins, no
events^k blowup (the naive CEP join is k-way). The cost is the one
user-keyed shuffle the sequence order genuinely requires — identical to
the funnel/path family's contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def match_pattern(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    steps: Sequence[Column],
    id_col: str,
    time_col: str | None = None,
    within: int | None = None,
) -> DataFrame:
    """Emit one row per contiguous match of ``steps`` (boolean Columns
    evaluated against a single event row) in each key's stream ordered by
    ``order_cols`` (supply a TOTAL order). Output: the keys, ``match_ids``
    (the k matched ``id_col`` values in order), and — when ``time_col``
    is given — ``start_<time_col>`` / ``end_<time_col>``; ``within``
    additionally bounds end - start (same units as ``time_col``).
    Overlapping matches are all emitted; dedup downstream if the
    AFTER MATCH SKIP PAST LAST ROW policy is wanted."""
    k = len(steps)
    if k == 0:
        raise ValueError("pattern needs at least one step")
    if within is not None and time_col is None:
        raise ValueError("within= requires time_col= (it bounds end - start)")
    w = W.partitionBy(*keys).orderBy(*order_cols)
    proj = [
        *keys,
        *[c for c in order_cols if c not in keys],
        F.col(id_col).alias("_id"),
    ]
    if time_col is not None:
        proj.append(F.col(time_col).alias("_t"))
    proj += [s.cast("boolean").alias(f"_s{i}") for i, s in enumerate(steps)]
    base = df.select(*proj)
    cond = F.col("_s0")
    ids = [F.col("_id")]
    for i in range(1, k):
        cond = cond & F.coalesce(
            F.lead(f"_s{i}", i).over(w), F.lit(False)
        )
        ids.append(F.lead("_id", i).over(w))
    out_cols = [*keys, F.array(*ids).alias("match_ids")]
    if time_col is not None:
        end_t = F.lead("_t", k - 1).over(w) if k > 1 else F.col("_t")
        if within is not None:
            cond = cond & (end_t - F.col("_t") <= within)
        out_cols += [
            F.col("_t").alias(f"start_{time_col}"),
            end_t.alias(f"end_{time_col}"),
        ]
    # every window-derived output (the LEAD id array, end time) MUST be
    # materialized in the same projection as the match flag: after the
    # filter the frame only contains anchors, and a LEAD there would read
    # the NEXT MATCH, not the next event
    return (
        base.select(*out_cols, cond.alias("_m"))
        .where(F.col("_m"))
        .drop("_m")
    )
