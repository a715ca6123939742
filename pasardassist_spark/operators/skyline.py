"""Skyline (Pareto-frontier) queries: rows not dominated in any dimension.

Row q dominates row p when q is no worse in every criterion and strictly
better in at least one. The skyline is the set of undominated rows — the
classic multi-criteria shortlist (Börzsönyi et al., ICDE 2001) the
reference's "cheapest/best" listing endpoints approximate one dimension
at a time (reference src/modules/app/app.service.ts:640-668 price sorts).

Algorithm (2-criteria exact, no quadratic self-join):

1. Collapse to one row per distinct x value: ``max(y)`` per x — within an
   x-group only the max-y row can be undominated (one hash shuffle).
2. Running ``max(y)`` over x ascending gives, for each x, the best y among
   all strictly-cheaper-or-equal rows; a row is dominated iff a strictly
   smaller x reached y >= its y, or its own x-group holds y > its y.
3. Join the per-x verdict back to carry full rows (ties on (x, y) are
   co-skyline, matching SQL NOT EXISTS dominance).

Scale: with a partition key (the common "frontier per brand/segment"
form) every window is keyed and the whole thing is two keyed shuffles.
For a GLOBAL frontier the distinct-x window is a single ordered task —
so `skyline` first reduces the input to LOCAL frontiers over
content-hash salt buckets (one keyed window shuffle, fully parallel; a
bucket-local frontier is provably a superset of the global frontier
since dominance within a bucket is dominance globally), and only the
surviving candidate rows — O(frontier x n_buckets), not O(n) — reach
the exact global pass. The salt is a DETERMINISTIC xxhash64 of the row
(never ``spark_partition_id()``: a nondeterministic key re-evaluates
independently on each branch of the verdict self-join and silently
drops rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _frontier_flags(df: DataFrame, keys: list[str], x: str, y: str) -> DataFrame:
    """Rows of ``df`` that are on the (min x, max y) frontier within each
    ``keys`` group. Exact NOT-EXISTS dominance semantics."""
    part = keys if keys else [F.lit(1)]
    gx = df.groupBy(*part, x).agg(F.max(y).alias("_gy"))
    wprev = (
        W.partitionBy(*part)
        .orderBy(F.col(x).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    verdict = gx.select(
        *[F.col(k) for k in (keys or [])],
        F.col(x),
        F.col("_gy"),
        F.max("_gy").over(wprev).alias("_prev_best"),
    )
    joined = df.join(verdict, [*keys, x])
    dominated = (
        F.coalesce(F.col("_prev_best") >= F.col(y), F.lit(False))
        | (F.col("_gy") > F.col(y))
    )
    return joined.filter(~dominated).drop("_gy", "_prev_best")


def skyline(
    df: DataFrame,
    x: str,
    y: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Exact 2-criteria skyline: minimize ``x``, maximize ``y``, optionally
    per ``keys`` group. NULLs in either criterion are excluded (NULL never
    dominates and is never ranked — same as the SQL NOT EXISTS form over
    non-null rows)."""
    clash = {"_salt", "_rm", "_gy", "_prev_best"} & set(df.columns)
    if clash:
        raise ValueError(
            f"columns collide with internal names: {sorted(clash)}"
        )
    df = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    if keys:
        return _frontier_flags(df, keys, x, y)
    # Global frontier: conservative bucket-local pre-filter (one keyed
    # window, single plan branch — no self-join on a nondeterministic
    # key), then the exact pass over the tiny candidate union. A row is
    # dropped only when an earlier row in (x asc, y desc) order within
    # its bucket has strictly larger y — that row has x <= and y >, i.e.
    # true dominance — so the survivors are a superset of the frontier.
    n_buckets = df.sparkSession.sparkContext.defaultParallelism * 4
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_buckets))
    wloc = (
        W.partitionBy("_salt")
        .orderBy(F.col(x).asc(), F.col(y).desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_rm", F.max(y).over(wloc))
        .filter(F.col("_rm").isNull() | (F.col("_rm") <= F.col(y)))
        .drop("_salt", "_rm")
    )
    return _frontier_flags(local, [], x, y)
