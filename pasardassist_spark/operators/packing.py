"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget training sequences by concat-and-chunk — documents are
laid out in a deterministic global order and the stream of tokens is cut
every ``budget`` tokens (the standard GPT-style packing layout; a document
straddling a cut is flagged so the tokenizer stage can split or re-pad it).

The core primitive is a GLOBAL EXCLUSIVE PREFIX SUM over a deterministic
order. The naive form — ``Window.orderBy(key)`` with no partitionBy — is a
single-partition sort: one task holds the whole corpus, the classic
100 TB wall. This module implements the distributed two-phase prefix sum
instead:

1. range-bucket rows by the (monotone) order key — bucket boundaries are
   derived from the key's min/max, a 2-long metadata agg, NOT a sample, so
   the layout is deterministic under any partitioning;
2. cumsum WITHIN each bucket (hash-partitioned window, all buckets in
   parallel);
3. cumsum the per-bucket totals (a second window over n_buckets rows —
   driver-scale metadata) and broadcast-join each bucket's global offset
   back.

Cost: one shuffle of the rows (bucket hash) + one tiny broadcast. The
DuckDB oracle computes the same prefix sum with a plain global window —
a fully independent implementation, so the two-phase machinery is
differentially verified, not self-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_INTERNAL = ("_pb", "_run", "_boff", "_btot")


def _guard_null_key(key: str, bucket, fn: str):
    """Wrap a bucket expression so a null/NaN ``key`` RAISES instead of
    yielding a null bucket that the offsets inner join would silently
    drop — the same loud-failure contract as distributed_row_number
    (null does not order against numbers, so no bucket placement can
    match the single-node window's NULLS FIRST/LAST rule)."""
    kd = F.col(key).cast("double")
    return F.when(
        kd.isNull() | F.isnan(kd),
        F.raise_error(F.lit(
            f"{fn}: key '{key}' is null/NaN on some row — the range "
            "bucket would be null and the row silently dropped by the "
            "offsets join, diverging from the single-node window's "
            "NULLS FIRST rule; filter or coalesce the key first"
        )).cast("int"),
    ).otherwise(bucket)


def exclusive_prefix_sum(
    df: DataFrame,
    key: str,
    value: str,
    out: str = "cum_before",
    n_buckets: int = 256,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Add ``out`` = sum of ``value`` over all rows with a STRICTLY smaller
    ``key`` (exclusive running total in global ``key`` order).

    Contract: ``key`` must be numeric and non-null. Duplicate keys are
    well-defined: ties share the same ``out`` (the sum over strictly
    smaller keys — the RANGE window frame makes "before" key-based, not
    row-based, so the result is deterministic under any partitioning even
    with ties). ``value`` may be any sign; packing passes token counts but
    the prefix sum itself doesn't care. At scale, pick ``n_buckets`` ~
    cluster cores so each range bucket sorts locally.
    """
    clash = set(_INTERNAL) & set(df.columns)
    if clash:
        raise ValueError(f"columns collide with internal names: {sorted(clash)}")
    if bounds is None:
        # Callers that already know the key range (e.g. pack_bfd's
        # histogram pass carries min/max ids per bin) pass ``bounds`` to
        # skip this extra action over the input.
        row = df.agg(F.min(key), F.max(key), F.count(F.lit(1))).first()
        if row[0] is None:
            if row[2]:
                raise ValueError(
                    f"exclusive_prefix_sum: key '{key}' is null on every "
                    "row; filter or coalesce the key first"
                )
            return df.withColumn(out, F.lit(0).cast("long"))
        import math
        if math.isnan(float(row[1])):
            raise ValueError(
                f"exclusive_prefix_sum: key '{key}' is NaN on some row; "
                "filter the key first"
            )
        bounds = (int(row[0]), int(row[1]))
    lo, hi = bounds
    span = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    b = _guard_null_key(
        key,
        F.floor((F.col(key) - F.lit(int(lo))) / F.lit(span)).cast("int"),
        "exclusive_prefix_sum",
    )
    with_b = df.withColumn("_pb", b)
    # phase 1: EXCLUSIVE cumsum within each range bucket (parallel). The
    # RANGE frame ending at -1 sums keys strictly below this row's key, so
    # duplicate keys all see the same prefix.
    w_in = (
        W.partitionBy("_pb").orderBy(key).rangeBetween(W.unboundedPreceding, -1)
    )
    local = with_b.withColumn(
        "_run", F.coalesce(F.sum(value).over(w_in), F.lit(0))
    )
    # phase 2: bucket offsets — n_buckets rows, a metadata-sized window
    w_off = W.orderBy("_pb").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        with_b.groupBy("_pb")
        .agg(F.sum(value).alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(w_off), F.lit(0)))
        .drop("_btot")
    )
    return (
        local.join(F.broadcast(offsets), "_pb")
        .withColumn(out, (F.col("_boff") + F.col("_run")).cast("long"))
        .drop(*_INTERNAL)
    )


def inclusive_prefix_sum(
    df: DataFrame,
    key: str,
    value: str | Sequence[str],
    out: str | Sequence[str] = "cum_through",
    n_buckets: int = 256,
) -> DataFrame:
    """Add ``out`` = sum of ``value`` over all rows with ``key`` <= this
    row's key (INCLUSIVE running total in global ``key`` order), via the
    same two-phase distributed plan as :func:`exclusive_prefix_sum`.

    Unlike the exclusive form — whose RANGE-frame-ending-at ``-1`` trick
    defines "before" as ``key <= current - 1`` and therefore requires
    integer-spaced keys — the inclusive frame ends at the CURRENT key, so
    ``key`` may be any numeric type including fractional doubles (the
    ECDF/cumulative-count case). Duplicate keys all receive the same
    ``out`` (the full sum through their shared key), deterministic under
    any partitioning.

    ``value``/``out`` accept parallel lists to cumulate SEVERAL columns in
    ONE pass — the window sums share the single (bucket, key) sort and the
    offsets frame, so a two-sample ECDF costs one shuffle, not one per
    sample.
    """
    values = [value] if isinstance(value, str) else list(value)
    outs = [out] if isinstance(out, str) else list(out)
    if len(values) != len(outs):
        raise ValueError(f"{len(values)} value cols but {len(outs)} out names")
    # guard the names THIS form actually generates (per-out suffixed), not
    # the exclusive form's literals
    internal = {"_pb", *(f"_run{o}" for o in outs), *(f"_btot{o}" for o in outs), *(f"_boff{o}" for o in outs)}
    clash = internal & set(df.columns)
    if clash:
        raise ValueError(f"columns collide with internal names: {sorted(clash)}")
    bounds = df.agg(F.min(key), F.max(key), F.count(F.lit(1))).first()
    if bounds[0] is None:
        if bounds[2]:
            raise ValueError(
                f"inclusive_prefix_sum: key '{key}' is null on every "
                "row; filter or coalesce the key first"
            )
        for o in outs:
            df = df.withColumn(o, F.lit(0).cast("long"))
        return df
    import math
    if math.isnan(float(bounds[1])):
        raise ValueError(
            f"inclusive_prefix_sum: key '{key}' is NaN on some row; "
            "filter the key first"
        )
    lo, hi = bounds[0], bounds[1]
    span = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    b = _guard_null_key(
        key,
        F.floor((F.col(key) - F.lit(int(lo))) / F.lit(span)).cast("int"),
        "inclusive_prefix_sum",
    )
    with_b = df.withColumn("_pb", b)
    w_in = (
        W.partitionBy("_pb").orderBy(key).rangeBetween(W.unboundedPreceding, 0)
    )
    local = with_b
    for v, o in zip(values, outs):
        local = local.withColumn(
            f"_run{o}", F.coalesce(F.sum(v).over(w_in), F.lit(0))
        )
    w_off = W.orderBy("_pb").rowsBetween(W.unboundedPreceding, -1)
    offsets = with_b.groupBy("_pb").agg(
        *[F.sum(v).alias(f"_btot{o}") for v, o in zip(values, outs)]
    )
    for o in outs:
        offsets = offsets.withColumn(
            f"_boff{o}",
            F.coalesce(F.sum(f"_btot{o}").over(w_off), F.lit(0)),
        ).drop(f"_btot{o}")
    joined = local.join(F.broadcast(offsets), "_pb")
    for o in outs:
        joined = joined.withColumn(
            o, (F.col(f"_boff{o}") + F.col(f"_run{o}")).cast("long")
        ).drop(f"_run{o}", f"_boff{o}")
    return joined.drop("_pb")


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk packing: lay documents end-to-end in ``key`` order
    and cut a training sequence every ``budget`` tokens.

    Adds ``seq_id`` (which sequence this document starts in), ``seq_offset``
    (token position within that sequence), and ``crosses_boundary`` (true
    when the document straddles a cut and needs splitting downstream).
    Deterministic under any partitioning — same corpus, same layout.
    """
    out = exclusive_prefix_sum(df, key, token_col)
    cum = F.col("cum_before")
    tok = F.col(token_col)
    return (
        out.withColumn("seq_id", F.floor(cum / budget).cast("long"))
        .withColumn("seq_offset", F.pmod(cum, F.lit(budget)).cast("long"))
        .withColumn(
            "crosses_boundary",
            F.floor((cum + tok - 1) / budget).cast("long") > F.col("seq_id"),
        )
    )


def batch_by_length(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_rows: int,
) -> DataFrame:
    """Padding-minimizing inference batching: rows sort by token count and
    chunk into fixed-size batches of ``max_rows`` — neighbors in length
    order have near-equal lengths, so per-batch padding (each row pads to
    the batch max) collapses versus arrival-order batching (the standard
    bucketed-batching layout every inference server uses; pack_sequences
    is its training-side sibling).

    batch_id = global length-rank // max_rows, where the rank is the
    distributed two-phase prefix COUNT over the (token_col, id_col)
    composite key — same machinery, same no-single-task-sort guarantee
    as pack_sequences; ``id_col`` (unique, non-null, >= 0, < 2^40) breaks
    length ties so the layout is total and deterministic under any
    partitioning; ``token_col`` must be non-null and in [0, 2^23).

    Adds ``batch_id`` and ``batch_pos`` (rank within the batch). Padding
    efficiency is pinned by test: sorted batching wastes no more padding
    than arrival-order chunking on the same data.
    """
    clash = {"_bk", "_one", "_rank"} & set(df.columns)
    if clash:
        raise ValueError(f"columns collide with internal names: {sorted(clash)}")
    # composite numeric key: length-major, id-minor (ids bounded per
    # contract; scale the length into disjoint ranges). The long key caps
    # token counts at 2^23 and ids at 2^40 — beyond either the product
    # wraps/collides and the layout silently inverts, so fail loudly on
    # BOTH halves of the composite (a null/negative/oversized id corrupts
    # the key just as silently as an oversized count).
    lim = df.agg(
        F.max(token_col).alias("mx"),
        F.min(token_col).alias("mn"),
        F.sum(F.col(token_col).isNull().cast("long")).alias("null_toks"),
        F.min(id_col).alias("mn_id"),
        F.max(id_col).alias("mx_id"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("null_ids"),
    ).first()
    if lim.mx is not None and int(lim.mx) >= (1 << 23):
        raise ValueError(
            f"token counts up to {lim.mx} overflow the composite sort key "
            "(limit 2^23); pre-split or bucket such rows first"
        )
    if lim.null_toks:
        raise ValueError(
            f"{token_col} has {lim.null_toks} null values; a null count "
            "nulls the composite key and silently corrupts the layout"
        )
    if lim.mn is not None and int(lim.mn) < 0:
        raise ValueError(
            f"{token_col} has negative values (min {lim.mn}); counts must "
            "be >= 0 or the composite key inverts the length order"
        )
    if lim.null_ids:
        raise ValueError(f"{id_col} has {lim.null_ids} null values; ids must be non-null")
    if lim.mn_id is not None and int(lim.mn_id) < 0:
        raise ValueError(f"{id_col} has negative values (min {lim.mn_id}); ids must be >= 0")
    if lim.mx_id is not None and int(lim.mx_id) >= (1 << 40):
        raise ValueError(
            f"{id_col} values up to {lim.mx_id} overflow the composite sort "
            "key (limit 2^40); renumber ids first"
        )
    key = (F.col(token_col).cast("long") * F.lit(1 << 40)) + F.col(id_col)
    out = exclusive_prefix_sum(
        df.withColumn("_bk", key).withColumn("_one", F.lit(1)),
        "_bk",
        "_one",
        out="_rank",
        n_buckets=256,
    )
    return (
        out.withColumn(
            "batch_id", (F.col("_rank") / max_rows).cast("long")
        )
        .withColumn("batch_pos", (F.col("_rank") % max_rows).cast("int"))
        .drop("_bk", "_one", "_rank")
    )


def pack_and_split(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """The executable form of pack_sequences: emit one row per (document,
    sequence) SEGMENT, so boundary-crossing documents are actually split
    instead of just flagged. A document laid out at global token offset C
    with T tokens spans sequences floor(C/budget)..floor((C+T-1)/budget);
    each segment row carries

    - ``seq_id``          — which training sequence the segment lands in,
    - ``seq_offset``      — token position of the segment inside that
                            sequence (0 for continuation segments),
    - ``tok_start``       — offset of the segment inside the DOCUMENT,
    - ``tok_len``         — segment length (per-doc tok_lens sum to T).

    Same determinism contract as pack_sequences (the one two-phase prefix
    sum in ``key`` order); the fan-out is a JVM ``sequence``+``explode``
    over each doc's sequence span — row amplification equals the segment
    count (1 + crossings), there is no shuffle after the prefix sum.
    Zero-token documents produce no segments (nothing to place)."""
    out = exclusive_prefix_sum(df, key, token_col)
    cum = F.col("cum_before")
    tok = F.col(token_col).cast("long")
    b = F.lit(budget).cast("long")
    s0 = F.floor(cum / budget).cast("long")
    s1 = F.floor((cum + tok - 1) / budget).cast("long")
    seg = (
        out.filter(tok > 0)
        .withColumn("seq_id", F.explode(F.sequence(s0, s1)))
    )
    seq_start = F.col("seq_id") * b
    return (
        seg.withColumn(
            "seq_offset",
            F.when(seq_start > cum, F.lit(0)).otherwise(cum - seq_start).cast("long"),
        )
        .withColumn(
            "tok_start",
            F.greatest(seq_start - cum, F.lit(0)).cast("long"),
        )
        .withColumn(
            "tok_len",
            (
                F.least(seq_start + b, cum + tok) - F.greatest(seq_start, cum)
            ).cast("long"),
        )
        .drop("cum_before")
    )


# Below this row count a single-task ordered window is CHEAPER than the
# two-phase shape (3 fixed jobs: bounds agg, bucketed shuffle, offsets
# broadcast — ~1.3 s overhead each on local[32] vs milliseconds for a
# sub-million-row sort); above it the single task becomes the 100 TB wall.
# Callers that already know their grain count dispatch on this (the
# rfm/gini pattern: count once for the NTILE arithmetic, branch on it).
SINGLE_SORT_MAX_ROWS = 5_000_000


def distributed_row_number(
    df: DataFrame,
    bucket_key,
    order,
    out: str = "rk",
    n_buckets: int = 256,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Global ROW_NUMBER over a composite total order, distributed — the
    two-phase counterpart of ``row_number().over(Window.orderBy(...))``
    (whose unpartitioned form is a single-task sort of the whole frame,
    the same 100 TB wall the prefix sums avoid).

    ``order`` is the full ordering column list (must be a TOTAL order —
    give it a unique tiebreaker, exactly as the single-node form needs
    for determinism). ``bucket_key`` is a NUMERIC Column that is
    MONOTONE NON-DECREASING in that order (for ``ORDER BY x`` pass
    ``F.col("x")``; for ``ORDER BY x DESC`` pass ``-F.col("x")``; any
    monotone cast works — equal-order rows may share a coarse bucket,
    and a lossy-but-monotone cast like decimal->double only ever merges
    neighbors into one bucket, never reorders across buckets, so
    correctness needs only monotonicity, not injectivity). Phase 1
    numbers rows WITHIN each range bucket (hash-partitioned window);
    phase 2 cumsums the n_buckets row counts (metadata window) and
    broadcasts each bucket's global offset back. One shuffle + one tiny
    broadcast, same as the prefix sums.

    Contract: ``bucket_key`` must evaluate NON-NULL and non-NaN on every
    row — null/NaN don't order against numbers, so no bucket placement
    can match the single-node window's NULLS FIRST/LAST rule for an
    arbitrary ``order``; a null bucket key RAISES (filter or coalesce
    first) rather than silently misranking. ``bounds`` (min, max of the
    double-cast bucket key) skips the bounds aggregation when the
    caller already knows the range — e.g. one combined agg computing
    several rank passes' bounds over a shared persisted frame.
    """
    internal = {"_pb", "_rn", "_boff", "_bcnt"}
    clash = internal & set(df.columns)
    if clash:
        raise ValueError(f"columns collide with internal names: {sorted(clash)}")
    bk = bucket_key.cast("double")
    bk = F.when(
        bk.isNull() | F.isnan(bk),
        F.raise_error(F.lit(
            "distributed_row_number: bucket_key is null/NaN on some row — "
            "null does not order against numbers, so bucket placement "
            "would silently diverge from the single-node window form; "
            "filter or coalesce the key first"
        )).cast("double"),
    ).otherwise(bk)
    if bounds is None:
        row = df.agg(F.min(bk), F.max(bk)).first()
        if row[0] is None:
            return df.withColumn(out, F.lit(None).cast("long"))
        bounds = (float(row[0]), float(row[1]))
    lo, hi = bounds
    span = max((hi - lo) / n_buckets, 1e-300)
    b = F.least(
        F.floor((bk - F.lit(lo)) / F.lit(span)), F.lit(n_buckets - 1)
    ).cast("int")
    with_b = df.withColumn("_pb", b)
    w_in = W.partitionBy("_pb").orderBy(*order)
    local = with_b.withColumn("_rn", F.row_number().over(w_in))
    w_off = W.orderBy("_pb").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        with_b.groupBy("_pb")
        .agg(F.count(F.lit(1)).alias("_bcnt"))
        .withColumn("_boff", F.coalesce(F.sum("_bcnt").over(w_off), F.lit(0)))
        .drop("_bcnt")
    )
    return (
        local.join(F.broadcast(offsets), "_pb")
        .withColumn(out, (F.col("_boff") + F.col("_rn")).cast("long"))
        .drop("_pb", "_rn", "_boff")
    )


def ntile_from_rank(rk, n, k: int):
    """SQL NTILE(k) computed arithmetically from a global row number
    ``rk`` (1-based) and the total row count ``n`` — exact integer
    arithmetic matching the standard definition both Spark and DuckDB
    implement: the first n % k tiles hold ceil(n/k) rows, the rest
    floor(n/k). Lets a distributed row number replace the single-task
    ``ntile().over(Window.orderBy(...))`` without changing one output
    value (differentially pinned against F.ntile in the tests).
    """
    def idiv(a, b):  # exact long floor-division for non-negative a, b>0
        return ((a - F.pmod(a, b)) / b).cast("long")

    base = idiv(n, F.lit(k))
    rem = n - base * k
    cut = rem * (base + 1)
    # ceil(a/b) = floor((a + b - 1) / b), exact in longs
    in_big = idiv(rk + base, base + 1)
    in_small = rem + idiv(
        rk - cut + F.greatest(base, F.lit(1)) - 1, F.greatest(base, F.lit(1))
    )
    return F.when(rk <= cut, in_big).otherwise(in_small).cast("int")
