"""Distribution-drift measurement: the exact two-sample KS core shared by
the batch query (queries/matching.py:stat_ks_test) and the streaming drift
monitor (streaming/drift.py).

D = sup |F_a(x) - F_b(x)| computed entirely in integers: per-distinct-value
counts in, cumulative counts via the two-phase distributed INCLUSIVE prefix
sum, then max |ca*n_b - cb*n_a| (cross-multiplied, so no float ECDF ever
exists). The single division and the Smirnov critical value happen once at
the 1-row edge, rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Smirnov critical coefficient at alpha = 0.05 for the two-sided test
KS_ALPHA_COEFF = 1.358

# PSI epsilon: zero-count bins contribute via this floor probability
# (the standard smoothing — PSI is undefined at p=0)
PSI_EPS = 1e-6

# conventional PSI action thresholds: < 0.1 stable, 0.1-0.25 monitor,
# >= 0.25 drifted
PSI_DRIFT_THRESHOLD = 0.25


def ks_distance(
    counts: DataFrame,
    value_col: str = "value",
    cnt_a: str = "cnt_a",
    cnt_b: str = "cnt_b",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov readout from a per-distinct-value
    counts frame (one row per value, both samples' counts, zeros where a
    sample lacks the value; ``value_col`` must be numeric and distinct).

    Returns ONE row: n_a, n_b, d_stat (6 dp), d_crit (alpha=0.05, 6 dp),
    and the reject flag comparing the two ROUNDED numbers — the
    engine-exact contract stat_ks_test's DuckDB oracle mirrors. Cost: two
    distributed prefix sums over the distinct-value grain plus a 1-row
    broadcast; no single-task global sort.
    """
    from pasardassist_spark.operators.packing import inclusive_prefix_sum

    # The counts frame is consumed THREE times (the prefix sum's row and
    # offsets branches + the totals aggregate); persist it so the fact is
    # scanned once (§18 single-fact-scan discipline — the frame is
    # distinct-value-grain by contract, bounded)
    counts = counts.persist()
    # both cumulative counts in ONE two-phase pass: the window sums share
    # the single (bucket, value) sort and the offsets broadcast
    g = inclusive_prefix_sum(
        counts, value_col, [cnt_a, cnt_b], out=["_ca", "_cb"]
    )
    # totals from the RAW counts frame: aggregating g would replay the
    # whole two-phase prefix-sum plan just to sum two columns
    n = counts.agg(
        F.sum(cnt_a).cast("long").alias("n_a"),
        F.sum(cnt_b).cast("long").alias("n_b"),
    )
    d = (
        g.crossJoin(F.broadcast(n))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a")
            ).alias("diff"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").cast("long").alias("d_num"))
    )
    d_stat = F.round(
        F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b")), 6
    )
    d_crit = F.round(
        KS_ALPHA_COEFF
        * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double")
            / (F.col("n_a") * F.col("n_b"))
        ),
        6,
    )
    return d.select(
        "n_a",
        "n_b",
        d_stat.alias("d_stat"),
        d_crit.alias("d_crit"),
        (d_stat > d_crit).alias("reject"),
    )


def psi_distance(
    counts: DataFrame,
    bin_col: str = "value",
    cnt_a: str = "cnt_a",
    cnt_b: str = "cnt_b",
) -> DataFrame:
    """Population stability index between two binned distributions:
    PSI = sum over bins (p_a - p_b) * ln(p_a / p_b), the scorecard-drift
    metric used alongside KS (KS answers "statistically different?";
    PSI's conventional thresholds answer "different ENOUGH to act?").

    Input is the same per-bin counts frame as :func:`ks_distance` (for
    continuous values, quantize to a grid first — PSI is inherently a
    binned statistic, typically ~10 quantile bins of the reference).
    Zero-count bins are floored at PSI_EPS probability (the standard
    smoothing). The float reduction folds over the SORTED bin list
    (stat_entropy contract), so the result is deterministic under any
    partitioning; ln crosses libm, so the score rounds to 6 dp.

    Returns ONE row: n_a, n_b, n_bins, psi (6 dp), drifted
    (psi >= PSI_DRIFT_THRESHOLD). Cost: one 1-row totals broadcast onto
    the bin grain and one ordered fold over |bins| rows.
    """
    n = counts.agg(
        F.sum(cnt_a).cast("long").alias("n_a"),
        F.sum(cnt_b).cast("long").alias("n_b"),
    )
    j = counts.crossJoin(F.broadcast(n))
    pa = F.greatest(
        F.col(cnt_a).cast("double") / F.col("n_a"), F.lit(PSI_EPS)
    )
    pb = F.greatest(
        F.col(cnt_b).cast("double") / F.col("n_b"), F.lit(PSI_EPS)
    )
    terms = j.select(
        "n_a",
        "n_b",
        F.col(bin_col).alias("_bin"),
        ((pa - pb) * F.log(pa / pb)).alias("_term"),
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(_bin, _term))), "
            "cast(0.0 as double), (acc, x) -> acc + x._term)"
        ).alias("_psi"),
    )
    psi = F.round(F.col("_psi"), 6)
    return agg.select(
        "n_a",
        "n_b",
        "n_bins",
        psi.alias("psi"),
        (psi >= PSI_DRIFT_THRESHOLD).alias("drifted"),
    )


# two-sided normal critical value at alpha = 0.05
MW_Z_CRIT = 1.959964

# Largest n for which the x4-scaled Spearman moment sums (<= 4n^3) stay
# exactly representable in int64: 4 * (1.3e6)^3 ~ 8.8e18 < 2^63.
SPEARMAN_MAX_N = 1_300_000


def mannwhitney_u(
    counts: DataFrame,
    value_col: str = "value",
    cnt_a: str = "cnt_a",
    cnt_b: str = "cnt_b",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test from a per-distinct-value
    counts frame — the nonparametric "did the median shift" companion to
    :func:`ks_distance`'s shape test, and the right tool when the metric
    is ordinal or heavy-tailed (KS reacts to any CDF gap; U to stochastic
    dominance).

    Rank arithmetic stays in INTEGERS to the edge: with t(v) the tied
    count at value v and ct(v) the inclusive cumulative total, the
    average rank is (2*ct - t + 1)/2, so DOUBLED rank sums are exact
    integers: R1_x2 = sum cnt_a * (2*ct - t + 1), U1_x2 = R1_x2 -
    n_a*(n_a+1). The normal approximation uses the tie-corrected
    variance n_a*n_b/12 * ((N+1) - sum(t^3 - t)/(N*(N-1))); all floats
    appear only in the final 1-row projection with the same expression
    tree the SQL oracle uses, rounded to 6 dp.

    Loud-failure bound: sum(t^3) <= max(t)^2 * N, so the int64 tie term
    is exact while max(t)^2 * N < 2^63. Beyond that the edge projection
    raises a documented error (bucketize such degenerate metrics first);
    under ANSI mode (the Spark 4 default) an actual overflow would also
    raise generically, and under a non-ANSI deployment the arithmetic
    would WRAP silently — the guard makes both fail the same loud way. Degenerate-variance guard: when one sample is empty or every
    observation is tied at a single value, the tie-corrected variance is
    exactly 0 and z would be 0/0 = NaN; the operator defines z = 0.0 and
    significant = false there (the test has no evidence of a shift).

    Cost: ONE two-phase distributed prefix sum over the distinct-value
    grain + one global 1-row aggregation; no single-task sort.

    Returns one row: n_a, n_b, u_stat (U of sample A), z (6 dp),
    significant (|z| > 1.959964 comparing rounded z).
    """
    from pasardassist_spark.operators.packing import inclusive_prefix_sum

    # consumed twice by the prefix sum's branches; value-grain, bounded
    with_t = counts.withColumn("_t", F.col(cnt_a) + F.col(cnt_b)).persist()
    g = inclusive_prefix_sum(with_t, value_col, ["_t"], out=["_ct"])
    agg = g.agg(
        F.sum(cnt_a).cast("long").alias("n_a"),
        F.sum(cnt_b).cast("long").alias("n_b"),
        F.sum(
            F.col(cnt_a) * (2 * F.col("_ct") - F.col("_t") + 1)
        ).cast("long").alias("_r1x2"),
        F.sum(
            F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
        ).cast("long").alias("_tie3"),
        F.max("_t").cast("long").alias("_tmax"),
        F.count(F.lit(1)).cast("long").alias("_ng"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n_tot = n_a + n_b
    u = (F.col("_r1x2") - n_a * (n_a + 1)).cast("double") / 2
    mean = (n_a * n_b).cast("double") / 2
    var = ((n_a * n_b).cast("double") / 12) * (
        (n_tot + 1) - F.col("_tie3").cast("double") / (n_tot * (n_tot - 1))
    )
    # int64-exactness check in DOUBLE (the check itself must not wrap);
    # 9.0e18 < 2^63 leaves headroom for double rounding of the bound.
    tmax_d = F.col("_tmax").cast("double")
    overflow = tmax_d * tmax_d * n_tot.cast("double") >= F.lit(9.0e18)
    nondegenerate = (n_a > 0) & (n_b > 0) & (F.col("_ng") > 1)
    z = (
        F.when(overflow, F.raise_error(F.lit(
            "mannwhitney_u: tie term exceeds the exact-int64 bound "
            "(max tie count^2 * N >= 2^63); bucketize the metric first"
        )))
        .when(nondegenerate, F.round((u - mean) / F.sqrt(var), 6))
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        "n_a", "n_b",
        u.alias("u_stat"),
        z.alias("z"),
        (F.abs(z) > F.lit(MW_Z_CRIT)).alias("significant"),
    )


def spearman_rho(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman rank correlation (tie-aware, exact): Pearson's r computed
    on average ranks. Every rank is kept DOUBLED so ties stay integral
    (the :func:`mannwhitney_u` trick), and the identity
    sum(r2) = n*(n+1) collapses the means, leaving three x4-scaled moment
    sums — sum(rx2*ry2), sum(rx2^2), sum(ry2^2) — each an exact BIGINT:

        rho = (Sxy_x4) / sqrt(Sxx_x4 * Syy_x4),
        S.._x4 = sum(r2*r2) - n*(n+1)^2.

    The single division/sqrt happens at the 1-row edge, rounded to 6 dp —
    the same expression tree the SQL oracle uses, so the result is
    hash-comparable. Integer bound: sum(rx2^2) <= 4n^3, so the int64 path
    is exact up to n ~ 1.3M input rows — the per-GROUP grain this is
    meant for (per-customer, per-item aggregates); rankings over raw
    100 TB event grains should pre-aggregate first (and would need a
    decimal widening this deliberately avoids). Past that bound Spark's
    non-ANSI long arithmetic would wrap silently, so the edge projection
    RAISES when n > 1.3M instead of emitting a corrupted rho. When either
    axis is constant (Sxx or Syy = 0) rho is undefined; the operator
    returns NULL rather than NaN.

    Distributed shape: one prefix sum per axis at the DISTINCT-value
    grain (never a global row window), two value-keyed joins to carry the
    rank maps back onto rows, one 1-row aggregation. Rank maps are
    |distinct values| rows — typically broadcastable.

    Returns one row: n, rho (6 dp).
    """
    from pasardassist_spark.operators.packing import inclusive_prefix_sum

    # consumed by both rank maps AND the ranked join (3+ lineages); the
    # docstring's int64 bound already caps this frame at ~1.3M rows
    df = df.select(x, y).persist()

    def rank_map(col: str) -> DataFrame:
        g = df.groupBy(col).agg(F.count(F.lit(1)).alias("_t"))
        c = inclusive_prefix_sum(g, col, ["_t"], out=["_ct"])
        # doubled average rank of every row holding this value
        return c.select(
            F.col(col),
            (2 * F.col("_ct") - F.col("_t") + 1).alias(f"_r2_{col}"),
        )

    ranked = (
        df
        .join(rank_map(x), x)
        .join(rank_map(y), y)
    )
    rx, ry = F.col(f"_r2_{x}"), F.col(f"_r2_{y}")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx * ry).cast("long").alias("_sxy"),
        F.sum(rx * rx).cast("long").alias("_sxx"),
        F.sum(ry * ry).cast("long").alias("_syy"),
    )
    n = F.col("n")
    mean_term = (n * (n + 1) * (n + 1)).cast("double")
    sxy = F.col("_sxy").cast("double") - mean_term
    sxx = F.col("_sxx").cast("double") - mean_term
    syy = F.col("_syy").cast("double") - mean_term
    rho = (
        F.when(n > SPEARMAN_MAX_N, F.raise_error(F.lit(
            "spearman_rho: n exceeds the exact-int64 moment bound "
            "(sum rx2^2 <= 4n^3 < 2^63 requires n <= 1.3M); "
            "pre-aggregate to a coarser grain first"
        )))
        .when((sxx > 0) & (syy > 0), F.round(sxy / F.sqrt(sxx * syy), 6))
        .otherwise(F.lit(None).cast("double"))
    )
    return agg.select("n", rho.alias("rho"))
