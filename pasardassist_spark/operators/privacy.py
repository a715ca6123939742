"""Privacy release auditing for training-data pipelines: k-anonymity,
l-diversity, t-closeness, and the suppression release step.

Before a curated corpus leaves the pipeline, the standard privacy audit
asks three questions about its quasi-identifier (QI) columns (Sweeney,
"k-Anonymity: A Model for Protecting Privacy", IJUFKS 2002;
Machanavajjhala et al., "l-Diversity", ICDE 2006; Li et al.,
"t-Closeness", ICDE 2007 — all public literature; no reference analog,
this is LLM-pipeline extension surface like the dedup/text shelves):

- is every QI equivalence class at least k rows (re-identification)?
- does every class carry at least l distinct sensitive values
  (homogeneity attack)? Both the distinct count and the ENTROPY form
  (effective number of values, exp(H)) are computed — entropy catches a
  class whose l values are 99%-dominated by one.
- is every class's sensitive-value distribution within total-variation
  distance t of the global distribution (skewness attack)? For a
  categorical sensitive attribute with uniform ground distance, the
  Earth Mover's Distance of the t-closeness paper IS the TVD.

Null contract (r17 review): a null in a QI column is a legitimate
equivalence-class value — groupBy keeps null groups, and every internal
join runs on a STRUCT of the QI columns (struct equality is null-safe),
so null-QI classes are audited and released like any other instead of
silently vanishing at an equi-join. A null in the SENSITIVE column
RAISES loudly (same convention as packing's bucket-key guard): the
class-value machinery joins on the sensitive value, and no silent
placement could be right — band/categorize nulls into an explicit value
upstream.

Scale shape: everything is one hash shuffle at the QI (or QI x value)
grain plus metadata-sized joins. t_closeness avoids the naive
class x value grid entirely: values ABSENT from a class contribute
q(v) each, and sum_absent q(v) = 1 - sum_present q(v), so one
value-grain equi-join + one QI-grain aggregate computes the exact TVD —
the DuckDB oracles build the naive grid, so the closed form is
differentially certified, not self-checked. No driver collects; class
readouts are QI-cardinality-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

_QI_KEY = "_qik"


def k_anonymity_classes(
    df: DataFrame, qi: Sequence[str], k: int
) -> DataFrame:
    """Per-equivalence-class readout: QI columns, ``class_size``, and
    ``meets_k``. A release is k-anonymous iff every row is true."""
    return df.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        (F.count(F.lit(1)) >= k).alias("meets_k"),
    )


def l_diversity(
    df: DataFrame, qi: Sequence[str], sensitive: str, l_min: int
) -> DataFrame:
    """Per-class distinct AND entropy l-diversity of ``sensitive``.

    ``entropy_l`` = exp(H) with H the Shannon entropy of the class's
    sensitive-value distribution, via the one-pass identity
    H = ln(N) - (sum c_v ln c_v) / N over the class-value counts —
    two stacked aggregates, no window, no second scan. A null sensitive
    value counts as one distinct value here (groupBy keeps it; no join
    is involved), consistent with the t-closeness forms REJECTING nulls
    — diversity of a column that still has nulls is answerable, distance
    between distributions with an implicit null bucket is not."""
    cv = df.groupBy(*qi, sensitive).agg(F.count(F.lit(1)).alias("_c"))
    n = F.sum("_c").cast("long")
    h = F.log(n.cast("double")) - (
        F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double")))
        / n.cast("double")
    )
    return cv.groupBy(*qi).agg(
        n.alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.round(F.exp(h), 6).alias("entropy_l"),
        (F.count(F.lit(1)) >= l_min).alias("meets_l"),
    )


def _guard_sensitive(df: DataFrame, sensitive: str, fn: str) -> DataFrame:
    """Replace ``sensitive`` with a loud-failure wrapper: evaluating a
    null raises (packing's bucket-key convention) — the class-value
    joins run on this column and would otherwise silently drop or
    mis-score the row."""
    dt = df.schema[sensitive].dataType.simpleString()
    c = F.col(sensitive)
    return df.withColumn(
        sensitive,
        F.when(
            c.isNull(),
            F.raise_error(F.lit(
                f"{fn}: sensitive column '{sensitive}' is null on some "
                "row — null never equi-joins, so the class-value "
                "machinery would silently drop or mis-score it; "
                "band/categorize nulls into an explicit value upstream"
            )).cast(dt),
        ).otherwise(c),
    )


def _class_value_counts(
    df: DataFrame, qi: Sequence[str], sensitive: str, fn: str
):
    """Shared scaffold of both t-closeness forms: ONE fact scan into the
    persisted class-value counts frame (QI x value grain, bounded), with
    the global value distribution and the class sizes derived from it
    (§18 single-fact-scan discipline; the sweep/session owner bounds the
    cache, queries are independent). The QI tuple is carried as one
    STRUCT column ``_qik`` so every downstream join is null-safe."""
    guarded = _guard_sensitive(df, sensitive, fn)
    cv = (
        guarded.withColumn(_QI_KEY, F.struct(*qi))
        .groupBy(_QI_KEY, sensitive)
        .agg(F.count(F.lit(1)).cast("long").alias("_cv"))
        .persist()
    )
    glob = cv.groupBy(sensitive).agg(F.sum("_cv").alias("_gv"))
    sizes = cv.groupBy(_QI_KEY).agg(F.sum("_cv").alias("_nc"))
    return cv, glob, sizes


def _unpack_qi(qi: Sequence[str]) -> list:
    return [F.col(_QI_KEY)[c].alias(c) for c in qi]


def t_closeness(
    df: DataFrame, qi: Sequence[str], sensitive: str, t_max: float
) -> DataFrame:
    """Per-class total-variation distance between the class's
    sensitive-value distribution and the global one; ``meets_t``
    compares the 6-dp ROUNDED distance (the engine-exact contract the
    oracle mirrors).

    Exact-integer inside: with N the total row count, n_c the class
    size, cvn/gv the class/global value counts,

        TVD = [ sum_{v in class} |cvn*N - gv*n_c|
                + (n_c*N - sum_{v in class} gv*n_c) ] / (2 * n_c * N)

    — the second term is the mass of values the class never exhibits
    (computed by complement, so no class x value grid is materialized at
    any scale), and the whole numerator is a BIGINT: the only float op
    is the final division, so the 6-dp round is bit-identical to the
    oracle's naive-grid form. Null sensitive values RAISE; null QI
    values form an audited class like any other (struct-keyed joins)."""
    cv, glob, sizes = _class_value_counts(df, qi, sensitive, "t_closeness")
    tot = cv.agg(F.sum("_cv").alias("_N"))
    # value-grain equi-join (glob is value-cardinality-sized; AQE
    # broadcasts it — no manual hint, it is fact-derived), then the QI
    # join/groupBy pair shares one hash partitioning; the 1-row total is
    # the standard broadcast-constant crossJoin
    j = (
        cv.join(glob, sensitive)
        .join(sizes, _QI_KEY)
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(F.col("_cv") * F.col("_N") - F.col("_gv") * F.col("_nc"))
    qterm = F.col("_gv") * F.col("_nc")
    agg = j.groupBy(_QI_KEY).agg(
        F.first("_nc").alias("class_size"),
        F.first("_N").alias("_Ntot"),
        (
            F.sum(term)
            + (F.first("_nc") * F.first("_N") - F.sum(qterm))
        ).alias("_num"),
    )
    tvd = F.round(
        F.col("_num").cast("double")
        / (
            2.0
            * F.col("class_size").cast("double")
            * F.col("_Ntot").cast("double")
        ),
        6,
    )
    return agg.select(
        *_unpack_qi(qi),
        F.col("class_size"),
        tvd.alias("tvd"),
        (tvd <= t_max).alias("meets_t"),
    )


def t_closeness_ordered(
    df: DataFrame, qi: Sequence[str], sensitive: str, t_max: float
) -> DataFrame:
    """t-closeness for an ORDERED (numeric/ordinal) sensitive attribute —
    the second metric of Li et al. 2007: the 1-D Earth Mover's Distance
    with unit ground distance between adjacent values,

        EMD = (1 / (m - 1)) * sum_i | sum_{j <= i} (p_c(v_j) - q(v_j)) |

    over the m GLOBAL distinct values in order. Unlike the categorical
    TVD, the cumulative difference carries across values a class never
    exhibits, so the class x value grid is inherent to the metric — and
    bounded: the grid is (QI cardinality) x (sensitive-value domain),
    never row-scale, and the per-class window runs over m rows (the
    value domain), never over data. Exact-integer inside: the cumulative
    numerator sum_{j<=i} (cvn_j*N - gv_j*n_c) is a BIGINT; one float
    division + 6-dp round at the end, bit-identical to the oracle's
    self-join cumulative. Null sensitive values RAISE; null QI values
    form an audited class like any other (struct-keyed grid join)."""
    cv, glob, sizes = _class_value_counts(
        df, qi, sensitive, "t_closeness_ordered"
    )
    tot = cv.agg(
        F.sum("_cv").alias("_N"),
        F.count_distinct(sensitive).alias("_m"),
    )
    grid = (
        sizes.crossJoin(F.broadcast(glob))
        .join(cv, [_QI_KEY, sensitive], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("_cvn", F.coalesce(F.col("_cv"), F.lit(0)))
    )
    w = W.partitionBy(_QI_KEY).orderBy(sensitive).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = F.sum(
        F.col("_cvn") * F.col("_N") - F.col("_gv") * F.col("_nc")
    ).over(w)
    stepped = grid.withColumn("_acum", F.abs(cum))
    agg = stepped.groupBy(_QI_KEY).agg(
        F.first("_nc").alias("class_size"),
        F.first("_N").alias("_Nt"),
        F.first("_m").alias("_mv"),
        F.sum("_acum").alias("_num"),
    )
    # m == 1 (degenerate single-value domain): every class's distribution
    # equals the global one, EMD is 0 by definition — not 0/0
    emd = F.when(F.col("_mv") > 1, F.round(
        F.col("_num").cast("double")
        / (
            (F.col("_mv") - F.lit(1)).cast("double")
            * F.col("class_size").cast("double")
            * F.col("_Nt").cast("double")
        ),
        6,
    )).otherwise(F.lit(0.0))
    return agg.select(
        *_unpack_qi(qi),
        F.col("class_size"),
        emd.alias("emd"),
        (emd <= t_max).alias("meets_t"),
    )


def suppress_release(
    df: DataFrame, qi: Sequence[str], k: int
) -> DataFrame:
    """The release step: rows in classes below ``k`` get their QI columns
    suppressed (nulled), everything else passes through — the minimal
    generalization that makes the release k-anonymous (suppressed rows
    form one merged class). Adds ``suppressed``; QI columns keep their
    types (null = suppressed). One QI-grain aggregate joined back on the
    STRUCT of the QI key (null-safe — a row with a null QI value belongs
    to that null-valued class and is released/suppressed by ITS size,
    never dropped; AQE broadcasts the class table when small, no manual
    hint — it is fact-derived and unbounded in general)."""
    keyed = df.withColumn(_QI_KEY, F.struct(*qi))
    sizes = keyed.groupBy(_QI_KEY).agg(F.count(F.lit(1)).alias("_sz"))
    out = keyed.join(sizes, _QI_KEY)
    keep = F.col("_sz") >= k
    for c in qi:
        out = out.withColumn(c, F.when(keep, F.col(c)))
    return out.withColumn("suppressed", ~keep).drop("_sz", _QI_KEY)


def dp_noisy_counts(
    df: DataFrame,
    qi: Sequence[str],
    epsilon: float,
    seed: str = "dp1",
) -> DataFrame:
    """Differentially-private count release (Dwork et al., "Calibrating
    Noise to Sensitivity in Private Data Analysis", TCC 2006): per-QI
    counts plus Laplace(1/epsilon) noise (count queries have sensitivity
    1 under row addition/removal).

    DETERMINIZATION CAVEAT, by design: the uniform draw is derived from
    md5 over the QI tuple — 52 bits of the digest mapped to (0, 1) — so
    the release is reproducible and differentially testable (the DuckDB
    oracle recomputes the identical digest), exactly like the repo's
    seeded reservoir samplers. A production release MUST swap the digest
    for a fresh entropy source; the mechanism, sensitivity, and inverse-
    CDF transform are unchanged by that swap. The key is COLLISION-FREE
    over distinct QI tuples (r17 review): each component is itself
    md5-hashed (fixed width, so a separator inside a value cannot
    re-frame the tuple) and nulls map to a token no digest can equal —
    ('a|b', 'c') vs ('a', 'b|c') and ('a', null) vs (null, 'a') all draw
    independent noise.

    noisy = count - (1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|),
    u = (digest52 + 0.5) / 2^52  (the +0.5 keeps u strictly inside
    (0, 1), so the log never sees 0). One QI-grain aggregate; the noise
    is a scalar expression on the metadata-sized readout."""
    comps = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
        for c in qi
    ]
    key = F.concat_ws("|", F.lit(seed), *comps)
    u = (
        (F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") + 0.5)
        / F.lit(float(1 << 52))
    )
    lap = (
        -(1.0 / epsilon)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return df.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("true_count"),
        F.round(F.count(F.lit(1)) + lap, 6).alias("noisy_count"),
    )


def dp_topk(
    df: DataFrame,
    qi: Sequence[str],
    k: int,
    epsilon: float,
    seed: str = "dptk1",
) -> DataFrame:
    """One-shot differentially-private top-k selection by the Gumbel-max
    mechanism (Durfee & Rogers, "Practical Differentially Private Top-k
    Selection with Pay-what-you-get Composition", NeurIPS 2019): add
    independent Gumbel(2k/epsilon) noise to each category's count and
    release the k noisiest-largest — provably equivalent to k peeling
    rounds of the exponential mechanism at total budget epsilon for
    sensitivity-1 counts, in ONE pass with no sequential re-scoring.

    Same DETERMINIZATION CAVEAT as dp_noisy_counts (seeded md5-derived
    uniforms, collision-free per-component keying, swap for fresh
    entropy in production): g = -scale * ln(-ln(u)) is the inverse-CDF
    Gumbel draw, u strictly inside (0, 1) so neither log sees 0.

    Plan: one QI-grain hash aggregate (corpus-sized work), then the
    rank runs on the CATEGORY readout — metadata-sized by the same
    argument as dp_noisy_counts' release, so the unpartitioned
    row_number window is a single reducer over a bounded frame, not a
    data-scale sort. Ties in noisy score break on the QI columns
    (continuous noise makes real ties measure-zero; the tiebreak keeps
    the release deterministic anyway)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    scale = 2.0 * k / epsilon
    comps = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
        for c in qi
    ]
    key = F.concat_ws("|", F.lit(seed), *comps)
    u = (
        (F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") + 0.5)
        / F.lit(float(1 << 52))
    )
    gumbel = -scale * F.log(-F.log(u))
    scored = df.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    ).withColumn("_noisy", F.col("true_count") + gumbel)
    w = Window.orderBy(F.desc("_noisy"), *[F.col(c) for c in qi])
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            *qi,
            F.col("rank").cast("long").alias("rank"),
            "true_count",
            F.round("_noisy", 6).alias("noisy_score"),
        )
    )


def randomized_response(
    df: DataFrame,
    truth_col: str,
    group_cols: list[str],
    p_truth: float,
    seed: str,
    key_cols: list[str],
) -> DataFrame:
    """Warner's randomized response (Warner 1965) — LOCAL differential
    privacy, completing the shelf's central-DP releases (dp_noisy_counts,
    dp_topk) with the mechanism that runs on the RESPONDENT's side: each
    row reports its true binary ``truth_col`` with probability
    ``p_truth`` and the flipped value otherwise, so no single reported
    bit reveals the truth (epsilon = ln(p/(1-p)) per response), yet the
    group-level rate is recoverable by debiasing:

        pi_hat = (observed_rate - (1 - p)) / (2p - 1)

    Same DETERMINIZATION CAVEAT as dp_noisy_counts: the coin is a seeded
    md5 digest over ``key_cols``, 52 bits mapped to (0, 1), so the
    release is reproducible and the DuckDB oracle recomputes the
    identical flips. ``key_cols`` MUST identify rows uniquely (a
    respondent id): a repeated key draws the SAME coin for every row
    sharing it, correlating flips and biasing the estimator. A
    production deployment swaps the digest for respondent-side entropy;
    the mechanism and estimator are unchanged by that swap.

    One row-local flip expression folded into a single group-grain hash
    aggregate — scan-bound at any scale. Returns per group: n,
    reported_yes, the debiased estimate, and the true rate (emitted for
    the differential/utility check; a real release projects it away).
    """
    if not 0.5 < p_truth < 1.0:
        raise ValueError(f"p_truth must be in (0.5, 1), got {p_truth}")
    keys = list(key_cols)
    comps = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
        for c in keys
    ]
    key = F.concat_ws("|", F.lit(seed), *comps)
    u = (
        (F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") + 0.5)
        / F.lit(float(1 << 52))
    )
    truth = F.col(truth_col).cast("int")
    reported = F.when(u < F.lit(p_truth), truth).otherwise(1 - truth)
    g = df.select(
        *group_cols, truth.alias("_t"), reported.alias("_r")
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_r").cast("long").alias("reported_yes"),
        F.sum("_t").cast("long").alias("_true_yes"),
    )
    obs = F.col("reported_yes").cast("double") / F.col("n")
    est = (obs - (1.0 - p_truth)) / (2.0 * p_truth - 1.0)
    return g.select(
        *group_cols, "n", "reported_yes",
        F.round(est, 6).alias("est_rate"),
        F.round(F.col("_true_yes").cast("double") / F.col("n"), 6)
        .alias("true_rate"),
    )
