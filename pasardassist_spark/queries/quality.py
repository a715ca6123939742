"""Standing data-quality / reconciliation job (SURVEY.md §2.9 ST6).

Reference behavior being replaced: DataCheckService reconciles DB counts
against the chain's source-of-truth counts on a timer and mails an alert on
divergence (data-check.service.ts:23-60 — orderCount vs getOrderCount(),
tokenCount vs totalSupply()). The Spark rebuild generalizes that to a
one-job suite of declarative checks, each a single aggregate whose result
row is (check, n_violations) — run it on a schedule, alert on any
n_violations > 0.

Check classes covered:
- count reconciliation (the same total derived through two independent
  pipelines must agree — the direct DataCheck analog, with the bronze log
  standing in for the chain RPC as source of truth);
- referential integrity (child rows without parents — the condition that
  makes the reference enqueue retry ops, sub-tasks.service.ts:122-174);
- key uniqueness (idempotent-upsert invariant, db.service.ts:154-160);
- domain invariants (value ranges, derived-column consistency).

All checks compose into ONE DataFrame via unionByName so the whole suite is
a single action; each branch is an independent aggregate that Catalyst
prunes to the columns it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


def _check(name: str, df: DataFrame, violations: F.Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"), violations.cast("long").alias("n_violations")
    )


@query(
    "dq_quality_checks",
    oracle="""
    SELECT 'orders_missing_customer' AS check,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_missing_order',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey IS NULL
    UNION ALL
    SELECT 'events_duplicate_ids',
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_nchars_mismatch',
           CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'rollup_count_reconciliation',
           CAST(abs(
               (SELECT COUNT(*) FROM events)
               - (SELECT SUM(n) FROM (
                      SELECT COUNT(*) AS n FROM events
                      GROUP BY date_trunc('day', ts)))
           ) AS BIGINT)
    """,
)
def dq_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: the full check suite as one unioned DataFrame. The
    rollup_count_reconciliation branch is the DataCheck analog: the total
    event count recomputed through a DIFFERENT pipeline (the daily-rollup
    gold aggregation) must match the direct bronze count — a divergence
    means the rollup drops or duplicates rows (null timestamps, bad window
    bounds), exactly the class of silent sync drift the reference mailed
    alerts about. (A deployed job compares the PERSISTED gold table via
    read_state; the in-job recompute is the sf-parquet stand-in.)"""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    documents = load(spark, sf_dir, "documents")

    rollup_total = (
        events.groupBy(F.date_trunc("day", F.col("ts")))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n").alias("n"))
    )
    direct_total = events.agg(F.count(F.lit(1)).alias("m"))

    checks = [
        _check(
            "orders_missing_customer",
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ),
            F.count(F.lit(1)),
        ),
        _check(
            "lineitem_missing_order",
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"),
            F.count(F.lit(1)),
        ),
        _check(
            "events_duplicate_ids",
            events,
            F.count(F.lit(1)) - F.countDistinct("event_id"),
        ),
        _check(
            "documents_nchars_mismatch",
            documents,
            F.sum(
                F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
            ),
        ),
        _check(
            "lineitem_discount_range",
            lineitem,
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                ).otherwise(0)
            ),
        ),
        direct_total.crossJoin(rollup_total).select(
            F.lit("rollup_count_reconciliation").alias("check"),
            F.abs(F.col("m") - F.col("n")).cast("long").alias("n_violations"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ----------------------------------------------------- Benford first-digit

import math as _math

# expected Benford probabilities log10(1 + 1/d), inlined as LITERALS into
# BOTH engines' expressions so no log() builtin divergence can exist
BENFORD_P = {d: round(_math.log10(1 + 1 / d), 12) for d in range(1, 10)}
# chi-square critical value, dof=8, alpha=0.05
BENFORD_CHI2_CRIT = 15.507


def _benford_oracle() -> str:
    exp_case = " ".join(
        f"WHEN {d} THEN {BENFORD_P[d]}" for d in range(1, 10)
    )
    return f"""
    WITH digits AS (
        SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]')
                    AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    g AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
        GROUP BY digit
    ),
    m AS (
        SELECT digit, n_obs,
               SUM(n_obs) OVER () AS n_total,
               CASE digit {exp_case} END AS p_exp
        FROM g
    ),
    t AS (
        SELECT digit, n_obs, n_total, p_exp,
               (CAST(n_obs AS DOUBLE) / n_total - p_exp)
               * (CAST(n_obs AS DOUBLE) / n_total - p_exp)
               / p_exp * n_total AS term
        FROM m
    )
    SELECT digit, n_obs,
           round(CAST(n_obs AS DOUBLE) / n_total, 6) AS p_obs,
           p_exp,
           round(SUM(term) OVER (), 6) AS chi2,
           round(SUM(term) OVER (), 6) > {BENFORD_CHI2_CRIT} AS deviates
    FROM t
    """


@query("dq_benford_test", oracle=_benford_oracle())
def dq_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the standard
    fabricated-data / broken-upstream detector for financial measures
    (synthetic generators and truncated feeds rarely reproduce the
    log-uniform leading-digit law). First significant digit is extracted
    from the DECIMAL's string form (never via log10/floor, whose IEEE
    edge at exact powers of ten misclassifies 1000.00); expected
    probabilities are PRECOMPUTED literals shared with the oracle so no
    log() builtin divergence exists; counts stay integer to the 9-row
    edge. chi2 folds 9 terms in a full-frame window — double order
    wiggle ~1e-15, absorbed by the 6-dp rounding (the stat_chi2 /
    pagerank convention)."""
    from pyspark.sql import Window as W

    d = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.regexp_extract(
                F.col("o_totalprice").cast("string"), "[1-9]", 0
            ).cast("long").alias("digit")
        )
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    w = W.partitionBy()
    exp_col = F.lit(None).cast("double")
    for dg in range(9, 0, -1):
        exp_col = F.when(F.col("digit") == dg, F.lit(BENFORD_P[dg])).otherwise(
            exp_col
        )
    m = g.select(
        "digit", "n_obs",
        F.sum("n_obs").over(w).alias("n_total"),
        exp_col.alias("p_exp"),
    )
    p_obs = F.col("n_obs").cast("double") / F.col("n_total")
    term = (p_obs - F.col("p_exp")) * (p_obs - F.col("p_exp")) / F.col(
        "p_exp"
    ) * F.col("n_total")
    t = m.select("digit", "n_obs", "n_total", "p_exp", term.alias("term"))
    chi2 = F.round(F.sum("term").over(w), 6)
    return t.select(
        "digit", "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6).alias(
            "p_obs"
        ),
        "p_exp",
        chi2.alias("chi2"),
        (chi2 > BENFORD_CHI2_CRIT).alias("deviates"),
    )


# ----------------------------------------------- table checksum manifest

DQ_CK_BUCKETS = 64


@query(
    "dq_table_checksum",
    oracle=f"""
    WITH canon AS (
        SELECT o_orderkey % {DQ_CK_BUCKETS} AS bucket,
               ('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || CAST(o_custkey AS VARCHAR) || '|'
                   || o_orderstatus || '|'
                   || CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS VARCHAR) || '|'
                   || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|'
                   || o_orderpriority
               ), 1, 15))::BIGINT AS h
        FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS checksum
    FROM canon GROUP BY bucket
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table-integrity manifest — the replication/
    migration audit a lake runs to prove two copies of a table are
    row-identical WITHOUT shipping rows: every row canonicalizes to a
    pipe-joined string (money as exact cents, timestamps at second
    grain), hashes to a 60-bit md5 prefix, and each of {DQ_CK_BUCKETS}
    key buckets reports (count, XOR of hashes).  XOR is commutative and
    overflow-free, so the digest is independent of row order, partition
    count, and engine — the identical manifest computed by ANY engine
    on ANY cluster matches iff the row multisets match (up to md5
    collisions).  Comparing two 64-row manifests localizes drift to a
    bucket, turning "diff 100 TB" into "rescan 1/{DQ_CK_BUCKETS}".

    Spark plan: one scan, all canonicalization + hashing inside one
    WholeStageCodegen span, ONE shuffle to the {DQ_CK_BUCKETS}-row
    aggregate.  The oracle replays the identical string/hash chain, so
    a hash match certifies cross-engine canonical-form agreement — the
    property the audit depends on."""
    o = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    h = F.expr(
        "CAST(conv(substring(md5(_canon), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        o.select((F.col("o_orderkey") % DQ_CK_BUCKETS).alias("bucket"),
                 canon.alias("_canon"))
        .select("bucket", h.alias("h"))
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("checksum"),
        )
    )
