"""Experimentation & behavioral analytics: A/B two-proportion z-test,
CUPED variance reduction, Markov next-event transitions, RFM segments.

The reference exposes raw per-account dashboards (reference
src/modules/app/app.service.ts:232-339) and leaves comparison analytics
to clients; a training-data/product pipeline at 100 TB needs the
experiment readouts computed engine-side, from grouped exact sums, in a
constant number of shuffles.

Determinism contracts shared with the DuckDB oracles:
- unit->variant assignment is the first-16-bits-of-md5 hash gate
  (queries/sampling.py convention) — stable under any partitioning and
  identical across engines;
- every statistic derives from integer counts and exact decimal sums;
  doubles appear only in the final formula, written as the same
  expression tree on both sides, rounded to 6 dp.

Scale notes: each query is one fact-table shuffle to its unit grain
(customer / user / (src,dst) pair), then constant-size follow-up
aggregates; the global 1-row reductions broadcast back onto the tiny
grouped frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pasardassist_spark.functions.money import dec2
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


def _variant_col(key: str):
    """'A'/'B' from the low bit of the first md5 hex digit of the key."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 1), 16, 10)
    return F.when(h.cast("long") % 2 == 0, "A").otherwise("B")


def _variant_sql(key: str) -> str:
    return (
        f"CASE WHEN (instr('0123456789abcdef', "
        f"substr(md5(CAST({key} AS VARCHAR)), 1, 1)) - 1) % 2 = 0 "
        f"THEN 'A' ELSE 'B' END"
    )


@query(
    "ab_proportion_ztest",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey, {_variant_sql('c_custkey')} AS variant
        FROM customer
    ),
    conv AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderpriority = '1-URGENT'),
    j AS (
        SELECT c.variant,
               CASE WHEN conv.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS cv
        FROM c LEFT JOIN conv ON c.c_custkey = conv.o_custkey
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN variant = 'A' THEN cv ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN cv ELSE 0 END) AS BIGINT) AS conv_b
        FROM j
    ),
    rates AS (
        SELECT n_a, n_b, conv_a, conv_b,
               CAST(conv_a AS DOUBLE) / n_a AS pa,
               CAST(conv_b AS DOUBLE) / n_b AS pb,
               CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp
        FROM agg
    ),
    zs AS (
        SELECT n_a, n_b, conv_a, conv_b, pa, pb,
               CASE WHEN pp * (1.0 - pp) > 0.0 THEN
                   (pa - pb) /
                   sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))
               END AS z
        FROM rates
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(pa, 6) AS rate_a,
           round(pb, 6) AS rate_b,
           round(z, 6) AS z_stat,
           COALESCE(abs(z) > 1.96, FALSE) AS significant
    FROM zs
    """,
)
def ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout: customers hash-split into A/B, a
    unit converts if it placed any order. One row: per-variant exposure
    and conversion counts, rates, the pooled-variance z statistic, and
    the |z| > 1.96 significance flag. The conversion flag comes from a
    semi-join-shaped LEFT JOIN against DISTINCT converters (one shuffle
    at the unit grain), then a single-row conditional aggregate."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", _variant_col("c_custkey").alias("variant")
    )
    conv = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    j = cust.join(conv, cust.c_custkey == conv.o_custkey, "left").select(
        "variant",
        F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("cv"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("cv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("cv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    rates = agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        pa.alias("pa"), pb.alias("pb"), pp.alias("pp"),
    )
    # degenerate designs (pp of 0 or 1 -> zero pooled variance) yield a
    # NULL z rather than an ANSI divide-by-zero
    z_guard = F.col("pp") * (F.lit(1.0) - F.col("pp")) > 0.0
    z = F.when(
        z_guard,
        (F.col("pa") - F.col("pb"))
        / F.sqrt(
            F.col("pp")
            * (F.lit(1.0) - F.col("pp"))
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
    )
    zs = rates.select(
        "n_a", "n_b", "conv_a", "conv_b", "pa", "pb", z.alias("z")
    )
    return zs.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.round("pa", 6).alias("rate_a"),
        F.round("pb", 6).alias("rate_b"),
        F.round("z", 6).alias("z_stat"),
        F.coalesce(F.abs("z") > 1.96, F.lit(False)).alias("significant"),
    )


_CUPED_CUTOFF = "1998-01-01"


@query(
    "ab_cuped_adjust",
    oracle=f"""
    WITH per_unit AS (
        SELECT c.c_custkey,
               {_variant_sql('c.c_custkey')} AS variant,
               CAST(COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_CUPED_CUTOFF} 00:00:00'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DECIMAL(18,2)) AS x,
               CAST(COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_CUPED_CUTOFF} 00:00:00'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DECIMAL(18,2)) AS y
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    g AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy,
               SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx
        FROM per_unit
    ),
    v AS (
        SELECT variant, COUNT(*) AS n_units,
               SUM(x) AS sxv, SUM(y) AS syv
        FROM per_unit GROUP BY 1
    ),
    t AS (
        SELECT CASE WHEN (CAST(sxx AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) > 0.0
                    THEN (CAST(sxy AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
                         (CAST(sxx AS DOUBLE) -
                          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                    ELSE 0.0 END AS theta,
               CAST(sx AS DOUBLE) / n AS mean_x_all
        FROM g
    )
    SELECT v.variant, v.n_units,
           round(CAST(v.syv AS DOUBLE) / v.n_units, 6) AS mean_metric,
           round(CAST(v.syv AS DOUBLE) / v.n_units -
                 t.theta * (CAST(v.sxv AS DOUBLE) / v.n_units -
                            t.mean_x_all), 6) AS mean_adjusted,
           round(t.theta, 6) AS theta
    FROM v CROSS JOIN t
    """,
)
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): the
    pre-period spend X (orders before 1998-01-01) is the covariate for the
    experiment metric Y (spend after); theta = cov(X,Y)/var(X) fitted on
    ALL units, and each variant's mean Y is shifted by
    -theta * (mean_x_variant - mean_x_all). Adjustment is linear, so
    variant means adjust from group sums alone — no per-row second pass.
    cov/var come from exact decimal sums (sum x, sum y, sum xy, sum x^2)
    accumulated in ONE customer-grain shuffle; the 1-row theta frame
    cross-joins (broadcast) onto the 2-row variant frame."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", _variant_col("c_custkey").alias("variant")
    )
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    per_unit = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "variant")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("o_orderdate") < cutoff, dec2("o_totalprice"))
                ),
                F.lit(0),
            )
            .cast("decimal(18,2)")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= cutoff, dec2("o_totalprice")
                    )
                ),
                F.lit(0),
            )
            .cast("decimal(18,2)")
            .alias("y"),
        )
    )
    xx = (F.col("x") * F.col("x")).cast("decimal(38,4)")
    xy = (F.col("x") * F.col("y")).cast("decimal(38,4)")
    g = per_unit.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xy).alias("sxy"),
        F.sum(xx).alias("sxx"),
    )
    varx = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
    )
    theta = F.when(
        varx > 0.0,
        (
            F.col("sxy").cast("double")
            - F.col("sx").cast("double")
            * F.col("sy").cast("double")
            / F.col("n")
        )
        / varx,
    ).otherwise(0.0)
    t = g.select(
        theta.alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("mean_x_all"),
    )
    v = per_unit.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("x").alias("sxv"),
        F.sum("y").alias("syv"),
    )
    mean_y = F.col("syv").cast("double") / F.col("n_units")
    mean_xv = F.col("sxv").cast("double") / F.col("n_units")
    return v.crossJoin(F.broadcast(t)).select(
        "variant",
        "n_units",
        F.round(mean_y, 6).alias("mean_metric"),
        F.round(
            mean_y - F.col("theta") * (mean_xv - F.col("mean_x_all")), 6
        ).alias("mean_adjusted"),
        F.round("theta", 6).alias("theta"),
    )


_TOP_TRANSITIONS = 5


@query(
    "path_transitions",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
    ),
    pairs AS (
        SELECT src, dst, COUNT(*) AS n
        FROM seq WHERE dst IS NOT NULL
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT src, dst, n,
               CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS total,
               ROW_NUMBER() OVER (
                   PARTITION BY src ORDER BY n DESC, dst
               ) AS rk
        FROM pairs
    )
    SELECT src, dst, n,
           round(CAST(n AS DOUBLE) / total, 6) AS p
    FROM ranked WHERE rk <= {_TOP_TRANSITIONS}
    """,
)
def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over per-user event sequences:
    LEAD() pairs consecutive events (one shuffle on user_id), the pair
    counts reduce to the |types|^2 grain, and each source keeps its top-5
    next events with transition probability. The second window runs over
    the tiny pair table, so at 100 TB the cost is the one user-keyed
    exchange the sequence construction genuinely requires."""
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w_seq).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("src")
    w_rank = Window.partitionBy("src").orderBy(
        F.col("n").desc(), F.col("dst")
    )
    return (
        pairs.select(
            "src",
            "dst",
            "n",
            F.sum("n").over(w_tot).cast("long").alias("total"),
            F.row_number().over(w_rank).alias("rk"),
        )
        .filter(F.col("rk") <= _TOP_TRANSITIONS)
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
        )
    )


_RFM_ANCHOR = "2001-12-31"


@query(
    "rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '{_RFM_ANCHOR}') AS r_days,
               COUNT(*) AS f_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_total
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT o_custkey, r_days, f_orders, m_total,
               NTILE(5) OVER (ORDER BY r_days, o_custkey) AS r,
               NTILE(5) OVER (ORDER BY f_orders DESC, o_custkey) AS f,
               NTILE(5) OVER (ORDER BY m_total DESC, o_custkey) AS m
        FROM per_cust
    )
    SELECT r, f, m,
           COUNT(*) AS n_customers,
           CAST(SUM(m_total) AS DOUBLE) AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order at a
    fixed anchor), frequency, and exact-decimal monetary total, each
    quintiled over a TOTAL order (metric + custkey tiebreak, so the
    tiling is deterministic across engines and reruns), then rolled up
    to the 125-cell segment grid.

    r16: the tiling strategy is picked by the MEASURED customer count
    (the count is needed for the tile arithmetic anyway). Below
    packing.SINGLE_SORT_MAX_ROWS the plain ordered windows win (the
    two-phase shape costs ~4 s of fixed jobs at sf0.1 vs 0.8 s total —
    BASELINE.md round-16 re-anchor note); above it the three NTILEs run
    as DISTRIBUTED row numbers (packing.distributed_row_number —
    range-bucketed windows + broadcast offsets; descending metrics
    bucket by the negated key) with the tile computed arithmetically
    (ntile_from_rank, value-identical to SQL NTILE — differentially
    pinned), so the customer grain — billions of units at 100 TB —
    never funnels through one task. Both branches are value-identical;
    the oracle hash certifies whichever runs."""
    from pasardassist_spark.operators.packing import (
        SINGLE_SORT_MAX_ROWS,
        distributed_row_number,
        ntile_from_rank,
    )

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("r_days"),
        F.count(F.lit(1)).alias("f_orders"),
        F.sum(dec2("o_totalprice")).alias("m_total"),
    ).persist()
    n = per_cust.count()  # persisted-frame action; also the NTILE total
    if n <= SINGLE_SORT_MAX_ROWS:
        scored = per_cust.select(
            "m_total",
            F.ntile(5).over(Window.orderBy("r_days", "o_custkey")).alias("r"),
            F.ntile(5)
            .over(Window.orderBy(F.col("f_orders").desc(), "o_custkey"))
            .alias("f"),
            F.ntile(5)
            .over(Window.orderBy(F.col("m_total").desc(), "o_custkey"))
            .alias("m"),
        )
    else:
        # one combined bounds pass over the PERSISTED customer frame —
        # without it each rank pass would run its own min/max action over
        # a lineage stacking the previous passes' shuffles
        keys = {
            "_rk_r": (F.col("r_days"), ["r_days", "o_custkey"]),
            "_rk_f": (-F.col("f_orders"),
                      [F.col("f_orders").desc(), F.col("o_custkey")]),
            "_rk_m": (-F.col("m_total").cast("double"),
                      [F.col("m_total").desc(), F.col("o_custkey")]),
        }
        b = per_cust.agg(
            *[f(k.cast("double")) for k, _ in keys.values()
              for f in (F.min, F.max)]
        ).first()
        ranked = per_cust
        for i, (out_col, (bk, order)) in enumerate(keys.items()):
            ranked = distributed_row_number(
                ranked, bk, order, out=out_col,
                bounds=(float(b[2 * i]), float(b[2 * i + 1])),
            )
        n_lit = F.lit(n).cast("long")
        scored = ranked.select(
            "m_total",
            ntile_from_rank(F.col("_rk_r"), n_lit, 5).alias("r"),
            ntile_from_rank(F.col("_rk_f"), n_lit, 5).alias("f"),
            ntile_from_rank(F.col("_rk_m"), n_lit, 5).alias("m"),
        )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m_total").cast("double").alias("segment_value"),
    )


_PATH_TOP = 10


@query(
    "path_ngrams",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS a,
               LEAD(event_type, 1) OVER w AS b,
               LEAD(event_type, 2) OVER w AS c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n
        FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
        GROUP BY 1
    )
    SELECT path, n FROM paths
    ORDER BY n DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def path_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PATH_TOP} 3-step behavioral paths (the sankey/flow readout):
    two LEADs over the same per-user window build each length-3 sequence
    in ONE user-keyed exchange — the window is reused, not re-shuffled —
    and the path counts reduce to at most |types|^3 rows before the
    TakeOrdered top-k. Deterministic total order (count desc, path asc)
    keeps the LIMIT stable across engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    return (
        seq.filter(F.col("b").isNotNull() & F.col("c").isNotNull())
        .select(
            F.concat_ws(">", "a", "b", "c").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOP)
    )
