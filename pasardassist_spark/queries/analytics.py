"""Event/product analytics operator family: funnel, cohort retention,
heavy hitters (exact + mergeable sketch), histogram, hopping windows,
snapshot CDC diff, grouping sets.

These extend the reference's dashboard aggregations (SURVEY.md §2.4 — the
collection/wallet stat jobs in app.service.ts:1463-1559) with the standard
product-analytics shapes a lake engine is expected to serve from the same
events table. Every query is one-or-two-shuffle by construction and keyed
so the shuffle key is the natural partition key at 100 TB (user_id for the
per-user folds, the grouping key for the rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


# ---------------------------------------------------------------------------
# Funnel: view -> click -> purchase, ordered per user.
# ---------------------------------------------------------------------------
@query(
    "funnel_conversion",
    oracle="""
    WITH p1 AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), p2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM p1
    ), p3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM p2
    ), u AS (
        SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
        FROM p3 GROUP BY user_id
    )
    SELECT 'view' AS stage, 1 AS stage_ord,
           count(*) FILTER (WHERE t1 IS NOT NULL) AS users FROM u
    UNION ALL
    SELECT 'click', 2, count(*) FILTER (WHERE t2 IS NOT NULL) FROM u
    UNION ALL
    SELECT 'purchase', 3, count(*) FILTER (WHERE t3 IS NOT NULL) FROM u
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user converts a stage
    only with an event strictly after their entry to the previous stage.

    Spark plan: three unbounded windows over the SAME partitioning
    (user_id) — Catalyst plans ONE Exchange and chains the Window nodes,
    so the whole staged fold costs a single shuffle keyed by user; the
    final 3-row stage table is a metadata-size global aggregate. No
    sequence-explosion self-join (the naive funnel join is events^3)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    et, ts = F.col("event_type"), F.col("ts")
    d = (
        ev.withColumn("t1", F.min(F.when(et == "view", ts)).over(w))
        .withColumn(
            "t2", F.min(F.when((et == "click") & (ts > F.col("t1")), ts)).over(w)
        )
        .withColumn(
            "t3", F.min(F.when((et == "purchase") & (ts > F.col("t2")), ts)).over(w)
        )
    )
    u = d.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    row = u.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    return row.selectExpr(
        "stack(3, 'view', 1, c1, 'click', 2, c2, 'purchase', 3, c3)"
        " AS (stage, stage_ord, users)"
    )


# ---------------------------------------------------------------------------
# Cohort retention: weekly signup cohorts x weeks-since-cohort activity.
# ---------------------------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               date_trunc('week', ts) AS week,
               min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
        FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
           count(DISTINCT user_id) AS users
    FROM act GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the ISO week of
    their first event, counted in each subsequent week they were active.

    Spark plan: one window over user_id computes the cohort week (min of
    the per-event week — identical to the week of the min ts since
    date_trunc is monotone), DISTINCT collapses to user-weeks, then one
    small rollup on (cohort_week, offset). Two shuffles total; the first
    is keyed by user_id, which is how a 100 TB events table is already
    bucketed for every other per-user job here."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("week"))
        .withColumn("cohort_week", F.min("week").over(w))
        .distinct()
    )
    return act.groupBy(
        "cohort_week",
        (F.floor(F.datediff("week", "cohort_week") / 7))
        .cast("int")
        .alias("week_offset"),
    ).agg(F.count_distinct("user_id").alias("users"))


# ---------------------------------------------------------------------------
# Heavy hitters — exact (share threshold) and Misra-Gries sketch.
# ---------------------------------------------------------------------------
@query(
    "hh_heavy_hitters",
    oracle="""
    WITH counts AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ), tot AS (
        SELECT sum(cnt) AS total, count(*) AS n_keys FROM counts
    )
    SELECT user_id, cnt, round(CAST(cnt AS DOUBLE) / total, 6) AS share
    FROM counts, tot
    WHERE 5 * cnt * n_keys > 6 * total
    """,
)
def hh_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: keys whose event count exceeds 1.2x their fair
    share (cnt > 1.2 * total / n_keys, kept in integer arithmetic as
    5*cnt*n_keys > 6*total so the cut is float-free and engine-exact).

    Spark plan: ONE shuffle (the per-key count, map-side partial); the
    total/n_keys scalar frame is a broadcast crossJoin, so the threshold
    filter is map-local. Self-normalizing across scale factors."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .where(5 * F.col("cnt") * F.col("n_keys") > 6 * F.col("total"))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        )
    )


SKETCH_CAPACITY = 64


def space_saving_topk(
    df: DataFrame, key_col: str, capacity: int = SKETCH_CAPACITY
) -> DataFrame:
    """Misra-Gries/Space-Saving heavy-hitter sketch, distributed.

    Phase 1 (mapInPandas): each input partition folds its rows through a
    capacity-bounded Misra-Gries summary — a dict of at most ``capacity``
    keys; on overflow every counter is decremented (the classic MG step),
    so a partition with n_p rows emits counts that under-estimate true
    partition counts by at most n_p/capacity. Phase 2: the per-partition
    summaries (at most capacity rows each — KB-scale regardless of data
    size) are summed per key. Merged MG summaries keep the MG guarantee:
    any key with true global count > n/capacity is present, and
    est <= true <= est + n/capacity.

    At 100 TB this is the only viable exact-top-k replacement: state is
    O(partitions * capacity) rows into the final tiny shuffle, versus the
    exact path's full per-key count shuffle."""
    import pandas as pd

    schema = f"{key_col} long, est long"

    def fold(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            for k in pdf[key_col].to_numpy():
                k = int(k)
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "est": list(counters.values())}
        )

    summaries = df.select(key_col).mapInPandas(fold, schema=schema)
    return summaries.groupBy(key_col).agg(F.sum("est").alias("est"))


# hh_space_saving's verification key: a deterministic re-key with
# SCALE-INVARIANT heavy shares (user_id is near-uniform at sf >= 0.01, so
# no raw key is guaranteed-heavy at capacity 64 there) — every third
# user's events collapse onto user_id % 7, giving 7 keys ~1/21 of all
# events each (plus any raw key that happens to clear the bar, e.g. at
# sf0.001); everything else keeps its own key, far below n/capacity.
def _hh_ss_key():
    return F.when(
        F.col("user_id") % 3 == 0, F.col("user_id") % 7
    ).otherwise(F.col("user_id"))


_HH_SS_KEY_SQL = (
    "CASE WHEN user_id % 3 = 0 THEN user_id % 7 ELSE user_id END"
)


@query(
    "hh_space_saving",
    oracle=f"""
    WITH k AS (SELECT {_HH_SS_KEY_SQL} AS hot_key FROM events),
    c AS (SELECT hot_key, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM k GROUP BY hot_key)
    SELECT hot_key, cnt, TRUE AS in_sketch, TRUE AS bounds_ok
    FROM c WHERE cnt * {SKETCH_CAPACITY} > (SELECT COUNT(*) FROM k)
    """,
)
def hh_space_saving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries space-saving sketch, ORACLE-GATED on its published
    guarantee (r17 VERDICT #2): every key with true count > n/capacity
    MUST appear in the merged summary with
    `est <= true <= est + n/capacity` (per-partition undercounts sum to
    at most n/capacity). The query runs the sketch over a deterministic
    skewed re-key (_hh_ss_key above — 7 keys at ~1/21 of all events, so
    the guaranteed-heavy set is non-empty at EVERY test SF), joins it to
    the exact counts, and emits the guaranteed-heavy keys with their
    exact counts plus the two guarantee booleans — all of which a SQL
    oracle pins exactly. The raw sketch output stays the production form
    (space_saving_topk above; containment + bound also pytest-asserted
    in tests/test_operators.py)."""
    ev = load(spark, sf_dir, "events").select(
        _hh_ss_key().cast("long").alias("hot_key")
    )
    sketch = space_saving_topk(ev, "hot_key")
    exact = ev.groupBy("hot_key").agg(F.count(F.lit(1)).alias("cnt"))
    tot = ev.agg(F.count(F.lit(1)).alias("_n"))
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * SKETCH_CAPACITY > F.col("_n"))
        .join(sketch, "hot_key", "left")
        .select(
            "hot_key",
            "cnt",
            F.col("est").isNotNull().alias("in_sketch"),
            F.coalesce(
                (F.col("est") <= F.col("cnt"))
                & (
                    F.col("cnt")
                    <= F.col("est") + F.col("_n") / SKETCH_CAPACITY
                ),
                F.lit(False),  # a dropped key fails the gate loudly
            ).alias("bounds_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram.
# ---------------------------------------------------------------------------
@query(
    "hist_value_buckets",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS INT) AS bucket,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def hist_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram (bucket width 25): the one-shuffle
    map-side-combinable distribution profile (the reference computes
    price-range facets the same way, app.service.ts marketplace facets).
    Bucket ids are computed with the identical floor expression on both
    engines; sums are decimal-exact so partial-agg order is irrelevant."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) window rollup.
# ---------------------------------------------------------------------------
@query(
    "hop_window_rollup",
    oracle="""
    SELECT ws, event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events,
         unnest(generate_series(date_trunc('day', ts) - INTERVAL 6 DAY,
                                date_trunc('day', ts),
                                INTERVAL 1 DAY)) AS t(ws)
    GROUP BY 1, 2
    """,
)
def hop_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day window hopping by 1 day, per event type — the trailing-week
    dashboard series (reference: the 'last 7 days volume' stat refreshed
    daily). Spark's built-in window() assigns each event to its 7
    overlapping epoch-aligned windows JVM-side (a generator, not a join);
    the oracle mirrors the same day-aligned starts with generate_series.
    One shuffle on (window, event_type); decimal-exact sums. The same
    expression runs unchanged under readStream with a watermark — tested
    in tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff.
# ---------------------------------------------------------------------------
_SNAP_A_SQL = (
    "SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price"
    " FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'"
)
_SNAP_B_SQL = (
    "SELECT o_orderkey,"
    " CAST(CASE WHEN o_orderstatus = 'O'"
    "      THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2"
    "      ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DECIMAL(18,2)) AS price"
    " FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
    " AND o_orderdate < TIMESTAMP '1999-01-01'"
)


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH a AS ({_SNAP_A_SQL}), b AS ({_SNAP_B_SQL})
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           CAST(a.price AS DOUBLE) AS old_price,
           CAST(b.price AS DOUBLE) AS new_price
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price <> b.price
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: full-outer join on
    the primary key, rows classified added/removed/changed (unchanged rows
    are dropped — the delta is the product). The snapshots here are two
    deterministic views of `orders` (a date-windowed 'old' vs a shifted
    window with open orders repriced), so both engines derive identical
    inputs from the shared parquet.

    Scale: the join is key-partitioned on the PK — with both snapshots
    bucketed by PK (sources/lake.py layout) it is Exchange-free; the
    unchanged-row filter drops the bulk of the data before any
    materialization. This is the generational silver store's diff
    (streaming/generations.py) expressed as a batch operator."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    a = o.where(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey", price.alias("price")
    )
    b = (
        o.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1999-01-01")
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "O", (price * 2))
            .otherwise(price)
            .cast("decimal(18,2)")
            .alias("price"),
        )
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    ak, bk = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    return j.where(
        ak.isNull() | bk.isNull() | (F.col("a.price") != F.col("b.price"))
    ).select(
        F.coalesce(ak, bk).alias("o_orderkey"),
        F.when(ak.isNull(), "added")
        .when(bk.isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        F.col("a.price").cast("double").alias("old_price"),
        F.col("b.price").cast("double").alias("new_price"),
    )


# ---------------------------------------------------------------------------
# Grouping sets rollup.
# ---------------------------------------------------------------------------
@query(
    "gs_customer_rollup",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           CASE WHEN r_name IS NULL THEN 2
                WHEN n_name IS NULL THEN 1 ELSE 0 END AS lvl,
           count(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def gs_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup in one pass: (region, nation), (region),
    and grand total via GROUPING SETS — three dashboard tables from one
    shuffle instead of three jobs (the reference runs separate Mongo
    aggregations per granularity, app.service.ts:1463-1559). The level
    column is derived from the null pattern (dimension values are
    never null in this schema), which keeps the SQL portable instead of
    engine-specific GROUPING_ID encodings. Dimension joins are broadcasts
    (nation=25, region=5 rows)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    import uuid

    # uuid-suffixed name: Python str hashing is process-salted, and two
    # threads sharing one session could collide on a pid+hash name between
    # createOrReplaceTempView and spark.sql.
    view = f"gs_cust_joined_{uuid.uuid4().hex}"
    joined.createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT r_name AS region, n_name AS nation,
               CASE WHEN r_name IS NULL THEN 2
                    WHEN n_name IS NULL THEN 1 ELSE 0 END AS lvl,
               count(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        FROM {view}
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )
    # spark.sql analyzes eagerly, so the resolved plan no longer needs the
    # view — drop it to keep the catalog clean across repeated calls.
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# Incremental distinct maintenance via mergeable HLL sketches.
# ---------------------------------------------------------------------------
def hll_weekly_estimates(ev: DataFrame) -> DataFrame:
    """The raw 100 TB operator: per-DAY HyperLogLog sketches
    (Datasketches HLL, lgConfigK=12) merged into per-week user estimates
    with hll_union_agg — the pre-aggregated-distinct lake pattern. At
    100 TB the daily sketch table is the standing gold artifact (O(days)
    rows x ~2.5 KB); each new day appends ONE sketch row and every
    re-aggregation window (week, month, all-time) is a metadata-scale
    merge — history is never rescanned, which an exact count_distinct
    can never avoid."""
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.groupBy(F.date_trunc("week", "day").alias("week")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "hll_user_rollup",
    oracle="""
    SELECT date_trunc('week', ts) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS est_within_tol,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly HLL rollup, ORACLE-GATED (r17 VERDICT #2): register
    contents are engine-specific, but Spark's Datasketches HLL is
    deterministic for fixed data (per-register max; union is a register
    max — order-free), so `|est - exact| <= 10% * exact` at lgK=12
    (rel. SE ~1.6%; observed <2% here) is a deterministic certificate,
    and the exact weekly distinct count is the oracle-checkable payload.
    Production runs the estimate-only raw form (hll_weekly_estimates
    above; the tighter 5% bound and merge-equals-direct mergeability
    stay pytest-pinned in tests/test_operators.py)."""
    ev = load(spark, sf_dir, "events")
    est = hll_weekly_estimates(ev)
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return exact.join(est, "week").select(
        "week",
        "n_users",
        (
            F.abs(F.col("est_users") - F.col("n_users"))
            <= 0.10 * F.col("n_users")
        ).alias("est_within_tol"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Grouped statistical moments.
# ---------------------------------------------------------------------------
@query(
    "stat_moments",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS mean_v,
           round(stddev_samp(value), 6) AS sd_v,
           round(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6)
               AS corr_vk,
           round(covar_samp(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6)
               AS cov_vk
    FROM events GROUP BY event_type
    """,
)
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped second-order statistics in one shuffle: mean, sample
    stddev, and the correlation/covariance of the event value against
    the props.k attribute (the profiling pass every feature pipeline
    runs). All five aggregates partial-merge map-side (Welford-style
    merge states), so the plan is a single hash aggregate regardless of
    group cardinality; 6-dp rounding absorbs the cross-engine
    merge-order float noise (verified exact at sf0.01)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        ev.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean_v"),
            F.round(F.stddev_samp("value"), 6).alias("sd_v"),
            F.round(F.corr("value", "k"), 6).alias("corr_vk"),
            F.round(F.covar_samp("value", "k"), 6).alias("cov_vk"),
        )
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution.
# ---------------------------------------------------------------------------
@query(
    "attr_multi_touch",
    oracle="""
    WITH t AS (
        SELECT user_id u, event_type touch, ts tts FROM events
        WHERE event_type IN ('view', 'click')
    ),
    p AS (
        SELECT user_id u, event_id pid, ts pts FROM events
        WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT touch, pid FROM t JOIN p
        ON t.u = p.u AND tts < pts AND tts >= pts - INTERVAL 7 DAY
    ),
    per AS (SELECT pid, touch, count(*) AS c FROM j GROUP BY pid, touch),
    n AS (SELECT pid, sum(c) AS n FROM per GROUP BY pid)
    SELECT touch, round(sum(c / n), 6) AS credit,
           CAST(count(*) AS BIGINT) AS n_conversions_touched
    FROM per JOIN n USING (pid) GROUP BY touch
    """,
)
def attr_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's unit of credit is
    split equally across ALL the user's view/click touches in the prior
    7 days (the batch complement to the streaming last-touch attribution
    in u3). Credit conservation (Σcredit == attributable purchases) is
    pytested.

    Spark plan: the touch⋈purchase range join is keyed by user — the
    per-user pairing is bounded by the 7-day window, so the join output
    is O(touches-in-window), never user-quadratic over history; the
    per-purchase normalizer is a purchase-keyed aggregate joined back at
    purchase granularity. Three shuffles, all on natural keys (user,
    purchase id, touch type)."""
    ev = load(spark, sf_dir, "events")
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("touch"),
        F.col("ts").alias("tts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    j = t.join(
        p,
        (t.u == p.u)
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
    ).select("touch", "pid")
    per = j.groupBy("pid", "touch").agg(F.count(F.lit(1)).alias("c"))
    n = per.groupBy("pid").agg(F.sum("c").alias("n"))
    return (
        per.join(n, "pid")
        .select("touch", (F.col("c") / F.col("n")).alias("credit"))
        .groupBy("touch")
        .agg(
            F.round(F.sum("credit"), 6).alias("credit"),
            F.count(F.lit(1)).alias("n_conversions_touched"),
        )
    )


# ---------------------------------------------------------------------------
# Running distinct users (exact cumulative distinct via first-seen).
# ---------------------------------------------------------------------------
@query(
    "run_distinct_users",
    oracle="""
    WITH f AS (
        SELECT user_id, min(date_trunc('day', ts)) AS first_day FROM events
        GROUP BY user_id
    ),
    new_per_day AS (
        SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users FROM f
        GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_users
    FROM new_per_day
    """,
)
def run_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact running distinct-user count per day — the growth curve every
    dashboard wants and the aggregation DISTINCT cannot express
    cumulatively. The first-seen trick makes it one pass: distinct users
    up to day d == users whose FIRST event day <= d, so the job is a
    per-user min (user-keyed shuffle), a day rollup of first-seen counts
    (O(days) rows), and a running sum over that metadata-scale frame.
    No day-over-day re-scan, no growing distinct state — the same shape
    maintains incrementally: a new batch can only add first-seen rows."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    per_day = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


# ---------------------------------------------------------------------------
# Equi-depth (quantile) binning.
# ---------------------------------------------------------------------------
@query(
    "hist_equi_depth",
    oracle="""
    WITH cuts AS (
        SELECT round(quantile_cont(value, 0.25), 4) AS c1,
               round(quantile_cont(value, 0.50), 4) AS c2,
               round(quantile_cont(value, 0.75), 4) AS c3
        FROM events
    )
    SELECT CASE WHEN value <= c1 THEN 0 WHEN value <= c2 THEN 1
                WHEN value <= c3 THEN 2 ELSE 3 END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS min_v, max(value) AS max_v
    FROM events CROSS JOIN cuts
    GROUP BY 1
    """,
)
def hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) binning — the ML-prep feature bucketizer:
    exact distributed quartiles (Spark's percentile aggregate; one
    shuffle), cutpoints ROUNDED to 4 dp so the bin edges are portable
    across engines (the data is 2-dp, so rounding can never move a value
    across an edge), then a broadcast of the 1-row cut frame buckets the
    table map-side. Two passes total, the second shuffle-free below its
    final tiny rollup — the shape of every quantile-sketch bucketizer at
    100 TB (swap the exact percentile for approx_percentile when a
    1e-4-rank error is acceptable; a13 benches both)."""
    ev = load(spark, sf_dir, "events")
    cuts = ev.agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("c1"),
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("c2"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("c3"),
    )
    v = F.col("value")
    bucket = (
        F.when(v <= F.col("c1"), 0)
        .when(v <= F.col("c2"), 1)
        .when(v <= F.col("c3"), 2)
        .otherwise(3)
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        )
    )


# ---------------------------------------------------------------------------
# Rank distributions (percent_rank / cume_dist) per group.
# ---------------------------------------------------------------------------
@query(
    "w_rank_distributions",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(4) OVER w AS quartile
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def w_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution window functions per group: percent_rank,
    cume_dist, and quartile ntile over the value ordering — exact
    rational ranks, so cross-engine equality is structural (the ORDER BY
    carries event_id as a total-order tiebreak; ntile depends on row
    order, not value ties). One hash shuffle on event_type; the sort is
    per-partition. Filter narrows to two types so the driver row stays
    bounded."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "signup")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT between two activity periods.
# ---------------------------------------------------------------------------
@query(
    "u4_retention_set_ops",
    oracle="""
    WITH jan AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
    ),
    feb AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-01'
    )
    SELECT 'retained' AS cohort, user_id FROM (
        SELECT user_id FROM jan INTERSECT SELECT user_id FROM feb)
    UNION ALL
    SELECT 'churned', user_id FROM (
        SELECT user_id FROM jan EXCEPT SELECT user_id FROM feb)
    UNION ALL
    SELECT 'new', user_id FROM (
        SELECT user_id FROM feb EXCEPT SELECT user_id FROM jan)
    """,
)
def u4_retention_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True relational set operations (U-family beyond union): the
    retained / churned / new user partition of two activity periods via
    INTERSECT and EXCEPT. Catalyst plans both as aggregates + semi/anti
    joins on the already-distinct user sets — period extraction is one
    user-keyed shuffle each, the set ops run at user-set (not event)
    cardinality."""
    ev = load(spark, sf_dir, "events")
    jan = (
        ev.where((F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-15"))
        .select("user_id")
        .distinct()
    )
    feb = (
        ev.where((F.col("ts") >= "2024-01-15") & (F.col("ts") < "2024-02-01"))
        .select("user_id")
        .distinct()
    )
    lab = lambda name, df: df.select(F.lit(name).alias("cohort"), "user_id")
    return (
        lab("retained", jan.intersect(feb))
        .unionAll(lab("churned", jan.exceptAll(feb).distinct()))
        .unionAll(lab("new", feb.exceptAll(jan).distinct()))
    )


@query(
    "cube_market_rollup",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
           COALESCE(o.o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
    """,
)
def cube_market_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (market segment, order priority): all four grains —
    cell, each one-dimension margin, and the grand total — from ONE
    shuffle (gs_customer_rollup's GROUPING SETS generalized to the
    complete lattice). Spark expands the cube map-side into grouping-id
    tagged partial aggregates, so the exchange carries one row per
    (cell x grain), never a second pass over the facts. Dimension values
    are never null in this schema, so the 'ALL' label derives from the
    null pattern and stays portable SQL."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey)
    return (
        j.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "w3_pareto_share",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment, o_custkey, rev,
               ROW_NUMBER() OVER w AS rk,
               SUM(rev) OVER (
                   PARTITION BY segment ORDER BY rev DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS cum_before,
               SUM(rev) OVER (PARTITION BY segment) AS total,
               COUNT(*) OVER (PARTITION BY segment) AS n
        FROM per_cust
        WINDOW w AS (PARTITION BY segment ORDER BY rev DESC, o_custkey)
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN COALESCE(cum_before, 0) * 5 < total * 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           round(CAST(SUM(CASE WHEN rk * 5 <= n + 4 THEN rev END)
                      AS DOUBLE) /
                 CAST(MAX(total) AS DOUBLE), 6) AS top20_share,
           CAST(MAX(total) AS DOUBLE) AS total_revenue
    FROM ranked GROUP BY segment
    """,
)
def w3_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per market segment: rank customers by exact
    revenue, count how many it takes to cover 80% of the segment
    (n_top80), and what share the top 20% of customers hold
    (top20_share). The 80%/20% thresholds compare SCALED DECIMALS
    (cum*5 < total*4, rank*5 <= n+4) — integer-exact on both engines, no
    float boundary flakes. The windows run over the per-customer
    aggregate (units, not events); that per-segment sort is the honest
    cost of an exact order statistic — at extreme unit counts the same
    readout drops to approx_percentile cutpoints, trading exactness the
    driver compare needs here."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_ord = Window.partitionBy("segment").orderBy(
        F.col("rev").desc(), "o_custkey"
    )
    ranked = per_cust.select(
        "segment",
        "rev",
        F.row_number().over(w_ord).alias("rk"),
        F.sum("rev")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("cum_before"),
        F.sum("rev").over(Window.partitionBy("segment")).alias("total"),
        F.count(F.lit(1))
        .over(Window.partitionBy("segment"))
        .alias("n"),
    )
    return ranked.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum(
            F.when(
                F.coalesce(F.col("cum_before"), F.lit(0)) * 5
                < F.col("total") * 4,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_top80"),
        F.round(
            F.sum(F.when(F.col("rk") * 5 <= F.col("n") + 4, F.col("rev")))
            .cast("double")
            / F.max("total").cast("double"),
            6,
        ).alias("top20_share"),
        F.max("total").cast("double").alias("total_revenue"),
    )


_LR_ANCHOR = "2024-01-01"  # events epoch anchor; x = whole days since


@query(
    "stat_linreg",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '{_LR_ANCHOR}', CAST(ts AS DATE)) AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ),
    g AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               SUM(y) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               SUM(CAST(x * y AS DECIMAL(28,2))) AS sxy,
               SUM(CAST(y * y AS DECIMAL(38,4))) AS syy
        FROM d GROUP BY 1
    ),
    f AS (
        SELECT event_type, n,
               n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
               n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dxy,
               n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM g
    )
    SELECT event_type, n,
           round(CASE WHEN dxx > 0.0 THEN dxy / dxx END, 6) AS slope,
           round(CASE WHEN dxx > 0.0 THEN
               (syd - (dxy / dxx) * sxd) / n END, 6) AS intercept,
           round(CASE WHEN dxx > 0.0 AND dyy > 0.0 THEN
               (dxy * dxy) / (dxx * dyy) END, 6) AS r2
    FROM f
    """,
)
def stat_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS trend fit (value vs days-since-anchor) per event type
    — slope, intercept, r^2 from the five classic sufficient statistics.
    x is an INTEGER day offset and y an exact decimal, so every sum is
    bit-stable under any partial-aggregation order; the normal-equation
    arithmetic runs in doubles only at the 5-row output edge with the
    same expression tree on both engines. One shuffle over the facts —
    the same sufficient-statistics pattern as stat_moments, extended to
    the regression readout a trend dashboard actually wants."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit(_LR_ANCHOR).cast("date")
        ).alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(
            (F.col("x") * F.col("y")).cast("decimal(28,2)")
        ).alias("sxy"),
        F.sum(
            (F.col("y") * F.col("y")).cast("decimal(38,4)")
        ).alias("syy"),
    )
    n = F.col("n")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    f = g.select(
        "event_type",
        "n",
        (n * F.col("sxx").cast("double") - sxd * sxd).alias("dxx"),
        (n * F.col("sxy").cast("double") - sxd * syd).alias("dxy"),
        (n * F.col("syy").cast("double") - syd * syd).alias("dyy"),
        sxd.alias("sxd"),
        syd.alias("syd"),
    )
    dxx, dxy, dyy = F.col("dxx"), F.col("dxy"), F.col("dyy")
    slope = F.when(dxx > 0.0, dxy / dxx)
    return f.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(
                dxx > 0.0,
                (F.col("syd") - (dxy / dxx) * F.col("sxd")) / F.col("n"),
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when((dxx > 0.0) & (dyy > 0.0), (dxy * dxy) / (dxx * dyy)), 6
        ).alias("r2"),
    )


@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           round(MAX(d.med), 6) AS med,
           round(MAX(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN m.mad > 0.0 AND
                              d.adev > 3.0 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median / MAD (median
    absolute deviation) with the 1.4826 normal-consistency factor and a
    3-sigma-equivalent cut. Unlike the rolling z-score (ts_zscore_anomaly)
    this is distribution-global and breakdown-resistant — a 49% corrupt
    tail cannot move the threshold. Two percentile shuffles (median, then
    MAD over deviations) with the 5-row medians broadcast back onto the
    facts; at 100 TB both medians drop to approx_percentile with the
    same plan shape."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.round(F.max("med"), 6).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.sum(
            F.when(
                (F.col("mad") > 0.0)
                & (F.col("adev") > 3.0 * 1.4826 * F.col("mad")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Round-6 additions: conversion-latency distribution, cohort LTV curve,
# per-key event debounce.
# ---------------------------------------------------------------------------

_LAT_WINDOW_US = 7 * 86400 * 1_000_000  # view must precede purchase by <= 7d


@query(
    "funnel_latency",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, event_id, ts, epoch_us(ts) AS us,
               max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_view_us
        FROM events
    ),
    conv AS (
        SELECT date_trunc('month', ts) AS month,
               us - last_view_us AS lat_us
        FROM seq
        WHERE event_type = 'purchase'
          AND last_view_us IS NOT NULL
          AND us - last_view_us <= {_LAT_WINDOW_US}
    )
    SELECT month,
           COUNT(*) AS n_conversions,
           quantile_cont(lat_us, 0.5) AS p50_us,
           quantile_cont(lat_us, 0.9) AS p90_us,
           MAX(lat_us) AS max_us
    FROM conv GROUP BY month
    """,
)
def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: each purchase's latency from the
    user's most recent prior view (7-day lookback), summarized per month
    as exact interpolated percentiles — the "how long does the funnel
    take" complement to funnel_conversion's "how many make it".

    One user-keyed window pairs every purchase with its view (running
    MAX over the ordered per-user sequence — no per-pair join), then one
    month-keyed aggregation. Latencies are exact integer microseconds;
    `percentile` matches quantile_cont interpolation (the proven a13
    pattern)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "event_type",
        "ts",
        us.alias("us"),
        F.max(F.when(F.col("event_type") == "view", us)).over(w).alias(
            "last_view_us"
        ),
    )
    conv = seq.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_us").isNotNull()
        & (F.col("us") - F.col("last_view_us") <= _LAT_WINDOW_US)
    ).select(
        F.date_trunc("month", F.col("ts")).alias("month"),
        (F.col("us") - F.col("last_view_us")).alias("lat_us"),
    )
    return conv.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.expr("percentile(lat_us, 0.5)").alias("p50_us"),
        F.expr("percentile(lat_us, 0.9)").alias("p90_us"),
        F.max("lat_us").alias("max_us"),
    )


@query(
    "cohort_ltv",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               min(ts) AS ft
        FROM events GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id,
               date_trunc('month', ft) AS cohort,
               year(ft) * 12 + month(ft) AS cm
        FROM first_seen
    ),
    sizes AS (SELECT cohort, COUNT(*) AS n_users FROM cohorts GROUP BY cohort),
    rev AS (
        SELECT c.cohort,
               (year(e.ts) * 12 + month(e.ts)) - c.cm AS age_months,
               SUM(CAST(e.value AS DECIMAL(18,2))) AS m_rev
        FROM events e JOIN cohorts c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort, age_months,
               SUM(m_rev) OVER (PARTITION BY cohort ORDER BY age_months
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev
        FROM rev
    )
    SELECT cum.cohort, age_months, n_users,
           CAST(cum_rev AS DOUBLE) AS cum_revenue,
           round(CAST(cum_rev AS DOUBLE) / n_users, 6) AS ltv
    FROM cum JOIN sizes ON sizes.cohort = cum.cohort
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen month,
    purchase revenue accumulated by integer month age, divided by cohort
    size — cohort_retention's revenue twin (the LTV readout growth teams
    plot). Ages are exact (year*12 + month) integer arithmetic in both
    engines (never fractional months_between); revenue folds in exact
    decimals with the cumulative window over the tiny (cohort, age)
    grain; rows exist for ages with revenue (the curve's support).
    Shuffles: first-seen per user, revenue join keyed on user, then the
    cohort-grain rollup."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("ft"))
    cohorts = first_seen.select(
        "user_id",
        F.date_trunc("month", F.col("ft")).alias("cohort"),
        (F.year("ft") * 12 + F.month("ft")).alias("cm"),
    )
    sizes = cohorts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    from pasardassist_spark.functions.money import dec2

    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort",
            ((F.year("ts") * 12 + F.month("ts")) - F.col("cm")).alias(
                "age_months"
            ),
        )
        .agg(F.sum(dec2("value")).alias("m_rev"))
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.select(
        "cohort",
        "age_months",
        F.sum("m_rev").over(wc).alias("cum_rev"),
    )
    return cum.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "age_months",
        "n_users",
        F.col("cum_rev").cast("double").alias("cum_revenue"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("n_users"), 6
        ).alias("ltv"),
    )


# shared with the streaming twin so batch and stream cannot drift
from pasardassist_spark.streaming.debounce import (  # noqa: E402
    DEBOUNCE_GAP_S as _DEBOUNCE_GAP_S,
)


@query(
    "dedup_debounce",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_type, event_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > {_DEBOUNCE_GAP_S} * 1000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS opens
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    bursts AS (
        SELECT *,
               SUM(opens) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS burst
        FROM marked
    )
    SELECT user_id, event_type, event_id, ts, n_suppressed FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type, burst
                                  ORDER BY ts, event_id) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY user_id, event_type, burst)
                    - 1 AS BIGINT) AS n_suppressed
        FROM bursts
    ) WHERE rn = 1
    """,
)
def dedup_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debounce / stream thinning: within each (user, event_type),
    only the event opening a burst survives — a burst extends while
    successive events arrive within 300 s (_DEBOUNCE_GAP_S) of the PREVIOUS
    event (trailing-gap semantics, the alert-dedup rule incident tooling
    applies). Each kept event reports how many it suppressed, so
    downstream counts remain reconstructible. One keyed shuffle; the
    lag -> marker -> running-sum chain reuses a single window order.
    (The other debounce flavor — at most one event per fixed interval
    since the last KEPT one — is a sequential recursion with no window
    form; the sessionization operators document that boundary.)"""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    opens = F.when(
        (us - F.lag(us).over(w) > _DEBOUNCE_GAP_S * 1_000_000)
        | F.lag("ts").over(w).isNull(),
        1,
    ).otherwise(0)
    bursts = ev.select(
        "user_id", "event_type", "event_id", "ts", opens.alias("opens")
    ).withColumn(
        "burst",
        F.sum("opens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # The burst opener is the row that is FIRST in the window order
    # (ts, event_id) — min_by on that tuple, never min(event_id), which
    # would weld another event's id onto the opener's timestamp whenever
    # ids are not monotone with event time.
    return bursts.groupBy("user_id", "event_type", "burst").agg(
        F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
        F.min("ts").alias("ts"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_suppressed"),
    ).drop("burst")


# ------------------------------------------------ survival analysis (KM)

# Users whose last event falls within this many days of the corpus'
# global maximum timestamp are CENSORED (still active at observation
# end), not churned — the standard right-censoring rule.
KM_CENSOR_DAYS = 7


@query(
    "surv_kaplan_meier",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(floor(epoch(max(ts) - min(ts)) / 86400.0) AS BIGINT)
                   AS dur,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
    ),
    g AS (SELECT max(ts) AS gmax FROM events),
    f AS (
        SELECT u.dur,
               epoch(g.gmax - u.last_ts) >= {KM_CENSOR_DAYS} * 86400.0
                   AS churned
        FROM u CROSS JOIN g
    ),
    t AS (
        SELECT dur,
               CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                   AS d,
               CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                   AS c
        FROM f GROUP BY dur
    ),
    r AS (
        SELECT dur, d, c,
               (SELECT COUNT(*) FROM f)
               - COALESCE(SUM(d + c) OVER (
                     ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS n_risk
        FROM t
    )
    SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS d_churn,
           c AS c_censored,
           round(exp(SUM(ln(GREATEST(1.0 - CAST(d AS DOUBLE) / n_risk,
                                     1e-300)))
                     OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)), 6)
               AS survival
    FROM r
    """,
)
def surv_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes: duration = whole days
    between a user's first and last event; users still active in the
    final KM_CENSOR_DAYS days of the corpus are right-CENSORED (they
    leave the risk set without counting as churn — dropping them instead
    is the classic retention-analysis bias this estimator exists to
    fix).  S(t) = prod over event times u <= t of (1 - d_u / n_u), with
    n_u = subjects whose duration >= u.

    Plan: one user-grain aggregate, a 1-row global-max broadcast, a
    duration-grain aggregate (<= observation-window-days rows —
    metadata-scale forever), then the risk-set and product both as
    windows over that tiny frame.  The product runs as exp(sum(ln .))
    with a 1e-300 floor (a 0-survival step underflows to round(.,6)=0
    on both engines); 6-dp rounding absorbs libm ULP skew, the PSI
    precedent."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.floor(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / 86400.0
        ).cast("long").alias("dur"),
        F.max("ts").alias("last_ts"),
    )
    g = ev.agg(F.max("ts").alias("gmax"))
    f = u.crossJoin(F.broadcast(g)).select(
        "dur",
        (
            (F.unix_timestamp("gmax") - F.unix_timestamp("last_ts"))
            >= KM_CENSOR_DAYS * 86400.0
        ).alias("churned"),
    )
    t = f.groupBy("dur").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("long").alias("d"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1))
        .cast("long").alias("c"),
    )
    total = f.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    w_before = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_upto = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = (
        t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_before),
                         F.lit(0)),
        )
    )
    term = F.log(
        F.greatest(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"),
            F.lit(1e-300),
        )
    )
    return r.select(
        F.col("dur").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("d_churn"),
        F.col("c").alias("c_censored"),
        F.round(F.exp(F.sum(term).over(w_upto)), 6).alias("survival"),
    )


# ------------------------------------------------ Gini / Lorenz curve

@query(
    "stat_gini_lorenz",
    oracle="""
    WITH s AS (
        SELECT o_custkey, SUM(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT spend,
               row_number() OVER (ORDER BY spend, o_custkey) AS rk,
               ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
        FROM s
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(spend) AS total,
               SUM(rk * spend) AS weighted
        FROM r
    ),
    dec AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               SUM(spend) AS dec_spend
        FROM r GROUP BY decile
    )
    SELECT CAST(dec.decile AS INTEGER) AS decile, dec.n_cust,
           round(CAST(SUM(dec.dec_spend) OVER (
                     ORDER BY dec.decile ROWS UNBOUNDED PRECEDING)
                 AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
               AS cum_spend_share,
           round((2.0 * CAST(tot.weighted AS DOUBLE)
                  - (tot.n + 1) * CAST(tot.total AS DOUBLE))
                 / (tot.n * CAST(tot.total AS DOUBLE)), 6) AS gini
    FROM dec CROSS JOIN tot
    """,
)
def stat_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Income-inequality lens on customer spend: the exact Gini
    coefficient via the rank formula G = (2*sum(i*x_i) - (n+1)*sum(x))
    / (n*sum(x)) over spend sorted ascending, plus the Lorenz curve at
    deciles (cumulative spend share per NTILE(10) bucket) — the
    concentration readout marketplace analytics put next to top-k
    dashboards.  Rank products stay in exact decimal until the final
    division (functions/money.py discipline); (spend, custkey) total
    order makes row_number and ntile identical on both engines; tie
    order cannot change the formula (equal x contribute the same sum
    over any rank permutation).

    Plan (r16): strategy picked by the MEASURED customer count (needed
    for the NTILE arithmetic anyway). Below packing.SINGLE_SORT_MAX_ROWS
    the plain ordered window wins (fixed two-phase jobs cost more than
    the whole query at sf0.1); above it the global spend rank runs as
    the DISTRIBUTED two-phase row number (bucketed by the spend
    double-cast, which is monotone; exact decimal order within buckets)
    with the decile computed arithmetically (ntile_from_rank,
    value-identical to SQL NTILE) — the customer grain never funnels
    through one task. The ranked frame is persisted either way: the
    totals and the decile rollup share one pass."""
    from pasardassist_spark.operators.packing import (
        SINGLE_SORT_MAX_ROWS,
        distributed_row_number,
        ntile_from_rank,
    )

    s = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    ).persist()
    n_rows = s.count()
    if n_rows <= SINGLE_SORT_MAX_ROWS:
        w = Window.orderBy("spend", "o_custkey")
        r = s.select(
            "spend",
            F.row_number().over(w).alias("rk"),
            F.ntile(10).over(w).alias("decile"),
        ).persist()
    else:
        r = distributed_row_number(
            s, F.col("spend").cast("double"), ["spend", "o_custkey"], out="rk"
        ).select(
            "spend",
            "rk",
            ntile_from_rank(
                F.col("rk"), F.lit(n_rows).cast("long"), 10
            ).alias("decile"),
        ).persist()
    tot = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("spend").alias("total"),
        F.sum(F.col("rk") * F.col("spend")).alias("weighted"),
    )
    dec = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("spend").alias("dec_spend"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_cust",
            F.round(
                F.sum("dec_spend").over(w_cum).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("cum_spend_share"),
            F.round(
                (2.0 * F.col("weighted").cast("double")
                 - (F.col("n") + 1) * F.col("total").cast("double"))
                / (F.col("n") * F.col("total").cast("double")),
                6,
            ).alias("gini"),
        )
    )


# ------------------------------------------------ log-rank test (2 cohorts)

_LR_Z_CRIT = 1.959964  # two-sided 5%, normal approx


@query(
    "surv_logrank_test",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS INTEGER) AS cohort,
               CAST(floor(epoch(max(ts) - min(ts)) / 86400.0) AS BIGINT)
                   AS dur,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
    ),
    g AS (SELECT max(ts) AS gmax FROM events),
    f AS (
        SELECT u.cohort, u.dur,
               epoch(g.gmax - u.last_ts) >= {KM_CENSOR_DAYS} * 86400.0
                   AS churned
        FROM u CROSS JOIN g
    ),
    t AS (
        SELECT dur,
               CAST(SUM(CASE WHEN cohort = 0 AND churned
                             THEN 1 ELSE 0 END) AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN cohort = 0 AND NOT churned
                             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN cohort = 1 AND churned
                             THEN 1 ELSE 0 END) AS BIGINT) AS d2,
               CAST(SUM(CASE WHEN cohort = 1 AND NOT churned
                             THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM f GROUP BY dur
    ),
    tot AS (
        SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1_tot,
               CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2_tot
        FROM f
    ),
    r AS (
        SELECT dur, d1, d2,
               n1_tot - COALESCE(SUM(d1 + c1) OVER (
                   ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n1r,
               n2_tot - COALESCE(SUM(d2 + c2) OVER (
                   ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n2r
        FROM t CROSS JOIN tot
    ),
    s AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               SUM(CAST(d1 + d2 AS DOUBLE) * n1r / (n1r + n2r)) AS e1,
               SUM(CASE WHEN n1r + n2r > 1 THEN
                       CAST(d1 + d2 AS DOUBLE) * n1r * n2r
                       * (n1r + n2r - d1 - d2)
                       / (CAST(n1r + n2r AS DOUBLE) * (n1r + n2r)
                          * (n1r + n2r - 1))
                   ELSE 0.0 END) AS v
        FROM r
        WHERE d1 + d2 > 0
    )
    SELECT o1, round(e1, 6) AS e1,
           round((o1 - e1) / sqrt(v), 6) AS z,
           round((o1 - e1) * (o1 - e1) / v, 6) AS chi2,
           abs(round((o1 - e1) / sqrt(v), 6)) > {_LR_Z_CRIT} AS significant
    FROM s
    """,
)
def surv_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test: do the two deterministic user
    cohorts (user_id parity — the classic hash holdout split) share a
    churn survival curve?  The hypothesis-test companion to
    surv_kaplan_meier, with the SAME duration/censoring definitions
    (KM_CENSOR_DAYS) so the two readouts always agree on who is at
    risk.  At each churn time: E1 = d * n1/n, V = d*n1*n2*(n-d) /
    (n^2*(n-1)); Z = (O1 - E1)/sqrt(sum V), chi2 = Z^2.

    Spark plan: identical scale shape to Kaplan-Meier — one user-grain
    aggregate, one duration-grain aggregate (observation-window-sized
    forever), a 1-row cohort-totals broadcast, prefix-sum windows on
    the tiny frame.  Risk sets stay exact BIGINTs; each E/V term is
    computed from integers (bit-identical on both engines) and only
    the final sums are float, with 6-dp rounding absorbing association
    order (the stat_moments precedent)."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.floor(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / 86400.0
        ).cast("long").alias("dur"),
        F.max("ts").alias("last_ts"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("cohort"), "dur", "last_ts"
    )
    g = ev.agg(F.max("ts").alias("gmax"))
    f = u.crossJoin(F.broadcast(g)).select(
        "cohort",
        "dur",
        (
            (F.unix_timestamp("gmax") - F.unix_timestamp("last_ts"))
            >= KM_CENSOR_DAYS * 86400.0
        ).alias("churned"),
    )
    is1 = F.col("cohort") == 0
    t = f.groupBy("dur").agg(
        F.sum(F.when(is1 & F.col("churned"), 1).otherwise(0))
        .cast("long").alias("d1"),
        F.sum(F.when(is1 & ~F.col("churned"), 1).otherwise(0))
        .cast("long").alias("c1"),
        F.sum(F.when(~is1 & F.col("churned"), 1).otherwise(0))
        .cast("long").alias("d2"),
        F.sum(F.when(~is1 & ~F.col("churned"), 1).otherwise(0))
        .cast("long").alias("c2"),
    )
    tot = f.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1_tot"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2_tot"),
    )
    w_before = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = (
        t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n1r",
            F.col("n1_tot")
            - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(w_before),
                         F.lit(0)),
        )
        .withColumn(
            "n2r",
            F.col("n2_tot")
            - F.coalesce(F.sum(F.col("d2") + F.col("c2")).over(w_before),
                         F.lit(0)),
        )
        .filter(F.col("d1") + F.col("d2") > 0)
    )
    nr = F.col("n1r") + F.col("n2r")
    d = (F.col("d1") + F.col("d2")).cast("double")
    s = r.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(d * F.col("n1r") / nr).alias("e1"),
        F.sum(
            F.when(
                nr > 1,
                d * F.col("n1r") * F.col("n2r") * (nr - F.col("d1") - F.col("d2"))
                / (nr.cast("double") * nr * (nr - 1)),
            ).otherwise(0.0)
        ).alias("v"),
    )
    z = F.round((F.col("o1") - F.col("e1")) / F.sqrt(F.col("v")), 6)
    return s.select(
        "o1",
        F.round("e1", 6).alias("e1"),
        z.alias("z"),
        F.round(
            (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1"))
            / F.col("v"),
            6,
        ).alias("chi2"),
        (F.abs(z) > _LR_Z_CRIT).alias("significant"),
    )


@query(
    "stat_durbin_watson",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ),
    lagd AS (
        SELECT event_type, x, y,
               x - lag(x) OVER (PARTITION BY event_type ORDER BY x) AS dx,
               y - lag(y) OVER (PARTITION BY event_type ORDER BY x) AS dy
        FROM daily
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(dy * dy) AS BIGINT) AS sdy2,
               CAST(SUM(dx * dy) AS BIGINT) AS sdxdy,
               CAST(SUM(dx * dx) AS BIGINT) AS sdx2
        FROM lagd GROUP BY 1
    ),
    f AS (
        SELECT event_type, n, sy, sx, sxx, sxy, syy, sdy2, sdxdy, sdx2,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b
        FROM g
    ),
    h AS (
        SELECT event_type, n, b, sdy2, sdxdy, sdx2, syy, sxy, sxx, sx, sy,
               (CAST(sy AS DOUBLE) - b * sx) / n AS a
        FROM f
    )
    SELECT event_type,
           n AS n_days,
           round(b, 6) AS slope,
           round((sdy2 - 2.0 * b * sdxdy + b * b * sdx2)
                 / (syy + n * (a * a) + b * b * sxx
                    - 2.0 * a * sy - 2.0 * b * sxy + 2.0 * a * b * sx),
                 6) AS dw
    FROM h
    """,
)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation test (Durbin & Watson
    1950) on the residuals of each event type's daily-volume trend fit —
    the diagnostic that belongs NEXT TO stat_linreg: a trend fit whose
    residuals are serially correlated has understated standard errors,
    and DW ~ 2(1 - rho_1) is the classic readout (DW << 2 -> positive
    autocorrelation, >> 2 -> negative).

    Exact kernel — no residual is ever materialized: with e_t =
    y_t - a - b x_t, both DW sums EXPAND into the sufficient statistics,

        num = sum (dy - b dx)^2  = sdy2 - 2b sdxdy + b^2 sdx2
        den = sum e^2 = syy + n a^2 + b^2 sxx - 2a sy - 2b sxy + 2ab sx

    where every s* is an exact BIGINT over integer day offsets and
    integer daily counts (lag deltas via one window over the DAILY
    grain, which is calendar-bounded metadata after the first
    aggregate, never over the events themselves). The float tail (the
    b and a divisions and the two quadratic forms) is the identical
    expression tree on both engines -> 6-dp bit-identical rounds.

    Plan: one fact-scan hash aggregate to daily grain, one bounded
    window, one group aggregate. Scan-bound at 100 TB; the window's
    partitions are ~700 rows regardless of data scale.

    Reference parity: no inferential statistics in the reference;
    extension shelf next to stat_linreg / stat_mann_kendall.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit(_LR_ANCHOR).cast("date")
            ).alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("x")
    lagd = daily.select(
        "event_type", "x", "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    )
    g = lagd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("sdy2"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sdxdy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sdx2"),
    )
    b = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    f = g.select("*", b.alias("b"))
    a = (F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")
    h = f.select("*", a.alias("a"))
    num = (
        F.col("sdy2")
        - 2.0 * F.col("b") * F.col("sdxdy")
        + F.col("b") * F.col("b") * F.col("sdx2")
    )
    den = (
        F.col("syy")
        + F.col("n") * (F.col("a") * F.col("a"))
        + F.col("b") * F.col("b") * F.col("sxx")
        - 2.0 * F.col("a") * F.col("sy")
        - 2.0 * F.col("b") * F.col("sxy")
        + 2.0 * F.col("a") * F.col("b") * F.col("sx")
    )
    return h.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.col("b"), 6).alias("slope"),
        F.round(num / den, 6).alias("dw"),
    )
