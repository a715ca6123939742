"""Event-stream batch queries (SURVEY.md §2.8 scalar funcs, §2.9 ST3/ST4).

The streaming forms live in pasardassist_spark/streaming/; these are the
batch-recompute equivalents the replay-equals-batch test (§5.2) compares
against, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pasardassist_spark.functions.chain import uint256_hex
from pasardassist_spark.functions.money import dec2
from pasardassist_spark.operators.latest import latest_per_key
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


@query(
    "scalar_funcs",
    oracle="""
    SELECT event_id,
           lower(to_hex(event_id)) AS id_hex,
           date_trunc('day', ts) AS day,
           upper(event_type) AS kind,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar family: uint->hex (tokenIdHex, sub-tasks.service.ts:84),
    day truncation ("today's earnings" bounds, app.service.ts:282-287),
    string upper, JSON field extraction (IPFS metadata merge,
    sub-tasks.service.ts:63-94)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        uint256_hex("event_id").alias("id_hex"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.upper("event_type").alias("kind"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


def day_rollup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 batch twin: tumbling-day rollup with exact per-day countDistinct
    (streaming aggs can't do exact distinct; the streaming form carries an
    HLL sketch instead).  Registry-wise this is merged into
    ``st3_stream_rollup`` — same oracle shape, the registered entry runs the
    REAL streaming path, and the batch/streaming equality is pytest-checked
    (tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "st1_stream_replay",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn FROM events
    ) WHERE rn = 1
    """,
)
def st1_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1/ST4 end-to-end: replay the events log through the actual
    Structured Streaming ingestion (readStream -> foreachBatch latest-state
    MERGE, streaming/ingest.py) and return the final silver entity table.
    The oracle is the batch argmax — the replay-equals-batch invariant
    (§5.2) as a driver-checked query, not just a unit test."""
    import os
    import tempfile

    from pasardassist_spark.streaming import (
        maintain_latest_state,
        read_event_stream,
        read_state,
    )

    tmp = tempfile.mkdtemp(prefix="pasard_replay_")
    # the file stream source wants a directory; stage the log file into one
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src, "events.parquet"))
    stream = read_event_stream(spark, src)
    q = maintain_latest_state(stream, f"{tmp}/state", f"{tmp}/ckpt")
    q.processAllAvailable()
    q.stop()
    return read_state(spark, f"{tmp}/state")


@query(
    "st9_lsm_replay",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn FROM events
    ) WHERE rn = 1
    """,
)
def st9_lsm_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSM merge policy (r16, streaming/ingest.append_into_bucketed_
    state) as a driver-checked query: replay the events log in 4
    micro-batches through the append-delta path with compact_every=3 —
    so the run crosses BOTH an append epoch and a compaction epoch — and
    return the read-through-fold state. The oracle is the same batch
    argmax as st1_stream_replay's, so the hash certifies that the
    delta-layer + amortized-compaction policy reaches the identical fix
    point as the eager merge (policy interchangeability, the
    BASELINE.md round-16 100x-probe finding's fix)."""
    import shutil
    import tempfile

    from pasardassist_spark.operators.latest import latest_per_key
    from pasardassist_spark.streaming import (
        append_into_bucketed_state,
        read_lsm_state,
    )

    def fold(df: DataFrame) -> DataFrame:
        return latest_per_key(df, ["user_id"], [F.desc("ts"), F.desc("event_id")])

    ev = load(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="pasard_lsm_")
    try:
        for b in range(4):
            batch = ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == b)
            append_into_bucketed_state(
                fold(batch), f"{tmp}/state", ["user_id"], fold,
                epoch_id=b, compact_every=3,
            )
        out = read_lsm_state(spark, f"{tmp}/state", fold)
        # materialize before the tempdir delete (library.py precedent)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def latest_state_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4/A6 batch view: entity state as latest-event-per-key (the order
    state machine Created->{Filled,Cancelled}, tasks.service.ts:367-373,
    585-591, is equivalently the argmax event per key).  Registry-wise this
    is merged into ``st4_entity_fold``, whose associative fold subsumes the
    argmax + per-key aggregates; kept as a helper for the replay-equals-batch
    pytest (§5.2) and as the simplest statement of the invariant."""
    ev = load(spark, sf_dir, "events")
    latest = latest_per_key(ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )
    aggs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).cast("double").alias("total_value"),
    )
    return latest.join(aggs, "user_id")


@query(
    "st4_entity_fold",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events WHERE event_type IN ('signup', 'purchase', 'error')
    ),
    latest AS (
        SELECT user_id, event_type AS status, ts AS status_ts,
               event_id AS status_eid
        FROM s WHERE rn = 1
    ),
    aggs AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clicks,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS total_purchase,
               MAX(CASE WHEN event_type = 'view' THEN ts END) AS last_view_ts,
               MIN(ts) AS first_seen
        FROM events GROUP BY user_id
    )
    SELECT a.user_id, l.status, l.status_ts, l.status_eid,
           a.n_clicks, a.total_purchase, a.last_view_ts, a.first_seen
    FROM aggs a LEFT JOIN latest l ON a.user_id = l.user_id
    """,
)
def st4_entity_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 as a state MACHINE: the reference's per-event $set/$inc mutations
    (order lifecycle tasks.service.ts:367-373,585-591) re-expressed as ONE
    associative fold — status argmax (with its key, so folds merge), additive
    counters, decimal-exact conditional sum, extrema. One shuffle batch-side;
    the identical fold runs per micro-batch in streaming
    (maintain_entity_state) and merges into bucketed state."""
    from pasardassist_spark.operators.fold import fold_entity_state

    ev = load(spark, sf_dir, "events")
    folded = fold_entity_state(ev)
    return folded.withColumn("total_purchase", F.col("total_purchase").cast("double"))


def _a11_oracle_sql() -> str:
    from pasardassist_spark.queries.aggregates import _DISC_PRICE_SQL

    return f"""
    SELECT s_suppkey, s_name,
           items, owners, trade_volume, lowest_price
    FROM (
        SELECT l_suppkey,
               COUNT(*) AS items,
               COUNT(DISTINCT o_custkey) AS owners,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {_DISC_PRICE_SQL}
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS trade_volume,
               MIN(CASE WHEN l_returnflag <> 'A' THEN l_extendedprice END) AS lowest_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey
    ) stats JOIN supplier ON l_suppkey = s_suppkey
    """


@query("st8_incremental_stats", oracle=_a11_oracle_sql())
def st8_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11's streaming twin, end-to-end (VERDICT r5 directive #3): the
    lineitem log replayed through readStream -> foreachBatch partial-fold
    MERGE into the generational state store (streaming/stats.py), then the
    stats frame derived from the final state. The oracle is the batch A11
    SQL — incremental-maintenance-equals-batch as a driver-checked query.
    The reference recomputes these stats on a 10-min cron
    (tasks.common.ts:124-154); here they are maintained per micro-batch at
    O(batch + touched-state) cost."""
    import os
    import tempfile

    from pasardassist_spark.streaming.stats import (
        collection_stats_from_state,
        maintain_collection_stats,
    )

    li_schema = load(spark, sf_dir, "lineitem").schema
    tmp = tempfile.mkdtemp(prefix="pasard_incstats_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/lineitem.parquet", os.path.join(src, "lineitem.parquet"))
    stream = spark.readStream.schema(li_schema).parquet(src)
    q = maintain_collection_stats(
        stream, load(spark, sf_dir, "orders"), f"{tmp}/state", f"{tmp}/ckpt"
    )
    q.processAllAvailable()
    q.stop()
    return collection_stats_from_state(
        spark, f"{tmp}/state", load(spark, sf_dir, "supplier")
    )


@query(
    "st3_stream_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def st3_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 through the REAL streaming path: the events log replayed via
    readStream -> watermarked tumbling-day window -> complete-mode sink,
    returned as the final table. The oracle is the batch rollup — the
    streaming/batch equivalence (§5.2) as a driver-checked query.
    approx_users is excluded from the comparison surface (HLL, engine-
    specific; bounded-error asserted in pytest)."""
    import os
    import tempfile

    from pasardassist_spark.streaming import read_event_stream, streaming_day_rollup

    tmp = tempfile.mkdtemp(prefix="pasard_st3_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src, "events.parquet"))
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    agg = streaming_day_rollup(stream)
    name = f"st3_rollup_{os.getpid()}_{abs(hash(sf_dir)) % 10000}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name).select("day", "n_events", "total_value")


@query(
    "streaming_watermark_readout",
    oracle="""
    WITH e0 AS (
        SELECT (event_id // 3) % 4 AS d, value
        FROM events WHERE event_id % 3 = 0
    ),
    e1 AS (
        -- the late batch: day-0 rows arrive after the watermark passed
        -- their window end and are DROPPED; day-1/day-2 rows are late
        -- by raw event time but their windows are still open, so they
        -- count (the window-end drop rule this row exists to pin)
        SELECT (event_id // 3) % 3 AS d, value
        FROM events
        WHERE event_id % 3 = 1 AND (event_id // 3) % 3 >= 1
    ),
    rows_all AS (
        SELECT d, value FROM e0
        UNION ALL SELECT d, value FROM e1
        UNION ALL SELECT 3 AS d, 0.0 AS value  -- epoch-0 watermark sentinel
        UNION ALL SELECT 3 AS d, 0.0 AS value  -- epoch-1 wedge sentinel
    )
    SELECT CAST(d AS INTEGER) AS day_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM rows_all GROUP BY d
    """,
)
def streaming_watermark_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 (late data / watermark) driven END-TO-END and read back — the
    docgate/imagegate readout pattern giving the watermark semantics a
    driver row with a closed-form oracle (st3 pins stream==batch in
    COMPLETE mode; this pins the APPEND-mode finalize-and-drop rule,
    previously pytest-only).

    Four event-time-controlled epochs replay through the watermarked
    tumbling-day rollup (streaming/ingest.streaming_day_rollup,
    watermark 2 days) as separate files under maxFilesPerTrigger=1,
    with mtimes pinning batch order:

    - epoch 0: event_id%3==0 rows spread over days 0-3 (hour 1-23), plus
      a sentinel at day 3 23:00 that FIXES the max event time, so the
      watermark entering later batches is exactly day 1 23:00;
    - epoch 1 (the WEDGE): one more day-3-23:00 sentinel.  Its batch is
      where day 0 gets evicted and emitted final (eviction runs with
      the post-epoch-0 watermark; the wedge leaves the max — and hence
      the watermark — unchanged).  Without the wedge, late day-0 rows
      would land in the same batch as day 0's eviction and still merge
      (measured: append mode drops only rows arriving AFTER their
      window was evicted — the one-batch lag is the real engine
      semantics this row pins);
    - epoch 2: event_id%3==1 rows at noon of days 0-2 — ALL late by raw
      event time, but only day-0's window is already closed: day-0 rows
      must be dropped, day-1/day-2 rows must still count.  Dropping by
      raw event time instead of window finality would flunk the oracle
      on every day-1 row;
    - epochs 3 and 4: single far-future sentinels (day 30, day 40) that
      push the watermark past every real window so append mode emits
      day 1-3 as FINAL — epoch 4 exists so day 3's eviction happens in
      a deterministic data-bearing batch, not an optional flush batch.

    The readout keeps day_no <= 3 (the sentinel windows are never
    finalized deterministically, and they are scaffolding, not data).
    The oracle re-derives every count/sum from event_id arithmetic —
    one hash certifies watermark advancement, the window-end drop rule,
    within-watermark late admission, and append-mode finality.  At
    100 TB this is the production shape: files-per-trigger cadence,
    state bounded by watermark eviction."""
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="pasard_wm_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        ev = load(spark, sf_dir, "events").select("event_id", "value")
        base = "TIMESTAMP '2024-01-01 00:00:00'"
        e0 = ev.filter("event_id % 3 = 0").selectExpr(
            "event_id AS user_id",
            f"{base} + make_interval(0, 0, 0, "
            "CAST((event_id DIV 3) % 4 AS INT), "
            "CAST((event_id DIV 3) % 23 + 1 AS INT), 0, 0) AS ts",
            "value",
        ).unionAll(
            spark.range(1).selectExpr(
                "CAST(-1 AS BIGINT) AS user_id",
                f"{base} + make_interval(0, 0, 0, 3, 23, 0, 0) AS ts",
                "CAST(0.0 AS DOUBLE) AS value",
            )
        )
        late = ev.filter("event_id % 3 = 1").selectExpr(
            "event_id AS user_id",
            f"{base} + make_interval(0, 0, 0, "
            "CAST((event_id DIV 3) % 3 AS INT), 12, 0, 0) AS ts",
            "value",
        )

        def _sentinel(days: int, hours: int, uid: int) -> DataFrame:
            return spark.range(1).selectExpr(
                f"CAST({uid} AS BIGINT) AS user_id",
                f"{base} + make_interval(0, 0, 0, {days}, {hours}, 0, 0)"
                " AS ts",
                "CAST(0.0 AS DOUBLE) AS value",
            )

        epochs = [
            e0,
            _sentinel(3, 23, -3),  # wedge: day 0 evicts here, max unchanged
            late,
            _sentinel(30, 0, -2),
            _sentinel(40, 0, -2),
        ]
        for i, epoch in enumerate(epochs):
            stage = os.path.join(work, f"stage{i}")
            epoch.coalesce(1).write.parquet(stage)
            (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
            dst = os.path.join(src, f"epoch{i}.parquet")
            os.rename(os.path.join(stage, part), dst)
            # batch order = (mtime, path): pin both
            os.utime(dst, (1_700_000_000 + i * 1000,) * 2)
        from pasardassist_spark.streaming.ingest import streaming_day_rollup

        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = streaming_day_rollup(stream)  # watermark "2 days"
        name = f"wm_readout_{os.getpid()}_{abs(hash(sf_dir)) % 10000}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return (
            spark.table(name)
            .select(
                F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
                .cast("int")
                .alias("day_no"),
                "n_events",
                "total_value",
            )
            .filter(F.col("day_no") <= 3)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "sess_gap_sessionize",
    oracle=f"""
    WITH m AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS newm
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, SUM(newm) OVER (
            PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING
        ) AS sid FROM m
    )
    SELECT user_id,
           MIN(us) AS session_start,
           MAX(us) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def sess_gap_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30-min inactivity closes a session): the lag ->
    marker -> running-sum -> aggregate shape, one hash shuffle by user. The
    streaming twin (applyInPandasWithState, streaming/sessions.py) is
    equivalence-tested against this batch form in tests/test_sessions.py."""
    from pasardassist_spark.streaming.sessions import sessionize_batch

    ev = load(spark, sf_dir, "events")
    return sessionize_batch(ev)


@query(
    "aj_rate_asof",
    oracle="""
    WITH rates AS (
        SELECT event_type, date_trunc('day', ts) AS rts, COUNT(*) AS day_n
        FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type, e.ts, r.day_n
    FROM events e
    ASOF LEFT JOIN rates r
      ON e.event_type = r.event_type AND e.ts >= r.rts
    """,
)
def aj_rate_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event stamped with the rate-feed row in effect at
    its timestamp (here a per-type daily stat as the deterministic feed —
    the reference's cached-latest-rate stamping, tasks.common.ts:94-122,
    made reproducible). The oracle is DuckDB's NATIVE ASOF JOIN — a fully
    independent implementation of the operator, so this is differentially
    verified, not self-checked.

    The join key (event_type) is ~5-valued, so this registers the
    SCALE-SAFE strategy: the per-type daily rates are dim-sized, so they
    compile into a dense broadcast lookup and the events fact table streams
    through one broadcast hash join — zero shuffle, zero sort on the big
    side (the union+window form would sort all events in ~5 tasks). Both
    strategies are equivalence-tested in tests/test_operators.py."""
    from pasardassist_spark.operators.asof import asof_join_broadcast

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    rates = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("rts"))
        .agg(F.count(F.lit(1)).alias("day_n"))
    )
    return asof_join_broadcast(
        ev, rates, ["event_type"], "ts", "rts", ["day_n"]
    ).select("event_id", "event_type", "ts", "day_n")


@query(
    "rj_session_assign",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS newm
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, SUM(newm) OVER (
            PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING
        ) AS sid FROM m
    ),
    sessions AS (
        SELECT user_id, MIN(us) AS session_start, MAX(us) AS session_end
        FROM s GROUP BY user_id, sid
    )
    SELECT e.event_id, e.user_id, sess.session_start
    FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events) e
    JOIN sessions sess
      ON e.user_id = sess.user_id
     AND e.us BETWEEN sess.session_start AND sess.session_end
    """,
)
def rj_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: assign every event to its containing session interval —
    the sessionize-then-stamp-back pattern. Band-bucketed equi-join (1-hour
    buckets), never a nested-loop BETWEEN plan; the oracle is DuckDB's
    independent BETWEEN join (its optimizer plans an IEJoin)."""
    from pasardassist_spark.operators.rangejoin import range_join
    from pasardassist_spark.streaming.sessions import sessionize_batch

    ev = load(spark, sf_dir, "events")
    sessions = sessionize_batch(ev).select("user_id", "session_start", "session_end")
    points = ev.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("us"))
    return range_join(
        points, sessions, ["user_id"], "us", "session_start", "session_end",
        bucket_width=3_600_000_000,
    ).select("event_id", "user_id", "session_start")


@query(
    "time_multi_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(d) = 0 AND GROUPING(m) = 0 THEN 'day'
                WHEN GROUPING(m) = 0 THEN 'month'
                ELSE 'total' END AS grain,
           COALESCE(CAST(CAST(d AS TIMESTAMP) AS VARCHAR),
                    CAST(CAST(m AS TIMESTAMP) AS VARCHAR), 'ALL') AS bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
        SELECT date_trunc('day', ts) AS d, date_trunc('month', ts) AS m, value
        FROM events
    )
    GROUP BY GROUPING SETS ((d, m), (m), ())
    """,
)
def time_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup in ONE pass: day, month,
    and grand-total aggregates via GROUPING SETS — one shuffle computes all
    grains (the reference recomputes each dashboard granularity as its own
    Mongo aggregate). The grain label derives from GROUPING() flags, so the
    output is self-describing."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("month", F.col("ts")).alias("m"),
        "value",
    )
    grain = (
        F.when((F.grouping("d") == 0) & (F.grouping("m") == 0), "day")
        .when(F.grouping("m") == 0, "month")
        .otherwise("total")
    )
    bucket = F.coalesce(
        F.col("d").cast("string"), F.col("m").cast("string"), F.lit("ALL")
    )
    return ev.groupingSets([["d", "m"], ["m"], []], "d", "m").agg(
        grain.alias("grain"),
        bucket.alias("bucket"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).select("grain", "bucket", "n_events", "total_value")


@query(
    "u3_attribution_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    """,
)
def u3_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→click attribution (30-min window): the batch twin of the
    watermarked stream-stream interval join (streaming/attribution.py,
    equivalence-tested in tests/test_streaming.py). The key+range condition
    is what bounds streaming join state at 100 TB/day rates."""
    from pasardassist_spark.streaming.attribution import attribution_batch

    return attribution_batch(load(spark, sf_dir, "events"))


@query(
    "w2_value_window_analytics",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS us, value,
           round(value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ), 2) AS delta,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE)
                 / COUNT(*) OVER wr, 6) AS avg_1h
    FROM events
    WINDOW wr AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def w2_value_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5's named window extensions over the reference's
    price-history scan (app.service.ts:345-354): per-user LAG delta plus a
    trailing 1-hour RANGE-frame moving average. Both windows hash-partition
    on user_id, so Catalyst reuses ONE exchange for the two frames — the
    whole query is a single shuffle at any scale. The moving sum runs in
    DECIMAL (exact, associative) and divides by the frame count as doubles
    rounded to 6dp, the cross-engine float contract; the delta is plain
    IEEE subtraction rounded to the input's 2dp."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w_lag = W.partitionBy("user_id").orderBy("us", "event_id")
    w_rng = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return (
        ev.select("event_id", "user_id", us.alias("us"), "value")
        .select(
            "event_id",
            "user_id",
            "us",
            "value",
            F.round(F.col("value") - F.lag("value").over(w_lag), 2).alias("delta"),
            F.round(
                F.sum(dec2("value")).over(w_rng).cast("double")
                / F.count(F.lit(1)).over(w_rng),
                6,
            ).alias("avg_1h"),
        )
    )


@query(
    "sess_concurrency",
    oracle="""
    WITH lagd AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS nw
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, sid, min(us) AS s, max(us) AS e
        FROM (
            SELECT user_id, us,
                   SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sid
            FROM lagd
        ) GROUP BY 1, 2
    ),
    d AS (
        SELECT s AS t, 1 AS dl FROM sess
        UNION ALL
        SELECT e + 1, -1 FROM sess
    ),
    n AS (
        SELECT t,
               CAST(SUM(dl) AS BIGINT) AS net,
               CAST(SUM(CASE WHEN dl > 0 THEN dl ELSE 0 END) AS BIGINT)
                   AS starts
        FROM d GROUP BY t
    ),
    c AS (
        SELECT t, net, starts,
               SUM(net) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS conc
        FROM n
    ),
    perday AS (
        SELECT date_trunc('day', make_timestamp(t)) AS day,
               CAST(MAX(GREATEST(conc, conc - net)) AS BIGINT) AS mx,
               CAST(SUM(starts) AS BIGINT) AS n_starts,
               CAST(arg_max(conc, t) AS BIGINT) AS end_level
        FROM c GROUP BY 1
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM perday),
    spine AS (
        SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
        FROM b
    ),
    filled AS (
        SELECT spine.day, perday.mx, perday.n_starts,
               last_value(perday.end_level IGNORE NULLS) OVER (
                   ORDER BY spine.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS carry
        FROM spine LEFT JOIN perday ON perday.day = spine.day
    )
    SELECT day,
           COALESCE(mx, carry) AS max_concurrency,
           COALESCE(n_starts, 0) AS n_session_starts
    FROM filled
    """,
)
def sess_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via a sweep line over the session
    intervals from the 30-min gap sessionization: +1 at each session
    start, -1 one microsecond after its end (inclusive [start, end]
    activity), net deltas per distinct instant, then a GLOBAL running
    sum — the interval-stabbing aggregate behind "peak concurrent users"
    dashboards, which no plain groupBy can produce because concurrency
    at time t depends on every earlier interval.

    The global cumulative sum is the two-phase distributed prefix sum
    (operators/packing.py:exclusive_prefix_sum — deterministic range
    buckets, in-bucket window, n_buckets-row offset broadcast), so no
    single-task global sort exists even though the statistic is globally
    ordered. The daily result is densified onto the full calendar spine:
    a day WITH delta points reports max(level) over greatest(conc,
    level-before) — which covers carry-in from midnight-spanning
    intervals — and a day with NO delta points inherits the carried
    end-of-day level of the last active day (the concurrency is flat
    across it by construction). All arithmetic is integer-exact."""
    from pasardassist_spark.operators.packing import exclusive_prefix_sum
    from pasardassist_spark.streaming.sessions import sessionize_batch

    # persist (r18): the session frame feeds BOTH delta sides, and the
    # chain above the prefix sum is evaluated again by the prefix sum's
    # internal bounds action and by the two perday consumers — unstaged,
    # the events window sessionization re-ran ~6x. Both staged frames
    # are aggregates (O(sessions) / O(days)); hygiene via clearCache.
    sess = sessionize_batch(load(spark, sf_dir, "events")).persist()
    deltas = sess.select(
        F.col("session_start").alias("t"), F.lit(1).alias("dl")
    ).unionByName(
        sess.select(
            (F.col("session_end") + 1).alias("t"), F.lit(-1).alias("dl")
        )
    )
    n = deltas.groupBy("t").agg(
        F.sum("dl").cast("bigint").alias("net"),
        F.sum(F.when(F.col("dl") > 0, F.col("dl")).otherwise(0))
        .cast("bigint")
        .alias("starts"),
    )
    c = exclusive_prefix_sum(n, "t", "net", out="before")
    conc = F.col("before") + F.col("net")
    perday = (
        c.select(
            F.date_trunc("day", F.timestamp_micros(F.col("t"))).alias("day"),
            F.greatest(conc, F.col("before")).alias("level"),
            conc.alias("conc"),
            "t",
            "starts",
        )
        .groupBy("day")
        .agg(
            F.max("level").cast("bigint").alias("mx"),
            F.sum("starts").cast("bigint").alias("n_starts"),
            F.max_by("conc", "t").cast("bigint").alias("end_level"),
        )
        .persist()
    )
    bounds = perday.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        )
    )
    from pyspark.sql import Window as _W

    wprev = (
        _W.orderBy("day")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    filled = spine.join(perday, "day", "left").select(
        "day",
        "mx",
        "n_starts",
        F.last("end_level", ignorenulls=True).over(wprev).alias("carry"),
    )
    return filled.select(
        "day",
        F.coalesce("mx", "carry").alias("max_concurrency"),
        F.coalesce("n_starts", F.lit(0)).alias("n_session_starts"),
    )


# nearest-asof tolerance: 20 h in microseconds — wide enough that most
# events match their floor-or-ceil daily rate row, narrow enough that
# late-evening events on the corpus's last day genuinely miss (exercising
# the unmatched-null contract)
AJ_NEAREST_TOL_US = 72_000_000_000


@query(
    "aj_nearest_rate",
    oracle=f"""
    WITH rates AS (
        SELECT event_type, date_trunc('day', ts) AS rts,
               CAST(COUNT(*) AS BIGINT) AS day_n
        FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type, e.ts, r.day_n, r.delta_us
    FROM events e
    LEFT JOIN LATERAL (
        SELECT day_n,
               CAST(abs(epoch_us(e.ts) - epoch_us(rts)) AS BIGINT)
                   AS delta_us
        FROM rates
        WHERE rates.event_type = e.event_type
          AND abs(epoch_us(e.ts) - epoch_us(rts)) <= {AJ_NEAREST_TOL_US}
        ORDER BY abs(epoch_us(e.ts) - epoch_us(rts)), rts
        LIMIT 1
    ) r ON TRUE
    """,
)
def aj_nearest_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-within-tolerance as-of join (pandas merge_asof
    direction='nearest'): each event stamped with the daily rate row
    closest to its timestamp on EITHER side, within 20 h; equidistant
    ties resolve to the earlier row, no row within tolerance => null.
    The backward-only form (aj_rate_asof) answers "the rate in effect";
    this answers "the rate measurement that best describes this moment"
    — the variant sensor/price pipelines want when feeds lag.

    Physical plan (operators/asof.py:asof_join_nearest_broadcast): two
    dense-broadcast as-of passes — backward as-is, forward on a negated
    time axis — then a row-local resolve; the events fact table streams
    through two broadcast hash joins with ZERO shuffle/sort of the big
    side. The oracle is an independent DuckDB LATERAL nearest-row
    lookup, so tolerance edges and tie-breaks are differentially
    verified."""
    from pasardassist_spark.operators.asof import asof_join_nearest_broadcast

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    rates = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("rts"))
        .agg(F.count(F.lit(1)).alias("day_n"))
    )
    return asof_join_nearest_broadcast(
        ev, rates, ["event_type"], "ts", "rts", ["day_n"],
        AJ_NEAREST_TOL_US, delta_col="delta_us",
    ).select("event_id", "event_type", "ts", "day_n", "delta_us")


SEASONAL_PERIOD = 7  # weekly seasonality on the daily grain


@query(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT day, n,
               SUM(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS sum7,
               COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                              AND 3 FOLLOWING) AS cnt7,
               date_diff('day', DATE '1970-01-01', day) % {SEASONAL_PERIOD}
                   AS dow
        FROM daily
    ),
    c AS (SELECT * FROM w WHERE cnt7 = {SEASONAL_PERIOD}),
    s AS (
        SELECT dow,
               CAST(SUM({SEASONAL_PERIOD} * n - sum7) AS BIGINT) AS d7_sum,
               CAST(COUNT(*) AS BIGINT) AS d7_cnt
        FROM c GROUP BY dow
    )
    SELECT c.day, c.n,
           round(CAST(c.sum7 AS DOUBLE) / {SEASONAL_PERIOD}, 6) AS trend,
           round(CAST(s.d7_sum AS DOUBLE)
                 / ({SEASONAL_PERIOD} * s.d7_cnt), 6) AS seasonal,
           round(c.n - CAST(c.sum7 AS DOUBLE) / {SEASONAL_PERIOD}
                 - CAST(s.d7_sum AS DOUBLE)
                   / ({SEASONAL_PERIOD} * s.d7_cnt), 6) AS residual
    FROM c JOIN s USING (dow)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (moving-average method)
    of the daily event count, period 7: trend = centered 7-day mean
    (full windows only), seasonal = per-weekday mean of the detrended
    series, residual = remainder. INTEGER-EXACT until the edges: the
    detrended value is kept as 7n - sum7 (x7 to avoid a float mean), so
    the per-weekday aggregation sums BIGINTs and divides once — no
    order-dependent float folding anywhere; weekday is epoch-day mod 7
    (never engine-specific dayofweek numbering).

    Scale note: the windows run on the DAILY grain, whose cardinality is
    bounded by the calendar (3.7k rows/decade) regardless of corpus
    size — the single-partition global sort is O(days), while the only
    data-sized operation is the scan-fused day aggregation."""
    from pyspark.sql import Window as W

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    win = W.orderBy("day").rowsBetween(-3, 3)
    w = daily.select(
        "day", "n",
        F.sum("n").over(win).alias("sum7"),
        F.count(F.lit(1)).over(win).alias("cnt7"),
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            % SEASONAL_PERIOD
        ).alias("dow"),
    ).filter(F.col("cnt7") == SEASONAL_PERIOD)
    s = w.groupBy("dow").agg(
        F.sum(SEASONAL_PERIOD * F.col("n") - F.col("sum7"))
        .cast("long")
        .alias("d7_sum"),
        F.count(F.lit(1)).cast("long").alias("d7_cnt"),
    )
    trend = F.col("sum7").cast("double") / SEASONAL_PERIOD
    seasonal = F.col("d7_sum").cast("double") / (
        SEASONAL_PERIOD * F.col("d7_cnt")
    )
    return w.join(s, "dow").select(
        "day", "n",
        F.round(trend, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col("n") - trend - seasonal, 6).alias("residual"),
    )
