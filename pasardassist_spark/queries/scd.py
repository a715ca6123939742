"""Slowly-changing-dimension (SCD2) maintenance and point-in-time reads.

The reference mutates entity documents in place (latest-wins $set,
reference src/modules/tasks/tasks.service.ts:367-391), destroying
history; a lakehouse engine keeps the full version chain. These queries
build the SCD2 version table from a change stream and answer the
point-in-time lookup a bitemporal consumer needs.

Scale shape: everything is windows over ONE entity-keyed exchange —
change-detection (lag), interval close (lead), and currency flag reuse
the same (user_id, ts) partitioning, so Catalyst plans a single sort +
window stack per entity. The PIT lookup is the existing as-of join
machinery (operators/asof.py rationale) applied to the version table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load


@query(
    "scd2_build",
    oracle="""
    WITH ch AS (
        SELECT user_id, ts, event_id, event_type AS state,
               LAG(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
        SELECT user_id, state, ts AS valid_from, event_id,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM ch
        WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, valid_from, valid_to,
           (valid_to IS NULL) AS is_current,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id
           ) AS version
    FROM v
    """,
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version table from the event change stream: consecutive
    events with the SAME state collapse into one version (the lag-based
    change filter — the subtlety naive interval builders miss), each
    surviving version gets [valid_from, valid_to) from the NEXT change's
    timestamp, the open version is flagged current, and versions number
    monotonically. Three window functions over one (user_id, ts) sort —
    a single exchange; the change filter drops same-state rows BEFORE
    the lead, so valid_to always points at a real state change."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.lag("event_type").over(w).alias("prev_state"),
    ).filter(
        F.col("prev_state").isNull()
        | (F.col("prev_state") != F.col("state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ch.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.lead("ts").over(w2).alias("valid_to"),
    )
    w3 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return v.select(
        "user_id",
        "state",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        F.row_number().over(w3).alias("version"),
    )


@query(
    "scd2_pit_lookup",
    oracle="""
    WITH ch AS (
        SELECT user_id, ts, event_id, event_type AS state,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_state
        FROM events
    ),
    v AS (
        SELECT user_id, state, ts AS valid_from,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM ch
        WHERE prev_state IS NULL OR prev_state <> state
    ),
    f AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, f.value, v.state AS state_at_purchase
    FROM f JOIN v
      ON f.user_id = v.user_id
     AND v.valid_from <= f.ts
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    """,
)
def scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact enrichment: every purchase joins the dimension
    VERSION that was valid at the purchase timestamp (half-open
    [valid_from, valid_to) intervals, so boundary events land exactly
    once — a purchase that IS the state change sees the new state). The
    interval predicate rides the user_id equi-join, so this shuffles
    both sides once on the entity key and never range-explodes; versions
    per user are bounded by their change count."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("state"),
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
        .select(
            "user_id",
            "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    # both sides derive from the same scan: explicit aliases keep the
    # self-join predicate unambiguous (no lineage-id guessing)
    fa = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .alias("f")
    )
    va = v.alias("v")
    cond = (
        (F.col("f.user_id") == F.col("v.user_id"))
        & (F.col("v.valid_from") <= F.col("f.ts"))
        & (F.col("v.valid_to").isNull() | (F.col("f.ts") < F.col("v.valid_to")))
    )
    return fa.join(va, cond).select(
        F.col("f.event_id"),
        F.col("f.user_id"),
        F.col("f.ts"),
        F.col("f.value"),
        F.col("v.state").alias("state_at_purchase"),
    )
