"""Enrichment-stage and rates-dimension queries (SURVEY.md §2.1 S4/S5/S6,
§2.4 A8, §2.9 ST7) bound to the driver test tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pasardassist_spark.functions.money import dec2, dec4, small2
from pasardassist_spark.queries.registry import query
from pasardassist_spark.sources.enrichment import enrich_events
from pasardassist_spark.sources.rates import rates_dim
from pasardassist_spark.tables import load


@query(
    "s4_enrich_join",
    oracle="""
    WITH receipts AS (
        SELECT event_id,
               (event_id * 21 + 21000) % 300000 + 21000 AS gas_used,
               (event_id % 97) <> 0 AS status
        FROM events
    ),
    blocks AS (
        SELECT event_id // 100 AS block_number,
               MIN(ts) AS block_time,
               COUNT(*) AS block_txs
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_id // 100 AS block_number,
           b.block_time, b.block_txs, r.gas_used, r.status,
           'ipfs://' || md5(e.props) AS meta_uri,
           CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS meta_k
    FROM events e
    JOIN receipts r ON e.event_id = r.event_id
    JOIN blocks b ON e.event_id // 100 = b.block_number
    """,
)
def s4_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5: events enriched with Arrow-batched RPC receipts (mapInPandas,
    id-only column pruning into Python), a block-header side-table join, and
    resolved metadata (URI + parsed JSON field, builtin exprs). The oracle
    re-derives the deterministic client arithmetic in SQL, hash-verifying
    the full enrichment join (web3.service.ts:206-232,
    sub-tasks.service.ts:47-61)."""
    ev = load(spark, sf_dir, "events")
    return enrich_events(ev)


@query(
    "a8_weighted_volume",
    oracle="""
    SELECT n.n_name AS currency,
           CAST(SUM(
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    AS DECIMAL(18,4))
               * (101 + n.n_nationkey)
           ) AS DOUBLE) / 100 AS weighted_volume,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n ON s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def a8_weighted_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A8: global trading volume with a rate lookup —
    Σ price·(1-disc)·rate per currency, the reference's headline dashboard
    number (app.service.ts:1963-1989; feed jobs tasks.common.ts:94-221).
    The rates dim is broadcast (O(currencies) rows); rates are integer
    centi-units so the weighted sum stays decimal-exact, divided by 100
    only at the double output edge."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rates = rates_dim(load(spark, sf_dir, "nation"))
    disc_price = dec4(dec2("l_extendedprice") * (F.lit(1) - small2("l_discount")).cast("decimal(4,2)"))
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(rates), su.s_nationkey == rates.n_nationkey)
        .groupBy(F.col("currency"))
        .agg(
            (F.sum(disc_price * F.col("rate_centi")).cast("double") / 100).alias(
                "weighted_volume"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "st7_retry_enrichment",
    oracle="""
    SELECT event_id,
           CAST(event_id % 4 AS INTEGER) AS retry_times,
           (event_id * 21 + 21000) % 300000 + 21000 AS gas_used,
           (event_id % 97) <> 0 AS status
    FROM events
    WHERE event_id % 50 <> 0
    """,
)
def st7_retry_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7: the slow-retry loop end-to-end — every pending row re-attempted
    per round, retry_times incremented on failure, dead-lettered at the cap
    (db.service.ts:163-170). The deterministic flake schedule makes the
    entire loop oracle-checkable: a row needs event_id % 4 failures before
    succeeding, ids divisible by 50 never succeed (and are asserted
    dead-lettered in pytest, not returned here)."""
    from pasardassist_spark.sources.enrichment import run_retry_rounds

    ev = load(spark, sf_dir, "events")
    enriched, _dead = run_retry_rounds(ev)
    return enriched.select(
        "event_id", F.col("retry_times").cast("int").alias("retry_times"), "gas_used", "status"
    )
