"""Per-event enrichment: batched RPC receipts, metadata resolution, and the
slow-retry loop (SURVEY.md §2.1 S4/S5, §2.9 ST7).

Reference behavior being replaced:

- per-event JSON-RPC calls for tx receipt / block header / contract state
  (web3.service.ts:206-232, used from tasks.service.ts:117-126,243-254) —
  here an Arrow-batched ``mapInPandas`` stage: one client call per Arrow
  batch, never per row. At 100 TB the same stage body swaps the fake client
  for an async HTTP session; better still, when receipts/blocks are already
  landed as tables, enrichment degrades to a plain co-partitioned join
  (SURVEY §2.1: "at scale, join not RPC") — both paths are built here.
- IPFS/HTTP metadata fetch with retry bookkeeping
  (sub-tasks.service.ts:47-61,291-332): tokens that fail resolution carry
  ``notGetDetail: true, retryTimes < 5`` and are re-polled on a cadence
  (db.service.ts:163-170) — here ``run_retry_rounds``: a pending table
  re-attempted per round, retry_times incremented on failure, dead-lettered
  at the cap.

The fake client is DETERMINISTIC and SQL-mirrorable (pure arithmetic on
event_id), so the whole enrichment join is verified end-to-end by a DuckDB
oracle — the plumbing (Arrow batch shape, schemas, join keys, retry state
transitions) is the real design; only the network call is simulated.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MAX_RETRIES = 5  # db.service.ts:163-170: retryTimes < 5

RECEIPT_SCHEMA = "event_id long, gas_used long, status boolean"


class FakeRpcClient:
    """Deterministic stand-in for the async batched JSON-RPC client.

    ``batch_receipts`` is vectorized over the whole Arrow batch — exactly
    where an aiohttp ``asyncio.gather`` over the batch's ids would go. The
    receipt fields are arithmetic on event_id so a DuckDB oracle can
    re-derive them and hash-verify the enrichment join.
    """

    def batch_receipts(self, ids: pd.Series) -> pd.DataFrame:
        gas_used = (ids * 21 + 21000) % 300000 + 21000
        status = (ids % 97) != 0
        return pd.DataFrame(
            {"event_id": ids, "gas_used": gas_used, "status": status}
        )

    def flaky_attempt(self, ids: pd.Series, attempt: int) -> pd.Series:
        """Success mask for retry round ``attempt`` (1-based). A row needs
        ``event_id % 4`` failures before succeeding; ids divisible by 50
        never succeed inside the retry cap (permanent dead-letter food)."""
        fails_needed = (ids % 4).where(ids % 50 != 0, other=MAX_RETRIES + 2)
        return attempt > fails_needed


def fetch_receipts(events: DataFrame, id_col: str = "event_id") -> DataFrame:
    """S4: Arrow-batched receipt fetch. Input is column-pruned to the id —
    the scan never carries event payloads into Python."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = FakeRpcClient()
        for pdf in batches:
            yield client.batch_receipts(pdf[id_col])

    return events.select(id_col).mapInPandas(gen, RECEIPT_SCHEMA)


def derive_blocks(events: DataFrame) -> DataFrame:
    """Block-header side table (block = event_id div 100): the landed-table
    half of S4 — at scale you JOIN to this instead of calling RPC."""
    return events.groupBy(F.expr("event_id div 100").alias("block_number")).agg(
        F.min("ts").alias("block_time"), F.count(F.lit(1)).alias("block_txs")
    )


def enrich_events(events: DataFrame) -> DataFrame:
    """Full enrichment join: events + RPC receipts (mapInPandas) + block
    header dim (join) + resolved metadata (S5: URI + parsed field, kept
    JVM-side — get_json_object/md5 are builtin exprs, no Python hot path).

    Shuffle plan: receipts are joined back on event_id — one hash shuffle
    of each side (mapInPandas output carries no partitioning Catalyst can
    reuse); blocks is ~1/100th of events and joins on its own key. No data
    column crosses into Python except the id batch.
    """
    receipts = fetch_receipts(events)
    blocks = derive_blocks(events)
    return (
        events.withColumn("block_number", F.expr("event_id div 100"))
        .join(receipts, "event_id")
        .join(blocks, "block_number")
        .select(
            "event_id",
            "block_number",
            "block_time",
            "block_txs",
            "gas_used",
            "status",
            F.concat(F.lit("ipfs://"), F.md5("props")).alias("meta_uri"),
            F.get_json_object("props", "$.k").cast("int").alias("meta_k"),
        )
    )


def run_retry_rounds(
    events: DataFrame, max_retries: int = MAX_RETRIES
) -> tuple[DataFrame, DataFrame]:
    """ST7: the slow-retry enrichment loop as DataFrame state transitions.

    Round n attempts every pending row through the (flaky) client:
    successes move to the enriched set, failures increment ``retry_times``,
    rows hitting the cap are dead-lettered. The driver loop is bounded by
    ``max_retries`` (the reference's polling cadence, db.service.ts:163-170);
    each round is a distributed Arrow-batched pass, no per-row Python.

    Returns ``(enriched, dead)`` — together a partition of the input ids.
    """
    attempt_schema = "event_id long, ok boolean"

    def attempt_round(n: int):
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = FakeRpcClient()
            for pdf in batches:
                yield pd.DataFrame(
                    {"event_id": pdf["event_id"], "ok": client.flaky_attempt(pdf["event_id"], n)}
                )

        return gen

    pending = events.select("event_id").withColumn("retry_times", F.lit(0))
    enriched_parts: list[DataFrame] = []
    for n in range(1, max_retries + 1):
        outcome = pending.select("event_id").mapInPandas(attempt_round(n), attempt_schema)
        pending_o = pending.join(outcome, "event_id")
        succeeded = pending_o.filter(F.col("ok")).select("event_id", "retry_times")
        enriched_parts.append(succeeded.join(fetch_receipts(succeeded), "event_id"))
        pending = (
            pending_o.filter(~F.col("ok"))
            .select("event_id", (F.col("retry_times") + 1).alias("retry_times"))
        )
        # Localize the iteration boundary so each round's lineage doesn't
        # re-run every prior round (bounded loop: <= max_retries passes).
        pending = pending.localCheckpoint(eager=False)
    enriched = enriched_parts[0]
    for part in enriched_parts[1:]:
        enriched = enriched.unionByName(part)
    dead = pending  # retry_times == max_retries
    return enriched, dead
