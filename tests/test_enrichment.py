"""Enrichment-stage tests: retry-loop state transitions (ST7) and the
deterministic client's batch contract (S4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pasardassist_spark.sources.enrichment import (
    MAX_RETRIES,
    FakeRpcClient,
    fetch_receipts,
    run_retry_rounds,
)
from pasardassist_spark.tables import load


def test_retry_rounds_partition_input(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(400)
    n = ev.count()
    enriched, dead = run_retry_rounds(ev)
    ne, nd = enriched.count(), dead.count()
    assert ne + nd == n
    # permanent failures (event_id % 50 == 0) all dead-letter at the cap
    dead_rows = dead.collect()
    assert all(r.event_id % 50 == 0 for r in dead_rows)
    assert all(r.retry_times == MAX_RETRIES for r in dead_rows)
    assert len(dead_rows) == ev.filter(F.col("event_id") % 50 == 0).count()
    # retry_times recorded on success equals the deterministic flake count
    for r in enriched.collect():
        assert r.retry_times == r.event_id % 4, r
        assert r.gas_used == (r.event_id * 21 + 21000) % 300000 + 21000


def test_receipt_batch_contract(spark, sf_dir):
    """The client is called once per Arrow batch with the id series and
    returns aligned receipt columns (vectorized, no per-row calls)."""
    client = FakeRpcClient()
    ids = pd.Series([0, 1, 97, 194], dtype="int64")
    out = client.batch_receipts(ids)
    assert list(out.columns) == ["event_id", "gas_used", "status"]
    assert not bool(out.status[2]) and bool(out.status[1])  # 97 % 97 == 0
    ev = load(spark, sf_dir, "events").limit(100)
    got = fetch_receipts(ev)
    assert got.columns == ["event_id", "gas_used", "status"]
    assert got.count() == 100
