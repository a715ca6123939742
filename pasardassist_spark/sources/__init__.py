from pasardassist_spark.sources.enrichment import (
    FakeRpcClient,
    derive_blocks,
    enrich_events,
    fetch_receipts,
    run_retry_rounds,
)
from pasardassist_spark.sources.rates import rates_dim

__all__ = [
    "FakeRpcClient",
    "derive_blocks",
    "enrich_events",
    "fetch_receipts",
    "run_retry_rounds",
    "rates_dim",
]
