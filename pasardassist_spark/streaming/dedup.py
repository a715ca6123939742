"""Streaming exactly-once-by-key admission for at-least-once sources.

The ingestion sources here are at-least-once by construction: the file
stream re-lists after crash-recovery, the dynamic-registration sink is an
append log replayed per epoch (streaming/dynamic.py), and the reference's
own upstream (chain event subscription, sub-tasks.service.ts re-polling)
re-delivers events freely. Downstream consumers either dedup by key
themselves or sit behind this operator.

``streaming_dedup`` is the declarative form: Spark's
``dropDuplicatesWithinWatermark`` keeps one row per key and — unlike plain
``dropDuplicates`` on a stream, whose key state grows without bound — drops
a key's state once the watermark passes it. State size is therefore
O(keys within the watermark window), not O(keys ever seen): the property
that makes the operator runnable forever at 100 TB/day. The guarantee is
correspondingly windowed — a duplicate arriving later than ``delay`` after
the original is re-admitted; size ``delay`` to the source's maximum
re-delivery lag (here: the replay depth of the file source).

Batch equivalence (tests/test_streaming.py): replaying every chunk twice
through this operator yields exactly the batch ``DISTINCT`` by key, because
all duplicates in the test layout arrive within the watermark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "2 days",
) -> DataFrame:
    """One row per ``keys`` tuple among arrivals within ``delay`` of each
    other; first arrival wins. Works in append mode (emits immediately,
    no window close to wait for)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
