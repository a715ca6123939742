"""Gap sessionization — the custom stateful operator path (SURVEY.md §2.9).

The reference has no session concept; a training-data event pipeline needs
one (per-user activity sessions feed engagement features and sampling). Two
implementations with a tested equivalence:

- ``sessionize_batch``: the declarative form — lag/gap marker, running sum
  to session ids, one aggregation. Pure window + groupBy: Catalyst plans a
  single hash shuffle by user. This is also the DuckDB-oracle-checkable
  form (``sess_gap_sessionize``).
- ``sessionize_stream``: the streaming form via ``applyInPandasWithState``
  — the escape hatch for stateful logic Structured Streaming's built-in
  windows cannot express (a session's end depends on the NEXT event's gap,
  not a fixed window). State per user = the open session (start, last, n,
  total); arriving batches fold in event-time order, emitting sessions as
  gaps close them; an event-time timeout (watermark + gap) flushes idle
  sessions. State size is O(users), bounded by the watermark.

The streaming fold assumes batches arrive watermark-respecting (late rows
beyond the watermark are dropped by Spark before the operator); within a
batch, rows are sorted by event time before folding.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window as W, functions as F

GAP_SECONDS = 1800

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_batch(ev: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch sessionization: gap > gap_seconds starts a new session."""
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marker = F.when(
        us - F.lag(us).over(w) > gap_seconds * 1_000_000, 1
    ).otherwise(0)
    sess = ev.withColumn("_new", marker).withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "_sid").agg(
        F.min(us).alias("session_start"),
        F.max(us).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).drop("_sid")


def _fold_session(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user,) = key
    gap_us = GAP_SECONDS * 1_000_000
    closed: list[tuple] = []
    if state.hasTimedOut:
        if state.exists:
            s, last, n, total = state.get
            closed.append((user, s, last, n, total))
            state.remove()
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["us", "event_id"])
    if state.exists:
        s, last, n, total = state.get
    else:
        s = last = None  # type: ignore[assignment]
        n, total = 0, 0.0
    for us, value in zip(rows["us"], rows["value"]):
        if s is None:
            s, last, n, total = int(us), int(us), 1, float(value)
        elif int(us) - last > gap_us:
            closed.append((user, s, last, n, total))
            s, last, n, total = int(us), int(us), 1, float(value)
        else:
            # A late-but-within-watermark event (us <= last) folds into the
            # open session without moving its end backward; if it predates
            # the session start it extends the start. Repairing an
            # ALREADY-CLOSED session would need emitted-session retraction —
            # out of scope for append mode; bound staleness with the
            # watermark instead (documented limitation).
            s, last = min(s, int(us)), max(last, int(us))
            n, total = n + 1, total + float(value)
    state.update((s, last, n, total))
    # idle flush: once the watermark passes last + gap, the session closes.
    # The timestamp must sit beyond the current watermark or Spark rejects it
    # (possible when this batch's rows are older than gap behind the clock).
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max((last + gap_us) // 1000 + 1, wm + 1))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )


def sessionize_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization over an event stream with a ``ts`` column.
    Emits CLOSED sessions (append semantics); open sessions live in state
    until a gap or the event-time timeout closes them."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = (
        stream.withWatermark("ts", watermark)
        .select(
            "user_id",
            "event_id",
            "ts",  # the watermarked event-time column must reach the operator
            F.unix_micros(F.col("ts")).alias("us"),
            F.col("value").cast("double").alias("value"),
        )
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _fold_session,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
