"""Kafka-SHAPED topic source: partitioned, offset-addressed log segments as
a first-class Spark Python DataSource (SURVEY.md Phase 2's "Kafka-shaped
interface"; VERDICT r15 task 6).

The reference's live subscription (tasks.service.ts:87-101) is a network
push; the no-network twin in streaming/ingest.py is FILE-grained
(maxFilesPerTrigger). Real cluster deployments sit on Kafka, whose source
contract is different in exactly the ways that matter for catch-up/cutover
semantics (ST1/S2):

- the read position is a PER-PARTITION OFFSET map, not a file set;
- rate admission is ``maxOffsetsPerTrigger`` — a TOTAL row budget split
  across partitions per micro-batch, not a file count;
- one topic partition = one Spark input partition (ordered within, free
  ordering across).

This module implements that contract against an on-disk topic layout
(``p<N>.jsonl``, one JSON record per line, line number = offset — what a
Kafka log segment dump looks like), so the streaming pipelines can be
tested against BOTH source shapes. Swapping in real Kafka is then a
format-string change (``format("kafka")`` + bootstrap options): the
pipeline code reads the same (key, value, timestamp, partition, offset)
envelope and parses ``value`` with from_json, exactly as it does here.

Register per session: ``spark.dataSource.register(TopicLogDataSource)``,
then ``spark.readStream.format("topiclog").option("path", dir)``.
Same deployment note as blocklog: the STREAM reader re-imports this module
by name in a separate runner process — the package must be importable
there (PYTHONPATH / shipped wheel).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# the Kafka record envelope (value carries the event payload as JSON text)
SCHEMA_DDL = (
    "key string, value string, timestamp bigint, partition int, offset bigint"
)


class _Slice(InputPartition):
    """One topic partition's [start, end) offset range."""

    def __init__(self, path: str, part: int, start: int, end: int):
        self.path = path
        self.part = part
        self.start = start
        self.end = end


def _partition_files(path: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for f in os.listdir(path):
        if f.startswith("p") and f.endswith(".jsonl"):
            out[int(f[1:-6])] = os.path.join(path, f)
    if not out:
        raise ValueError(f"no topic partitions (p<N>.jsonl) under {path}")
    return out


# line-count cache: file path -> (inode, bytes_counted, lines). The stream
# reader polls end_offsets() once per micro-batch; without this a capped
# catch-up over a large topic re-reads EVERY byte of every segment on every
# trigger (O(total topic size) per batch). Appends keep the inode, so only
# the appended suffix is counted (O(new bytes)); write_topic publishes by
# rename (new inode), which forces a full recount of that file.
_COUNT_CACHE: dict[str, tuple[int, int, int]] = {}


def _count_lines(f: str) -> int:
    st = os.stat(f)
    ino, size = st.st_ino, st.st_size
    cached = _COUNT_CACHE.get(f)
    if cached and cached[0] == ino and cached[1] == size:
        return cached[2]
    start, lines = (cached[1], cached[2]) if (
        cached and cached[0] == ino and cached[1] < size
    ) else (0, 0)
    with open(f, "rb") as fh:
        fh.seek(start)
        # count only b'\n'-TERMINATED lines: a concurrent append can flush
        # at a buffer boundary mid-record, and iterating lines would count
        # that torn tail as a full line — admitting an offset whose
        # json.loads then fails the micro-batch. A torn tail has no
        # newline yet, so newline-counting never admits it; the resume
        # cursor still advances to EOF, and the record's newline (flushed
        # later) is counted by the next incremental pass.
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            lines += chunk.count(b"\n")
    _COUNT_CACHE[f] = (ino, size, lines)
    return lines


def end_offsets(path: str) -> dict[int, int]:
    """Current end offset (line count) per partition — the topic head.
    Incremental: only bytes appended since the last call are read."""
    return {
        part: _count_lines(f) for part, f in _partition_files(path).items()
    }


def _read_slice(sl: _Slice) -> Iterator[tuple]:
    f = _partition_files(sl.path)[sl.part]
    with open(f) as fh:
        for off, line in enumerate(fh):
            if off >= sl.end:
                break
            if off >= sl.start:
                rec = json.loads(line)
                yield (
                    rec.get("key"),
                    rec["value"],
                    rec.get("timestamp"),
                    sl.part,
                    off,
                )


def _plan(path: str, start: dict, end: dict) -> list[_Slice]:
    return [
        _Slice(path, int(p), int(start.get(str(p), start.get(p, 0))), e)
        for p, e in ((int(k), int(v)) for k, v in end.items())
        if e > int(start.get(str(p), start.get(p, 0)))
    ]


def _as_strkeys(d: dict) -> dict:
    # JSON round-trips offset dict keys to strings; store them that way
    return {str(k): int(v) for k, v in d.items()}


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        heads = end_offsets(self.path)
        return _plan(self.path, {}, heads)

    def read(self, partition: _Slice) -> Iterator[tuple]:
        return _read_slice(partition)


class _StreamReader(DataSourceStreamReader):
    """Offset = {"<partition>": next unread offset}. latestOffset advances
    each partition toward the head, admitting at most maxOffsetsPerTrigger
    rows TOTAL per micro-batch (round-robin across partitions, the Kafka
    source's proportional-admission shape) — a long catch-up becomes many
    bounded batches and then seamlessly becomes the tail (ST1 cutover is
    source semantics, not application logic)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        cap = options.get("maxoffsetspertrigger")
        self.max_offsets = int(cap) if cap is not None else None
        self._last: dict[str, int] = {}

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in _partition_files(self.path)}

    def latestOffset(self) -> dict:
        heads = _as_strkeys(end_offsets(self.path))
        pos = {p: self._last.get(p, 0) for p in heads}
        if self.max_offsets is None:
            nxt = heads
        else:
            budget = self.max_offsets
            nxt = dict(pos)
            # round-robin one row at a time would be O(budget); chunked
            # equal split converges in <= 2 passes for any skew
            while budget > 0:
                behind = [p for p in nxt if nxt[p] < heads[p]]
                if not behind:
                    break
                share = max(1, budget // len(behind))
                for p in behind:
                    take = min(share, heads[p] - nxt[p], budget)
                    nxt[p] += take
                    budget -= take
                    if budget == 0:
                        break
        self._last = {p: max(self._last.get(p, 0), v) for p, v in nxt.items()}
        return nxt

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # resync the admission anchor with the engine's offsets (restart /
        # in-flight replay, where initialOffset is not consulted). START
        # matters too: after a clean-stop restart with a trigger cap, the
        # fresh reader's first latestOffset() regresses below the
        # checkpointed position (its anchor is empty) — maxing with start
        # re-pins the anchor at the checkpoint so the regression costs at
        # most ONE empty batch instead of a cap-sized climb from 0.
        for d in (start, end):
            for p, v in _as_strkeys(d).items():
                self._last[p] = max(self._last.get(p, 0), v)
        return _plan(self.path, _as_strkeys(start), _as_strkeys(end))

    def read(self, partition: _Slice) -> Iterator[tuple]:
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        for p, v in _as_strkeys(end).items():
            self._last[p] = max(self._last.get(p, 0), v)


class TopicLogDataSource(DataSource):
    """``format("topiclog")`` — options: path (required),
    maxOffsetsPerTrigger (stream only)."""

    @classmethod
    def name(cls) -> str:
        return "topiclog"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def _partition_records(
    rows: Sequence[tuple], n_partitions: int
) -> dict[int, list[str]]:
    """The keyed-partitioner contract shared by write_topic and
    append_topic: partition = crc32(key) % n (None-keyed records go to
    partition 0), record encoded as one JSON line. ONE implementation —
    a divergence between the seed write and the live-tail append would
    silently split a key's records across partitions."""
    import zlib

    buf: dict[int, list[str]] = {}
    for key, value, ts in rows:
        p = (
            zlib.crc32(str(key).encode()) % n_partitions
            if key is not None
            else 0
        )
        buf.setdefault(p, []).append(
            json.dumps({"key": key, "value": value, "timestamp": ts})
        )
    return buf


def write_topic(rows: Sequence[tuple], path: str, n_partitions: int = 4) -> None:
    """Fixture/ingest helper: lay ``rows`` of (key, value_json, timestamp)
    out as a topic — partition by hash(key) % n (Kafka's default sticky
    keyed partitioner shape, so one key's records stay ordered within one
    partition), offsets in arrival order. Files are written to temp names
    and os.rename()d so a concurrent reader never sees a torn segment."""
    os.makedirs(path, exist_ok=True)
    buf = _partition_records(rows, n_partitions)
    for p in range(n_partitions):
        lines = buf.get(p, [])
        tmp = os.path.join(path, f".p{p}.jsonl.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        os.rename(tmp, os.path.join(path, f"p{p}.jsonl"))


def append_topic(rows: Sequence[tuple], path: str, n_partitions: int = 4) -> None:
    """Append more (key, value_json, timestamp) records to an existing
    topic — the live-tail half of an ST1 catch-up/cutover test. Appends
    are whole-line writes flushed per partition; offsets keep growing."""
    for p, lines in _partition_records(rows, n_partitions).items():
        with open(os.path.join(path, f"p{p}.jsonl"), "a") as fh:
            fh.write("\n".join(lines) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
