"""Custom Python DataSource: a paged block-log connector — the reference's
catch-up/live event scan (paged ``getPastEvents(type, {fromBlock,
toBlock})`` in fixed steps until head, then subscribe — reference
src/modules/tasks/tasks.service.ts:25-26,58-86) re-expressed as a
FIRST-CLASS Spark source instead of driver-side paging loops.

Spark 4's Python DataSource API is exactly the right altitude for this:

- **batch**: ``partitions()`` plans ONE InputPartition PER BLOCK PAGE
  (``step`` blocks each, the reference's 500/2000/2 constants), so the
  backfill that the reference runs as a sequential rate-limited loop
  becomes an embarrassingly parallel scan — every executor pulls its own
  page, and Spark's scheduler IS the pacing (a real deployment sets
  resource-group concurrency instead of sleep()s).
- **streaming**: a ``DataSourceStreamReader`` whose offset is the next
  unread block; each micro-batch covers [start, head) in page-grained
  partitions. Offsets checkpoint through the engine, so catch-up, live
  tail, and crash recovery are ONE code path (ST1/S3 as source
  semantics, not application logic) — the cutover the reference
  hand-rolls (behind > step+1 → backfill, then subscribe) disappears.

The wire protocol is abstracted behind a block-store layout: a directory
of ``blocks-<from>-<to>.json`` files (JSONL, one event per line), which
is what a fixture chain or an RPC dump both look like. A real JSON-RPC
endpoint slots in by replacing ``_read_page``'s file glob with the HTTP
call — partition planning, offsets, and recovery are unchanged (and they
are the hard part).

Register per session:  ``spark.dataSource.register(BlockLogDataSource)``
then ``spark.read.format("blocklog").option("path", dir).load()`` /
``spark.readStream.format("blocklog")...``.

Deployment note: the STREAM reader runs in a dedicated Python runner
process that re-imports this module by name — the package must be on the
workers' ``PYTHONPATH`` (ship the wheel / ``spark.submit.pyFiles``; batch
reads tolerate a driver-only install because the reader pickles by
value).
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

# one event row: (block_number, log_index, event_type, address, payload)
SCHEMA_DDL = (
    "block_number bigint, log_index int, event_type string, "
    "address string, payload string"
)

DEFAULT_STEP = 500  # the reference's ELA page size (tasks.service.ts:25)


class _Page(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start  # inclusive
        self.end = end  # exclusive


def _list_block_files(path: str) -> list[tuple[int, int, str]]:
    """(from_block, to_block_exclusive, file) for every committed block
    file — driver-side METADATA listing, one entry per store file."""
    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith("blocks-") and f.endswith(".json"):
            _, lo, hi = f[: -len(".json")].split("-")
            out.append((int(lo), int(hi), os.path.join(path, f)))
    return out


def head_block(path: str) -> int:
    """The store's head (exclusive): blocks below this are readable."""
    files = _list_block_files(path)
    return max((hi for _, hi, _ in files), default=0)


def _read_page(path: str, start: int, end: int) -> Iterator[tuple]:
    """Yield event tuples with block_number in [start, end). Executor-side:
    touches only files overlapping the page (file ranges are the store's
    zone map). A JSON-RPC deployment replaces this body with one
    getPastEvents(start, end) call."""
    for lo, hi, f in _list_block_files(path):
        if hi <= start or lo >= end:
            continue
        with open(f) as fh:
            for line in fh:
                if not line.strip():
                    continue
                r = json.loads(line)
                if start <= r["block_number"] < end:
                    yield (
                        r["block_number"],
                        r["log_index"],
                        r["event_type"],
                        r.get("address"),
                        json.dumps(r.get("payload", {}), sort_keys=True),
                    )


def _plan_pages(path: str, start: int, end: int, step: int) -> list[_Page]:
    return [
        _Page(path, s, min(s + step, end)) for s in range(start, end, step)
    ]


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.step = int(options.get("step", DEFAULT_STEP))
        self.from_block = int(options.get("fromblock", 0))
        to = options.get("toblock")
        self.to_block = int(to) if to is not None else head_block(self.path)

    def partitions(self) -> Sequence[InputPartition]:
        return _plan_pages(self.path, self.from_block, self.to_block, self.step)

    def read(self, partition: _Page) -> Iterator[tuple]:
        return _read_page(partition.path, partition.start, partition.end)


class _StreamReader(DataSourceStreamReader):
    """Offset = {"block": next unread block}. latestOffset advances to the
    store head; each micro-batch plans page-grained partitions over
    [start, end) — catch-up and tail are the same code."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.step = int(options.get("step", DEFAULT_STEP))
        self.start_block = int(options.get("fromblock", 0))
        # maxBlocksPerTrigger: the reference's step/stepInterval pacing
        # (tasks.service.ts:25-26) as a source-level admission bound —
        # a long catch-up becomes several bounded micro-batches instead
        # of one giant batch (no sleep() calls; per-batch sink commits
        # and state stay small)
        cap = options.get("maxblockspertrigger")
        self.max_blocks = int(cap) if cap is not None else None
        # Cap anchor. A fresh reader after a RESTART does not know the
        # checkpointed position (initialOffset is not called when a
        # checkpoint exists), so the anchor starts at fromBlock and the
        # first post-restart latestOffset may return a value BELOW the
        # checkpoint. That is safe: the engine never plans a batch whose
        # end precedes its start (pinned by
        # tests/test_blocklog_source.py::test_stream_restart_with_cap_no_duplicates),
        # and each subsequent poll advances the anchor by the cap until it
        # passes the checkpoint, when admission resumes. partitions()
        # resyncs the anchor from engine offsets to shortcut that climb.
        # Documented residual (ADVICE r7, accepted): when NO batch is in
        # flight at restart (so partitions() has nothing to resync from),
        # the climb costs up to ceil((checkpoint - fromBlock) / cap) empty
        # polls before new blocks are admitted — bounded staleness, never
        # duplicates or loss. Deployments restarting far from fromBlock
        # should re-point fromBlock near the checkpoint (the option only
        # anchors the cap; the checkpoint still owns the read position).
        self._last = self.start_block

    def initialOffset(self) -> dict:
        return {"block": self.start_block}

    def latestOffset(self) -> dict:
        head = max(head_block(self.path), self.start_block)
        if self.max_blocks is not None:
            head = min(head, self._last + self.max_blocks)
        self._last = max(self._last, head)
        return {"block": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # resync the cap anchor with the ENGINE's offsets (covers restart,
        # incl. replay of an in-flight batch where initialOffset is skipped)
        self._last = max(self._last, start["block"], end["block"])
        return _plan_pages(self.path, start["block"], end["block"], self.step)

    def read(self, partition: _Page) -> Iterator[tuple]:
        return _read_page(partition.path, partition.start, partition.end)

    def commit(self, end: dict) -> None:
        self._last = max(self._last, end["block"])  # store is immutable


class BlockLogDataSource(DataSource):
    """``format("blocklog")`` — options: path (required), step,
    fromBlock, toBlock (batch only; defaults to the store head)."""

    @classmethod
    def name(cls) -> str:
        return "blocklog"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def write_block_page(path: str, from_block: int, to_block: int, events) -> None:
    """Fixture/ingest helper: append one committed page file covering
    [from_block, to_block) — written to a temp name then os.rename()d, so
    readers never see a torn file (the store's commit is the rename)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-blocks-{from_block}-{to_block}.json")
    with open(tmp, "w") as fh:
        for e in events:
            fh.write(json.dumps(e, sort_keys=True) + "\n")
    os.rename(tmp, os.path.join(path, f"blocks-{from_block}-{to_block}.json"))
