"""FastCDC content-defined chunking (operators/chunking.py)."""

from __future__ import annotations

import random

from pasardassist_spark.operators.chunking import (
    CDC_AVG,
    CDC_MAX,
    CDC_MIN,
    cdc_chunks,
    cdc_chunks_reference,
)


def _payloads():
    rng = random.Random(13)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    yield b""
    yield b"x"
    yield b"a" * 5000  # constant run: gear hash constant, MAX-forced cuts
    yield bytes(rng.randrange(256) for _ in range(10_000))
    yield (" ".join(rng.choice(words) for _ in range(3000))).encode()


def test_vectorized_matches_sequential_reference():
    for data in _payloads():
        assert cdc_chunks(data) == cdc_chunks_reference(data), len(data)


def test_chunk_invariants_cover_and_bound():
    for data in _payloads():
        chunks = cdc_chunks(data)
        # exact cover, in order
        pos = 0
        for start, length, _d in chunks:
            assert start == pos and length > 0
            pos += length
        assert pos == len(data)
        # size bounds: every chunk <= MAX; all but the last >= MIN
        for start, length, _d in chunks[:-1]:
            assert CDC_MIN < length <= CDC_MAX
        if chunks:
            assert chunks[-1][1] <= CDC_MAX


def test_insertion_resynchronizes():
    """One byte inserted at the head shifts offsets but boundaries
    RESYNCHRONIZE: the digest multiset differs only near the edit, and
    the tail chunks are identical — the CDC property fixed blocking
    lacks."""
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(20_000))
    edited = b"Z" + data
    a = [d for _s, _l, d in cdc_chunks(data)]
    b = [d for _s, _l, d in cdc_chunks(edited)]
    # the shared tail must dominate: everything after the first few
    # chunks realigns
    tail = min(len(a), len(b)) - 3
    assert tail > 10
    assert a[-tail:] == b[-tail:]


def test_shared_span_detected_across_offsets():
    """Two payloads sharing a middle run at DIFFERENT offsets share the
    chunks inside the run."""
    rng = random.Random(21)
    shared = bytes(rng.randrange(256) for _ in range(8_000))
    p1 = bytes(rng.randrange(256) for _ in range(3_000)) + shared
    p2 = bytes(rng.randrange(256) for _ in range(5_555)) + shared
    d1 = {d for _s, _l, d in cdc_chunks(p1)}
    d2 = {d for _s, _l, d in cdc_chunks(p2)}
    common = d1 & d2
    # most of the 8 kB shared span (~31 chunks at AVG=256) must collide
    assert len(common) >= 8_000 // CDC_AVG // 2, len(common)


def test_average_chunk_size_near_target():
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(200_000))
    chunks = cdc_chunks(data)
    avg = len(data) / len(chunks)
    assert CDC_AVG * 0.5 <= avg <= CDC_AVG * 2.0, avg


def test_dedup_cdc_chunks_detects_injected_partial_duplicates(spark, sf_dir):
    """The injected splices (doc_id%9==7 carries prev doc's full text
    mid-file at a shifted offset) must light up through the digest
    join: ALL pairs whose shared span is comfortably multi-chunk
    (prev >= 300 chars ~ 10 chunks), and >= 70% overall (very short
    spans may legitimately fail to resynchronize — that IS the
    algorithm's contract, not a bug)."""
    import duckdb

    from pasardassist_spark.queries.registry import all_queries

    rows = all_queries()["dedup_cdc_chunks"](spark, sf_dir).collect()
    byid = {r.doc_id: r for r in rows}
    sizes = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    pairs = [(d - 1, d) for d in byid if d % 9 == 7 and (d - 1) in byid]
    assert len(pairs) >= 20
    lit = [
        (a, b) for a, b in pairs
        if byid[a].dup_bytes > 0 and byid[b].dup_bytes > 0
    ]
    assert len(lit) / len(pairs) >= 0.70, len(lit) / len(pairs)
    big = [(a, b) for a, b in pairs if sizes[a] >= 300]
    assert big and all(
        byid[a].dup_bytes > 0 and byid[b].dup_bytes > 0 for a, b in big
    )
    # coverage bookkeeping: dup bytes never exceed total bytes
    assert all(r.dup_bytes <= r.n_bytes for r in rows)
