"""Schema-drift regression tests for the events scan layer.

Round 4 postmortem: the driver regenerated events.parquet, switching the
``ts`` column from TIMESTAMP(NANOS) (read as long nanos under the
``nanosAsLong`` legacy conf) to plain timestamp[us]. The loader's
unconditional ``timestamp_micros(ts div 1000)`` shim then either raised
DATATYPE_MISMATCH (batch) or silently collapsed every event time to ~1970
(streaming — the hard-coded ``ts long`` stream schema *ran* against micros
data). These tests pin the invariant: both encodings of the same logical
data must load to identical event-times, through both the batch loader and
the streaming reader.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pasardassist_spark.streaming.ingest import read_event_stream
from pasardassist_spark.tables import load

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 15, 12, 34, 56, 789000),
    datetime.datetime(2024, 1, 30, 23, 59, 59, 123456),
]


def _write_fixture(tmp_path, encoding: str) -> str:
    """Write a tiny events.parquet with ts encoded as requested."""
    sf_dir = tmp_path / encoding
    sf_dir.mkdir()
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["sale", "bid", "sale"], pa.string()),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(['{"a":1}', "{}", "{}"], pa.string()),
    }
    if encoding == "nanos":
        ts = pa.array(_TS, pa.timestamp("ns"))
    elif encoding == "int32":
        # A drifted upstream writing epoch-seconds as int32 — an encoding
        # the loader must REFUSE, not guess at.
        ts = pa.array(
            [int(t.replace(tzinfo=datetime.timezone.utc).timestamp()) for t in _TS],
            pa.int32(),
        )
    else:
        ts = pa.array(_TS, pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": cols["event_id"],
            "ts": ts,
            "user_id": cols["user_id"],
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }
    )
    # version>=2.6 preserves TIMESTAMP(NANOS) in the parquet logical type
    # instead of down-casting to micros — the encoding older driver
    # generations shipped.
    pq.write_table(table, sf_dir / "events.parquet", version="2.6")
    return str(sf_dir)


@pytest.fixture(scope="module")
def both_encodings(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("events_encodings")
    return _write_fixture(tmp, "nanos"), _write_fixture(tmp, "micros")


def _footer_type(sf_dir: str) -> str:
    return str(pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type)


def test_fixture_encodings_actually_differ(both_encodings):
    nanos_dir, micros_dir = both_encodings
    assert _footer_type(nanos_dir) == "timestamp[ns]"
    assert _footer_type(micros_dir) == "timestamp[us]"


def test_batch_load_identical_event_times(spark, both_encodings):
    nanos_dir, micros_dir = both_encodings
    got = {}
    for label, d in [("nanos", nanos_dir), ("micros", micros_dir)]:
        df = load(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", label
        got[label] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
    assert got["nanos"] == got["micros"]
    # And the values are the real event times, not a unit-error artifact.
    assert [t for _, t in got["micros"]] == _TS


def test_stream_read_identical_event_times(spark, both_encodings, tmp_path):
    nanos_dir, micros_dir = both_encodings
    got = {}
    for label, d in [("nanos", nanos_dir), ("micros", micros_dir)]:
        out = tmp_path / f"out_{label}"
        chk = tmp_path / f"chk_{label}"
        stream = read_event_stream(spark, d, max_files_per_trigger=10)
        assert dict(stream.dtypes)["ts"] == "timestamp", label
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        df = spark.read.parquet(str(out))
        got[label] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
    assert got["nanos"] == got["micros"]
    assert [t for _, t in got["micros"]] == _TS


def test_unknown_ts_encoding_raises(spark, tmp_path):
    """An unrecognized ts dtype (int32 epoch-seconds here) must fail loudly
    at the scan layer, naming the dtype — never flow through silently."""
    d = _write_fixture(tmp_path, "int32")
    with pytest.raises(TypeError, match="int"):
        load(spark, d, "events")


def test_jsonl_permissive_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE mode must parse the good lines and route malformed ones
    to _corrupt_record (the DLQ ingest path); FAILFAST must raise on the
    same input."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pasardassist_spark.sources.textio import read_jsonl

    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows = read_jsonl(spark, str(p), schema, mode="PERMISSIVE").collect()
    good = {(r.doc_id, r.text) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {(1, "ok"), (2, "also ok")}
    assert bad == ["this is not json"]

    with pytest.raises(Exception) as ei:
        read_jsonl(spark, str(p), schema, mode="FAILFAST").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_csv_permissive_quarantines_corrupt_rows(spark, tmp_path):
    """CSV twin of the JSONL DLQ test: rows whose values cannot take the
    declared types land in _corrupt_record under PERMISSIVE; FAILFAST
    raises on the same file. Also pins the quoting dialect: an embedded
    newline inside a quoted field is ONE row, not two."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pasardassist_spark.sources.textio import read_csv

    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,text\n"
        '1,"line one\nline two"\n'
        "not_a_number,boom\n"
        '2,"quoted ""inner"" text"\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows = read_csv(spark, str(p), schema, mode="PERMISSIVE").collect()
    good = {(r.doc_id, r.text) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {(1, "line one\nline two"), (2, 'quoted "inner" text')}
    assert len(bad) == 1 and "not_a_number" in bad[0]

    with pytest.raises(Exception) as ei:
        read_csv(spark, str(p), schema, mode="FAILFAST").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
