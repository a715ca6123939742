"""XML source/sink contracts (sources/xmlio.py): typed roundtrip with
nulls, escaping symmetry, control-char raise, empty-partition shards."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from pasardassist_spark.sources.xmlio import read_xml, write_xml


def test_typed_roundtrip_with_nulls(spark, tmp_path):
    rows = [
        Row(i=1, s="a <b> & 'c' \"d\"", x=1.5, b=True,
            ts=dt.datetime(2021, 3, 4, 5, 6, 7, 123456)),
        Row(i=2, s=None, x=None, b=False, ts=None),
        Row(i=3, s="]]> tail", x=-0.25, b=None,
            ts=dt.datetime(1999, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(
        rows, "i long, s string, x double, b boolean, ts timestamp"
    )
    path = str(tmp_path / "xml")
    manifest = write_xml(df, path).collect()
    assert sum(m.n_records for m in manifest) == 3
    back = read_xml(spark, path, df.schema)
    got = {r.i: r for r in back.collect()}
    assert got[1].s == "a <b> & 'c' \"d\""
    assert got[1].ts == dt.datetime(2021, 3, 4, 5, 6, 7, 123456)
    assert got[2].s is None and got[2].x is None and got[2].ts is None
    assert got[3].s == "]]> tail" and got[3].x == -0.25
    assert got[1].b is True and got[2].b is False and got[3].b is None


def test_control_char_raises_by_name(spark, tmp_path):
    df = spark.createDataFrame([Row(i=1, s="bad \x07 bell")],
                               "i long, s string")
    with pytest.raises(Exception, match="XML 1.0 cannot represent"):
        write_xml(df, str(tmp_path / "bad")).collect()


def test_empty_partitions_leave_no_shards(spark, tmp_path):
    df = spark.createDataFrame([Row(i=1, s="x")], "i long, s string") \
        .repartition(8)
    path = str(tmp_path / "sparse")
    manifest = write_xml(df, path).collect()
    assert len(manifest) == 1  # 7 empty partitions wrote nothing
    back = read_xml(spark, path, df.schema)
    assert back.count() == 1


def test_unknown_elements_ignored(spark, tmp_path):
    df = spark.createDataFrame([Row(i=7, s="keep")], "i long, s string")
    path = str(tmp_path / "xtra")
    write_xml(df, path).collect()
    # read back under a schema missing `s` and adding an absent column
    back = read_xml(spark, path, df.select("i").withColumn(
        "missing", F.lit(None).cast("string")).schema)
    r = back.collect()[0]
    assert r.i == 7 and r.missing is None


def test_malformed_shard_raises_valueerror_not_parseerror(spark, tmp_path):
    """A torn shard must surface the textio ValueError contract, not an
    ElementTree ParseError (which subclasses SyntaxError and would look
    like a code bug to a retry policy)."""
    import os

    df = spark.createDataFrame([Row(i=1, s="x")], "i long, s string")
    path = str(tmp_path / "torn")
    write_xml(df, path).collect()
    shard = os.path.join(path, sorted(os.listdir(path))[0])
    data = open(shard, "rb").read()
    open(shard, "wb").write(data[: len(data) - 15])  # tear off the tail
    with pytest.raises(Exception) as ei:
        read_xml(spark, path, df.schema).collect()
    assert "malformed XML shard" in str(ei.value)
