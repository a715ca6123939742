"""Arrow IPC connector (sources/arrowipc.py): type-fidelity matrix,
shard/manifest contract, and the explicit-schema validation."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from pasardassist_spark.sources.arrowipc import (
    read_arrow_ipc,
    write_arrow_ipc,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("f", T.FloatType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("day", T.DateType()),
        T.StructField("arr", T.ArrayType(T.DoubleType())),
    ]
)


def _rows():
    return [
        Row(
            id=1,
            i=7,
            d=3.5,
            f=2.25,
            s="héllo \n \"quoted\"",
            b=True,
            raw=b"\x00\xffbin",
            ts=datetime.datetime(2025, 3, 1, 12, 30, 45, 123456),
            day=datetime.date(2024, 2, 29),
            arr=[1.5, -2.0, 0.0],
        ),
        Row(
            id=2,
            i=None,
            d=-0.0,
            f=None,
            s=None,
            b=False,
            raw=None,
            ts=None,
            day=None,
            arr=None,
        ),
    ]


def test_roundtrip_type_matrix(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    tmp = tempfile.mkdtemp(prefix="arrowipc_t_")
    try:
        man = write_arrow_ipc(df.repartition(2, "id"), tmp).collect()
        assert sum(m.n_records for m in man) == 2
        back = read_arrow_ipc(spark, tmp, SCHEMA)
        assert back.schema == SCHEMA
        got = sorted(back.collect(), key=lambda r: r["id"])
        exp = sorted(df.collect(), key=lambda r: r["id"])
        assert got == exp
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_empty_partitions_leave_no_shards(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    tmp = tempfile.mkdtemp(prefix="arrowipc_e_")
    try:
        # 8 partitions, 2 rows: at least 6 partitions are empty
        man = write_arrow_ipc(df.repartition(8), tmp).collect()
        shards = [f for f in os.listdir(tmp) if f.endswith(".arrow")]
        assert len(shards) == len(man) <= 2
        assert all(m.n_bytes > 0 for m in man)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_schema_mismatch_raises(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    tmp = tempfile.mkdtemp(prefix="arrowipc_m_")
    try:
        write_arrow_ipc(df.coalesce(1), tmp).collect()
        wrong = T.StructType([T.StructField("nope", T.LongType())])
        with pytest.raises(Exception, match="does not match"):
            read_arrow_ipc(spark, tmp, wrong).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_unsupported_type_raises(spark):
    df = spark.createDataFrame(
        [Row(m={"a": 1})],
        T.StructType(
            [T.StructField("m", T.MapType(T.StringType(), T.LongType()))]
        ),
    )
    with pytest.raises(ValueError, match="unsupported Spark type"):
        write_arrow_ipc(df, tempfile.mkdtemp(prefix="arrowipc_u_"))
