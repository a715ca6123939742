"""Avro container source/sink (sources/avro.py): value-level roundtrips
across the full supported type surface, corruption detection, and the
distributed write/read path."""

from __future__ import annotations

import io
from collections import namedtuple

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pasardassist_spark.sources.avro import (
    MAGIC,
    read_avro,
    read_container,
    write_avro,
    write_container,
    zigzag_decode,
    zigzag_encode,
)
from pasardassist_spark.tables import load

FIELDS = [
    ("i", LongType()),
    ("s", StringType()),
    ("d", DoubleType()),
    ("b", BinaryType()),
    ("flag", BooleanType()),
    ("ts", TimestampType()),
    ("arr", ArrayType(FloatType())),
]
Row = namedtuple("Row", [n for n, _ in FIELDS])
ROWS = [
    Row(1, "héllo wörld", 3.14159, b"\x00\xff\x7f", True,
        pd.Timestamp("2024-03-01 12:34:56.789123"), [1.5, -2.25]),
    Row(-(2**62), "", 0.0, b"", False,
        pd.Timestamp("1969-12-31 23:59:59"), []),
    Row(None, None, None, None, None, None, None),
]


def _blob(codec: str) -> bytes:
    buf = io.BytesIO()
    n, nb = write_container(buf, FIELDS, iter(ROWS), codec=codec)
    assert n == len(ROWS) and nb == len(buf.getvalue())
    return buf.getvalue()


def test_zigzag_roundtrip_edges():
    for n in [0, -1, 1, 63, -64, 64, 2**40, -(2**40), 2**63 - 1, -(2**63)]:
        b = zigzag_encode(n)
        v, p = zigzag_decode(b, 0)
        assert v == n and p == len(b)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    out = list(read_container(_blob(codec), FIELDS))
    assert len(out) == 3
    a = out[0]
    assert a["i"] == 1 and a["s"] == "héllo wörld"
    assert a["b"] == b"\x00\xff\x7f" and a["flag"] is True
    assert a["ts"] == pd.Timestamp("2024-03-01 12:34:56.789123")
    assert a["arr"] == [1.5, -2.25]
    assert out[1]["i"] == -(2**62) and out[1]["arr"] == []
    assert out[1]["ts"] == pd.Timestamp("1969-12-31 23:59:59")
    assert all(v is None for v in out[2].values())


def test_container_rejects_corruption():
    blob = _blob("deflate")
    with pytest.raises(ValueError, match="magic"):
        list(read_container(b"Nope" + blob[4:], FIELDS))
    # flip a byte inside the first block's sync marker (last 16 bytes)
    bad_sync = blob[:-16] + bytes([blob[-16] ^ 0xFF]) + blob[-15:]
    with pytest.raises(ValueError, match="sync"):
        list(read_container(bad_sync, FIELDS))
    wrong_fields = [("renamed", LongType())] + FIELDS[1:]
    with pytest.raises(ValueError, match="fields"):
        list(read_container(blob, wrong_fields))


def test_container_unknown_codec_refused():
    buf = io.BytesIO()
    with pytest.raises(ValueError, match="codec"):
        write_container(buf, FIELDS, iter(ROWS), codec="snappy")


def test_block_framing_starts_with_magic_and_honours_block_rows():
    blob = _blob("null")
    assert blob[:4] == MAGIC
    # 3 rows < BLOCK_ROWS => exactly one data block => exactly 2 syncs
    from pasardassist_spark.sources.avro import SYNC

    assert blob.count(SYNC) == 2


def test_distributed_roundtrip_documents(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "avro_docs")
    manifest = write_avro(d.repartition(4, "doc_id"), path, codec="deflate").collect()
    assert sum(m.n_records for m in manifest) == d.count()
    back = read_avro(spark, path, d.schema)
    assert back.schema == d.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_distributed_roundtrip_embeddings_arrays(spark, sf_dir, tmp_path):
    """array<float> columns survive the block encoding distributed."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    path = str(tmp_path / "avro_emb")
    write_avro(e.repartition(4, "vec_id"), path, codec="null").collect()
    back = read_avro(spark, path, e.schema)
    orig = {r.vec_id: list(r.embedding) for r in e.collect()}
    got = {r.vec_id: list(r.embedding) for r in back.collect()}
    assert orig.keys() == got.keys()
    for k in orig:
        assert orig[k] == pytest.approx(got[k], abs=1e-6)


def test_reader_schema_type_mismatch_fails_loudly(spark, sf_dir, tmp_path):
    """A reader schema whose TYPES disagree with the writer schema must
    raise a structural error, never desync the byte stream (the label
    column here is int in parquet; reading it as string would otherwise
    misparse every subsequent field)."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    path = str(tmp_path / "avro_mismatch")
    write_avro(e.repartition(2, "vec_id"), path, codec="null").collect()
    wrong = StructType(
        [
            StructField("vec_id", LongType(), True),
            StructField("embedding", ArrayType(FloatType(), True), True),
            StructField("label", StringType(), True),
        ]
    )
    with pytest.raises(Exception, match="writer fields"):
        read_avro(spark, path, wrong).collect()


# ------------------------------------------------ property-based roundtrip

from hypothesis import given, settings, strategies as st  # noqa: E402

_scalar_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
        ),
        st.one_of(st.none(), st.binary(max_size=40)),
        st.one_of(st.none(), st.booleans()),
        st.one_of(
            st.none(),
            st.lists(
                st.floats(
                    allow_nan=False, allow_infinity=False, width=32
                ),
                max_size=8,
            ),
        ),
    ),
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(rows=_scalar_rows, codec=st.sampled_from(["null", "deflate"]))
def test_container_roundtrip_property(rows, codec):
    """Arbitrary values across the scalar surface survive the container
    byte-for-byte (floats exactly: IEEE doubles round-trip through the
    8-byte encoding; float32 arrays through the 4-byte encoding)."""
    import io
    from collections import namedtuple

    import numpy as np

    fields = [
        ("i", LongType()),
        ("s", StringType()),
        ("d", DoubleType()),
        ("b", BinaryType()),
        ("flag", BooleanType()),
        ("arr", ArrayType(FloatType())),
    ]
    R = namedtuple("R", [n for n, _ in fields])
    data = [R(*r) for r in rows]
    buf = io.BytesIO()
    n, _ = write_container(buf, fields, iter(data), codec=codec)
    assert n == len(data)
    out = list(read_container(buf.getvalue(), fields))
    assert len(out) == len(data)
    for orig, got in zip(data, out):
        assert got["i"] == orig.i
        assert got["s"] == orig.s
        assert got["d"] == orig.d  # exact: 8-byte IEEE
        assert got["b"] == orig.b
        assert got["flag"] is orig.flag or got["flag"] == orig.flag
        if orig.arr is None:
            assert got["arr"] is None
        else:
            want = [float(np.float32(v)) for v in orig.arr]
            assert got["arr"] == want  # exact at float32 precision
