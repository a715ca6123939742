"""MessagePack connector (sources/msgpackio.py): codec width matrix,
roundtrip fidelity, schema contracts, and malformed-stream dead-letters."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.sources.msgpackio import (
    _enc_int,
    _enc_str,
    decode_stream,
    encode_row,
    read_msgpack,
    write_msgpack,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _fields(*pairs):
    return [(_enc_str(n), t) for n, t in pairs]


def test_integer_width_matrix():
    """Every spec width boundary encodes with the expected lead byte
    and roundtrips."""
    cases = [
        (0, 0x00), (127, 0x7F),                      # positive fixint
        (-1, 0xFF), (-32, 0xE0),                     # negative fixint
        (128, 0xCC), (255, 0xCC),                    # uint8
        (256, 0xCD), (65535, 0xCD),                  # uint16
        (65536, 0xCE), (2**32 - 1, 0xCE),            # uint32
        (2**32, 0xCF), (2**63 - 1, 0xCF),            # uint64
        (-33, 0xD0), (-128, 0xD0),                   # int8
        (-129, 0xD1), (-32768, 0xD1),                # int16
        (-32769, 0xD2), (-2**31, 0xD2),              # int32
        (-2**31 - 1, 0xD3), (-2**63, 0xD3),          # int64
    ]
    f = _fields(("v", LongType()))
    for v, lead in cases:
        enc = _enc_int(v)
        assert enc[0] == lead, (v, hex(enc[0]), hex(lead))
        (m,) = decode_stream(encode_row((v,), f))
        assert m["v"] == v


def test_str_and_bin_width_matrix():
    f = _fields(("s", StringType()))
    for n in (0, 31, 32, 255, 256, 65535, 65536):
        s = "x" * n
        (m,) = decode_stream(encode_row((s,), f))
        assert m["s"] == s
    # multi-byte UTF-8 crosses the fixstr boundary by BYTES, not chars
    s = "é" * 20  # 40 bytes -> str8
    (m,) = decode_stream(encode_row((s,), f))
    assert m["s"] == s


def test_roundtrip_documents(spark, sf_dir):
    """Closed loop over the real documents table: values survive."""
    from pasardassist_spark.queries.connectors import src_msgpack_roundtrip
    from pasardassist_spark.tables import load

    back = src_msgpack_roundtrip(spark, sf_dir)
    orig = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    assert back.schema == orig.schema
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, orig.collect()))
    assert a == b


def test_unknown_column_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "x long, y string")
    p = str(tmp_path / "mp")
    write_msgpack(df, p).collect()
    narrower = StructType([StructField("x", LongType())])
    with pytest.raises(Exception, match="unknown.*columns.*\\['y'\\]"):
        read_msgpack(spark, p, narrower).collect()


def test_missing_column_is_null(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "x long, y string")
    p = str(tmp_path / "mp")
    write_msgpack(df, p).collect()
    wider = StructType([
        StructField("x", LongType()),
        StructField("y", StringType()),
        StructField("z", DoubleType()),
    ])
    rows = read_msgpack(spark, p, wider).collect()
    assert rows[0]["z"] is None and rows[0]["x"] == 1


def test_unsupported_type_raises(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<long>")
    with pytest.raises(ValueError, match="unsupported column type"):
        write_msgpack(df, "/tmp/never")


def test_malformed_stream_raises_by_name():
    # ext family (0xd4 fixext1) is outside the row-map contract
    with pytest.raises(ValueError, match="unsupported type byte 0xd4"):
        list(decode_stream(b"\x81\xa1k\xd4\x01\x00"))
    # top-level non-map
    with pytest.raises(ValueError, match="not a row stream"):
        list(decode_stream(b"\x01"))
    # non-string map key
    with pytest.raises(ValueError, match="key is not a string"):
        list(decode_stream(b"\x81\x01\x01"))


def test_nulls_and_bools_roundtrip():
    f = _fields(("b", BooleanType()), ("s", StringType()),
                ("d", DoubleType()))
    (m,) = decode_stream(encode_row((None, None, None), f))
    assert m == {"b": None, "s": None, "d": None}
    (m,) = decode_stream(encode_row((True, "t", 1.5), f))
    assert m == {"b": True, "s": "t", "d": 1.5}
    # float64 is big-endian IEEE per spec
    enc = encode_row((False, "", 2.0), f)
    assert b"\xcb" + struct.pack(">d", 2.0) in enc
