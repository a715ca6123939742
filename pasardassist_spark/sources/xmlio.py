"""XML record source/sink — the enterprise-interchange format that still
fronts a surprising share of real ingestion feeds (SOAP exports, sitemap
dumps, library/patent corpora).  Stdlib only (xml.etree + sax escaping),
from the public XML 1.0 specification.

Container layout: one ``.xml`` shard per partition, a single ``<records>``
root, one ``<r>`` element per row, one child element per non-null column
(``<doc_id>7</doc_id>``); NULL columns are omitted and reconstructed as
nulls on read.  Text content is entity-escaped (&amp; &lt; &gt;); XML 1.0
cannot represent most C0 control characters AT ALL (not even as numeric
references), so the writer raises by name on them rather than silently
corrupting — the caller strips or base64s such rows first (the documented
seam, same discipline as the codec families).

Scale shape mirrors sources/avro.py: write = shard per partition with
manifest rows back (no driver funnel); read = binaryFile scan, one task
per shard, iterparse streaming so task memory is O(row), with values
converted under an EXPLICIT schema (textio's never-infer contract).
"""

from __future__ import annotations

import os
import re
from typing import Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

MANIFEST_SCHEMA = "file string, n_records long, n_bytes long"

# XML 1.0 Char production: #x9 | #xA | #xD | [#x20-#xD7FF] | ...
_XML_ILLEGAL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _cell_to_text(v, dtype) -> str:
    if isinstance(dtype, TimestampType):
        return pd.Timestamp(v).isoformat()
    if isinstance(dtype, BooleanType):
        return "true" if v else "false"
    s = str(v)
    if _XML_ILLEGAL.search(s):
        raise ValueError(
            "XML 1.0 cannot represent C0 control characters; "
            "strip or encode the column before write_xml"
        )
    return escape(s)


def _text_to_cell(s: str, dtype):
    if isinstance(dtype, (LongType, IntegerType)):
        return int(s)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(s)
    if isinstance(dtype, BooleanType):
        return s == "true"
    if isinstance(dtype, TimestampType):
        return pd.Timestamp(s)
    return s


def write_xml(df: DataFrame, path: str, root: str = "records") -> DataFrame:
    """Distributed XML export: one shard per partition, manifest rows
    back (the avro.py/warc.py contract); empty partitions leave no file."""
    os.makedirs(path, exist_ok=True)
    fields = [(f.name, f.dataType) for f in df.schema.fields]

    def _write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.xml")
        n_rec = 0
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write(f'<?xml version="1.0" encoding="UTF-8"?>\n<{root}>\n')
            for batch in it:
                for row in batch.itertuples(index=False):
                    parts = ["<r>"]
                    for (name, dtype), v in zip(fields, row):
                        if v is None or v is pd.NaT or (
                            isinstance(v, float) and v != v
                        ):
                            continue
                        parts.append(
                            f"<{name}>{_cell_to_text(v, dtype)}</{name}>"
                        )
                    parts.append("</r>\n")
                    fh.write("".join(parts))
                    n_rec += 1
            fh.write(f"</{root}>\n")
        if n_rec == 0:
            os.remove(fname)
            return
        yield pd.DataFrame(
            {
                "file": [fname],
                "n_records": [n_rec],
                "n_bytes": [os.path.getsize(fname)],
            }
        )

    return df.mapInPandas(_write, MANIFEST_SCHEMA)


def read_xml(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Distributed XML read under an EXPLICIT schema: binaryFile scan,
    one task per shard, iterparse streaming (the parser frees each
    ``<r>`` element after yielding it, so task memory is O(row) even on
    multi-GB shards).  Unknown child elements are ignored; missing ones
    become nulls."""
    import io

    blobs = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.xml"))
        .select("content")
    )
    names = [f.name for f in schema.fields]
    dtypes = {f.name: f.dataType for f in schema.fields}

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for blob in batch["content"]:
                stream = io.BytesIO(bytes(blob))
                try:
                    for _, elem in ET.iterparse(stream, events=("end",)):
                        if elem.tag != "r":
                            continue
                        row = {}
                        for child in elem:
                            if child.tag in dtypes:
                                row[child.tag] = _text_to_cell(
                                    child.text or "", dtypes[child.tag]
                                )
                        rows.append([row.get(n) for n in names])
                        elem.clear()
                except ET.ParseError as exc:
                    # ParseError subclasses SyntaxError, not ValueError —
                    # normalize so callers see the textio error contract
                    raise ValueError(f"malformed XML shard: {exc}") from exc
            if rows:
                yield pd.DataFrame(rows, columns=names)

    return blobs.mapInPandas(_parse, schema)
