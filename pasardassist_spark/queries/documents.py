"""Document-format extraction queries: PDF and DOCX text recovery as a
distributed transcode stage.

A real 100 TB training-data crawl is dominated by PDF and Office
documents; extraction is a pure map pass (no shuffle) that runs at input
bandwidth.  Spark-side both stages are Arrow-batched ``mapInPandas`` over
binary payload columns — the plan is scan → project → mapInPandas, one
stage, no exchange (same shape as the image decode family,
queries/multimodal.py).

Fixture-synthesis pattern (operators/gifcodec.py precedent): every
document's OWN text is split into pages/paragraphs by closed-form
character arithmetic, written into a GENUINE container (conforming
PDF-1.4 with Flate streams and a classic xref; conforming OPC/
WordprocessingML zip), then parsed back by the real extractor.  The
DuckDB oracle re-derives each page's length and md5 from the same
substring arithmetic — a lost escape, a mis-walked page tree, or a
dropped run mismatches the hash on 500 real files.

Reference parity: the reference treats fetched documents as opaque
payload + typed metadata (src/utils/*); this is the transcode stage that
model turns into text (SURVEY §2.10 UDF surface / LLM-pipeline family).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load

_OUT_SCHEMA = (
    "doc_id long, part_no int, n_parts int, n_chars long, part_md5 string"
)


def _split_bounds(length: int, n: int) -> list[tuple[int, int]]:
    """Equal character splits: part p is text[L*p//n : L*(p+1)//n] — the
    exact arithmetic the SQL oracle mirrors with integer division."""
    return [(length * p // n, length * (p + 1) // n) for p in range(n)]


def _extract_rows(
    it: Iterator[pd.DataFrame], n_mod: int, encode, extract
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out: dict[str, list] = {
            "doc_id": [], "part_no": [], "n_parts": [],
            "n_chars": [], "part_md5": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = int(doc_id) % n_mod + 1
            parts = [text[a:b] for a, b in _split_bounds(len(text), n)]
            payload = encode(parts)
            got = extract(payload)
            if len(got) != n:
                # raise, not assert (must survive python -O): a parser
                # regression must fail the task loudly, never emit a
                # plausible wrong row count
                raise ValueError(
                    f"doc {doc_id}: wrote {n} parts, extracted {len(got)}"
                )
            for p, ptxt in enumerate(got):
                out["doc_id"].append(doc_id)
                out["part_no"].append(p)
                out["n_parts"].append(n)
                out["n_chars"].append(len(ptxt))
                out["part_md5"].append(
                    hashlib.md5(ptxt.encode("utf-8")).hexdigest()
                )
        yield pd.DataFrame(out)


def _oracle(n_mod: int) -> str:
    # DuckDB: // is floor division; substring() is 1-based character
    # semantics, matching Python code-point slicing.
    return f"""
    WITH base AS (
        SELECT doc_id, text, length(text) AS L,
               doc_id % {n_mod} + 1 AS n
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
               CAST(p.p AS INTEGER) AS part_no,
               CAST(n AS INTEGER) AS n_parts,
               substring(text, CAST((L * p.p) // n AS INTEGER) + 1,
                         CAST((L * (p.p + 1)) // n - (L * p.p) // n
                              AS INTEGER)) AS ptxt
        FROM base
        JOIN (SELECT unnest(range(0, {n_mod})) AS p) p ON p.p < n
    )
    SELECT doc_id, part_no, n_parts,
           CAST(length(ptxt) AS BIGINT) AS n_chars,
           md5(ptxt) AS part_md5
    FROM parts
    """


@query("doc_pdf_extract", oracle=_oracle(3))
def doc_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF text extraction end-to-end (operators/pdftext.py): each
    document's text is split into doc_id%3+1 pages, written as a
    conforming PDF-1.4 (classic xref table, indirect /Length refs,
    FlateDecode content streams alternating Tj and kerning-array TJ show
    operators, octal-escaped non-ASCII), then re-extracted the conforming
    way — startxref → xref → trailer → catalog → page tree → content
    streams.  The oracle re-derives every page's length and md5 from
    substring arithmetic, so any parser defect (xref offset, escape
    decode, page order, TJ handling) hash-mismatches on 500 real PDFs.
    Encrypted PDFs / xref streams / non-Flate filters raise by name
    (module docstring); error paths pytest-pinned in
    tests/test_docformats.py."""
    from pasardassist_spark.operators.pdftext import encode_pdf, extract_pdf_pages

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        lambda it: _extract_rows(it, 3, encode_pdf, extract_pdf_pages),
        _OUT_SCHEMA,
    )


@query("doc_docx_extract", oracle=_oracle(4))
def doc_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DOCX text extraction end-to-end (operators/docxtext.py): each
    document's text becomes doc_id%4+1 paragraphs of a conforming OPC
    package (the main part located via the _rels/.rels officeDocument
    relationship, not a hard-coded path), paragraphs written as multiple
    split w:r runs with xml:space edge cases and real w:tab/w:br elements
    for tab/newline characters; the namespace-aware extractor
    reconstructs each paragraph exactly.  Oracle: same substring + md5
    re-derivation as doc_pdf_extract.  OLE2 .doc and encrypted packages
    raise by name; table-cell flow order pytest-pinned in
    tests/test_docformats.py."""
    from pasardassist_spark.operators.docxtext import (
        encode_docx,
        extract_docx_paragraphs,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        lambda it: _extract_rows(it, 4, encode_docx, extract_docx_paragraphs),
        _OUT_SCHEMA,
    )
