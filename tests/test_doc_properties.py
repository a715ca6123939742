"""Hypothesis property tests for the round-12 document codecs:
encode→parse is the identity for every representable input, the QP and
mbox layers are lossless on arbitrary bytes/text, and the parsers never
escape their ValueError/NotImplementedError contracts on junk — the
guarantees the fixture tests sample, proved over generated inputs."""

from __future__ import annotations

import quopri

from hypothesis import given, settings, strategies as st

from pasardassist_spark.operators.emailtext import (
    decode_header_value,
    encode_email,
    encode_header_value,
    encode_mbox,
    format_rfc2822,
    parse_email,
    qp_decode,
    qp_encode,
    split_mbox,
)
from pasardassist_spark.operators.feedtext import parse_rfc822_date
from pasardassist_spark.operators.pptxtext import (
    encode_pptx,
    extract_pptx_slides,
)
from pasardassist_spark.operators.xlsxtext import (
    encode_xlsx,
    extract_xlsx_cells,
)

# XML 1.0 cannot carry control chars; real documents don't either.
# Surrogates excluded (not encodable to utf-8).
xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="\r"
    ),
    max_size=60,
)
body_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\r"
    ),
    max_size=120,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(xml_text, max_size=6))
def test_xlsx_cells_roundtrip_property(cells):
    assert extract_xlsx_cells(encode_xlsx(cells)) == cells


@settings(max_examples=60, deadline=None)
@given(st.lists(xml_text.map(lambda s: s.replace("\t", " ")), max_size=5))
def test_pptx_slides_roundtrip_property(slides):
    assert extract_pptx_slides(encode_pptx(slides)) == slides


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_qp_lossless_on_arbitrary_bytes(data):
    enc = qp_encode(data)
    assert qp_decode(enc) == data
    assert quopri.decodestring(enc.encode()) == data
    assert all(len(line) <= 76 for line in enc.split("\n"))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=200), max_size=5))
def test_mbox_lossless_on_arbitrary_messages(msgs):
    assert split_mbox(encode_mbox(msgs)) == msgs


@settings(max_examples=60, deadline=None)
@given(body_text, st.integers(0, 3), st.integers(0, 2**33))
def test_email_roundtrip_property(body, structure, epoch):
    raw = encode_email("s", epoch, body, structure)
    doc = parse_email(raw)
    assert doc.text == body
    assert doc.date_epoch == epoch


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        max_size=80,
    )
)
def test_encoded_word_header_roundtrip_property(s):
    assert decode_header_value(encode_header_value(s, force=True)) == s


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**35))
def test_rfc2822_date_roundtrip_property(epoch):
    assert parse_rfc822_date(format_rfc2822(epoch)) == epoch


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=120))
def test_parsers_never_escape_error_contract(junk):
    for fn in (extract_xlsx_cells, extract_pptx_slides):
        try:
            fn(junk)
        except (ValueError, NotImplementedError):
            pass
    try:
        parse_email(junk)
    except (ValueError, NotImplementedError, UnicodeDecodeError):
        pass


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        min_size=40, max_size=200,
    )
)
def test_long_encoded_subjects_fold_within_line_limit(s):
    raw = encode_email(s, 1700000123, "b", 1)  # odd structure: B-encoded
    head = raw.split(b"\n\n")[0].decode("utf-8")
    assert all(len(line) <= 78 for line in head.split("\n"))
    assert parse_email(raw).subject == s


def test_metadata_head_text_routes_to_markdown_not_email():
    """Plain text whose head LOOKS like a header block (Title:/Date:
    with an ISO date) must route to markdown — the old sniff sent it to
    parse_email, which raised on the unparseable Date and dead-lettered
    a perfectly extractable payload (round-12 ADVICE)."""
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )

    md = "Title: my notes\nDate: 2024-01-01\n\nthe actual body text here"
    assert sniff_document(md) == "markdown"
    fmt, text = extract_document(md)
    assert fmt == "markdown"
    assert "actual body text" in text

    # genuine mail still sniffs as email: parseable RFC-2822 Date
    mail = (
        "From: a@example.com\n"
        "Date: Mon, 10 Jun 2024 09:00:00 +0000\n"
        "Subject: hi\n"
        "\n"
        "body"
    )
    assert sniff_document(mail) == "email"
    # ...or From + Message-ID without a Date header
    mail2 = (
        "From: a@example.com\n"
        "Message-ID: <x1@example.com>\n"
        "Subject: hi\n"
        "\n"
        "body"
    )
    assert sniff_document(mail2) == "email"


def test_sniffed_email_that_fails_parse_falls_back_to_markdown():
    """From+Message-ID sniffs as email, but parse_email requires a Date
    header — the dispatcher must fall back to the markdown path instead
    of dead-lettering."""
    from pasardassist_spark.operators.docsniff import extract_document

    payload = (
        "From: someone\n"
        "Message-ID: <y2@example.com>\n"
        "\n"
        "recoverable prose body"
    )
    fmt, text = extract_document(payload)
    assert fmt == "markdown"
    assert "recoverable prose body" in text


# ------------------------- adversarial container prefixes (round-13 #8):
# routing must be decided by STRUCTURE at position zero, never by a
# magic-byte string appearing somewhere inside the payload — the
# misrouting class a 100 TB crawl will present.


def test_magic_bytes_mid_file_do_not_hijack_routing():
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )

    for lure in ("%PDF-1.5", "PK\x03\x04", "{\\rtf1 nope}",
                 "BEGIN:VCALENDAR"):
        md = f"plain prose first, then a lure: {lure} and more words after"
        assert sniff_document(md) == "markdown", lure
        fmt, text = extract_document(md)
        assert fmt == "markdown"
        assert "plain prose first" in text


def test_email_with_zip_and_pdf_magic_in_body_routes_as_email():
    """ZIP-in-mbox shape: a genuine message whose BODY carries container
    magic strings must parse as mail, not as a zip/pdf."""
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )

    mail = (
        "From: a@example.com\n"
        "Date: Mon, 10 Jun 2024 09:00:00 +0000\n"
        "Subject: containers\n"
        "\n"
        "attached inline markers PK\x03\x04 and %PDF-1.7 and "
        "\\xd0\\xcf\\x11\\xe0 should not reroute this\n"
    )
    assert sniff_document(mail) == "email"
    fmt, text = extract_document(mail)
    assert fmt == "email"
    assert "should not reroute" in text


def test_binary_junk_with_ole2_magic_mid_payload_is_clean_deadletter():
    """A payload that is neither valid UTF-8 text nor starts with any
    container magic dead-letters with a clean ValueError — it must NOT
    route to ole2 just because the magic appears at offset 10."""
    import pytest

    from pasardassist_spark.operators.docsniff import sniff_document

    payload = b"garbage   " + b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\xff" * 20
    with pytest.raises(ValueError, match="unrecognized binary"):
        sniff_document(payload)


def test_zip_entry_order_does_not_matter_for_ooxml_routing():
    """OOXML routing reads the central directory part roots, so a
    conforming docx whose [Content_Types].xml is NOT the first local
    entry still routes as docx."""
    import io
    import zipfile

    from pasardassist_spark.operators.docsniff import sniff_document
    from pasardassist_spark.operators.docxtext import encode_docx

    src = encode_docx(["some words here"])
    with zipfile.ZipFile(io.BytesIO(src)) as zin:
        items = [(n, zin.read(n)) for n in zin.namelist()]
    # rewrite with entries reversed
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zout:
        for n, blob in reversed(items):
            zout.writestr(n, blob)
    assert sniff_document(buf.getvalue()) == "docx"


def test_pdf_header_required_at_position_zero():
    """Junk-prefixed PDFs (magic within the first KB but not at byte 0)
    are deliberately NOT accepted: xref offsets in such files are
    ambiguous, and guessing corrupts; the dead-letter is clean."""
    import pytest

    from pasardassist_spark.operators.docsniff import sniff_document
    from pasardassist_spark.operators.pdftext import encode_pdf

    payload = b"JUNK" + encode_pdf(["text"])
    with pytest.raises(ValueError, match="unrecognized binary|corrupt"):
        sniff_document(payload)


def test_mbox_like_from_line_then_headers_is_email():
    """An mbox-framed single message (leading 'From ' separator line)
    still parses as mail text after the framing line — the ZIP-in-mbox
    shape where the attachment markers live in the body."""
    from pasardassist_spark.operators.docsniff import sniff_document

    mbox_msg = (
        "Return-Path: <a@example.com>\n"
        "From: a@example.com\n"
        "Date: Mon, 10 Jun 2024 09:00:00 +0000\n"
        "Subject: framed\n"
        "\n"
        "body with PK\x03\x04 marker\n"
    )
    assert sniff_document(mbox_msg) == "email"
