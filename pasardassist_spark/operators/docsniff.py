"""Unified document sniffer — routes an unlabeled payload to its
format family (the dispatch a real crawl pipeline performs before
extraction; image counterpart: operators/imagecodec.py:sniff_format).

Binary formats sniff on magic bytes, with the zip-based pair
disambiguated by container content (EPUB's spec-mandated stored
``mimetype`` entry distinguishes it from OOXML/ODF packages); text
payloads sniff on the RTF magic, then a LaTeX/Markdown heuristic
(LaTeX documents carry backslash control words; Markdown is the
default for plain marked-up text — the same fallback ordering
readability tools use)."""

from __future__ import annotations

import re

__all__ = ["sniff_document"]

_LATEX_HINT = re.compile(
    r"\\(documentclass|begin|section|emph|textbf|usepackage)\b"
)


def sniff_document(payload) -> str:
    """Return one of pdf/docx/epub/odt/rtf/latex/markdown/ics."""
    if isinstance(payload, (bytes, bytearray)):
        data = bytes(payload)
        if data[:5] == b"%PDF-":
            return "pdf"
        if data[:4] == b"PK\x03\x04":
            head = data[:256]
            if b"application/epub+zip" in head:
                return "epub"
            if b"application/vnd.oasis.opendocument.text" in head:
                return "odt"
            return "docx"
        try:
            payload = data.decode("utf-8")
        except UnicodeDecodeError:
            raise ValueError("unrecognized binary document payload") from None
    text = payload.lstrip()
    if text.startswith("{\\rtf"):
        return "rtf"
    if text.startswith("BEGIN:VCALENDAR"):
        return "ics"
    if _LATEX_HINT.search(text):
        return "latex"
    return "markdown"
