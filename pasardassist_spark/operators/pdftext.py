"""PDF text extraction — pure-stdlib parser for the format that dominates
real document crawls.

Reference parity: the reference pipeline treats fetched documents as opaque
payloads plus typed metadata (src/utils/*, collection feed handling); text
extraction is the transcode stage a 100 TB training-data crawl runs as a
map pass.  Spark-side the operator is an Arrow-batched ``mapInPandas``
(queries/multimodal.py / queries/curation.py precedent); this module is the
per-payload codec, same seam as operators/imagecodec.py.

What is REAL here (no fixture shortcuts):

- a classic cross-reference-table parser (``startxref`` → ``xref`` sections
  → ``trailer``, following ``/Prev`` chains), so objects are located the
  way a conforming reader locates them — not by regex-scanning the file;
- a recursive-descent parser for the full PDF object syntax: dictionaries,
  arrays, names (with ``#xx`` escapes), numbers, literal strings (all
  escape forms incl. octal and line continuations), hex strings, booleans,
  null, and indirect references;
- the document structure walk: trailer ``/Root`` → catalog ``/Pages`` →
  page-tree recursion (interior ``/Pages`` nodes with ``/Kids``) →
  per-page ``/Contents`` (single stream or array), with indirect
  references resolved anywhere they may appear (including ``/Length``);
- ``FlateDecode`` stream decompression (zlib) and the content-stream text
  operators: ``Tj``, ``'``, ``"`` and the kerning-array form ``TJ``.

Extraction semantics: text chunks are emitted in content-stream order and
concatenated WITHOUT injected separators — PDF encodes no inherent word
breaks (spaces are either real characters inside the strings or kerning
gaps), and the synthesized-fixture oracle relies on byte-exact
reconstruction.  Positioning operators (``Td``/``TD``/``T*``/``Tm``) are
consumed but deliberately not turned into whitespace heuristics.

Clearly-named seams (real-world variants out of stdlib reach or out of
scope for a text pass): encrypted documents (``/Encrypt``),
cross-reference STREAMS (PDF 1.5+ ``/Type /XRef``; classic tables cover
the fixture surface and most crawl PDFs carry a classic table or hybrid),
and non-Flate filters (DCT/LZW/ASCII85) raise ``NotImplementedError`` by
name.  Malformed structure raises ``ValueError``.

The writer ``encode_pdf`` synthesizes CONFORMING single-font PDFs (catalog,
page tree, Helvetica Type1, Flate-compressed content streams alternating
``Tj``/``TJ`` forms, a correct xref table) so the extractor is exercised
end-to-end on genuine files, the same fixture-synthesis pattern as
operators/gifcodec.py / jpegcodec.py.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf", "extract_pdf_pages", "sniff_pdf"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def sniff_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


# --------------------------------------------------------------- objects --


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


class _Name(str):
    """PDF name object (distinct from strings, which decode to bytes)."""


class _Lexer:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and buf[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_token(self) -> bytes:
        save = self.pos
        tok = self.next_token()
        self.pos = save
        return tok

    def next_token(self) -> bytes:
        self._skip_ws()
        buf, n = self.buf, len(self.buf)
        if self.pos >= n:
            raise ValueError("unexpected end of PDF data")
        c = buf[self.pos]
        if c == 0x3C and self.pos + 1 < n and buf[self.pos + 1] == 0x3C:
            self.pos += 2
            return b"<<"
        if c == 0x3E and self.pos + 1 < n and buf[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if c in b"[]<>(){}/":
            self.pos += 1
            return bytes([c])
        start = self.pos
        while self.pos < n and buf[self.pos] not in _WS and buf[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"bad PDF token at offset {start}")
        return buf[start : self.pos]

    # -- composite values ---------------------------------------------------

    def parse_object(self):
        tok = self.next_token()
        return self._parse_from(tok)

    def _parse_from(self, tok: bytes):
        if tok == b"<<":
            d: dict[str, object] = {}
            while True:
                t = self.next_token()
                if t == b">>":
                    return d
                if t != b"/":
                    raise ValueError(f"expected name key in dict, got {t!r}")
                key = self._parse_name()
                d[key] = self.parse_object()
        if tok == b"[":
            arr = []
            while True:
                self._skip_ws()
                if self.buf[self.pos] == 0x5D:  # ']'
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if tok == b"/":
            return self._parse_name()
        if tok == b"(":
            return self._parse_literal_string()
        if tok == b"<":
            return self._parse_hex_string()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        # number, possibly an indirect reference "N G R"
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            raise ValueError(f"unexpected PDF token {tok!r}") from None
        save = self.pos
        try:
            t2 = self.next_token()
            if re.fullmatch(rb"\d+", t2):
                t3 = self.next_token()
                if t3 == b"R":
                    return _Ref(num)
        except ValueError:
            pass
        self.pos = save
        return num

    def _parse_name(self) -> _Name:
        buf, n = self.buf, len(self.buf)
        start = self.pos
        while self.pos < n and buf[self.pos] not in _WS and buf[self.pos] not in _DELIM:
            self.pos += 1
        raw = buf[start : self.pos]
        # '#xx' escapes
        out = bytearray()
        i = 0
        while i < len(raw):
            if raw[i] == 0x23 and i + 2 < len(raw):
                out.append(int(raw[i + 1 : i + 3], 16))
                i += 3
            else:
                out.append(raw[i])
                i += 1
        return _Name(out.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = buf[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = buf[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = [e]
                    for _ in range(2):
                        if self.pos < n and 0x30 <= buf[self.pos] <= 0x37:
                            oct_digits.append(buf[self.pos])
                            self.pos += 1
                        else:
                            break
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and buf[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:  # '(' balanced nesting
                depth += 1
                out.append(c)
            elif c == 0x29:  # ')'
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise ValueError("unterminated PDF literal string")

    def _parse_hex_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        digits = bytearray()
        while self.pos < n:
            c = buf[self.pos]
            self.pos += 1
            if c == 0x3E:  # '>'
                if len(digits) % 2:
                    digits.append(0x30)  # spec: odd count pads with 0
                return bytes.fromhex(digits.decode("ascii"))
            if c in _WS:
                continue
            digits.append(c)
        raise ValueError("unterminated PDF hex string")


# ------------------------------------------------------------ document ----


class _Document:
    def __init__(self, payload: bytes):
        self.buf = payload
        self.offsets: dict[int, int] = {}
        self.trailer: dict[str, object] = {}
        self._cache: dict[int, object] = {}
        self._parse_xref_chain()
        if "Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF (/Encrypt) unsupported")

    # -- xref ---------------------------------------------------------------

    def _parse_xref_chain(self) -> None:
        tail = self.buf[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF has no startxref")
        off = int(m.group(1))
        seen = set()
        while True:
            if off in seen:
                raise ValueError("cyclic PDF xref chain")
            seen.add(off)
            trailer = self._parse_xref_section(off)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            prev = trailer.get("Prev")
            if prev is None:
                return
            off = int(prev)  # type: ignore[arg-type]

    def _parse_xref_section(self, off: int) -> dict[str, object]:
        lex = _Lexer(self.buf, off)
        tok = lex.next_token()
        if tok != b"xref":
            # an object at the xref offset => PDF 1.5 cross-reference stream
            if re.fullmatch(rb"\d+", tok):
                raise NotImplementedError(
                    "cross-reference streams (PDF 1.5 /Type /XRef) unsupported"
                )
            raise ValueError(f"expected xref table at offset {off}, got {tok!r}")
        while True:
            tok = lex.next_token()
            if tok == b"trailer":
                break
            start = int(tok)
            count = int(lex.next_token())
            lex._skip_ws()
            for i in range(count):
                entry = self.buf[lex.pos : lex.pos + 20]
                if len(entry) < 18:
                    raise ValueError("truncated xref entry")
                lex.pos += 20 if entry[18:20] in (b"\r\n", b" \n", b" \r") else 18
                num = start + i
                if entry[17:18] == b"n" and num not in self.offsets:
                    self.offsets[num] = int(entry[0:10])
        if lex.next_token() != b"<<":
            raise ValueError("PDF trailer is not a dictionary")
        lex.pos -= 2
        return lex.parse_object()  # type: ignore[return-value]

    # -- objects ------------------------------------------------------------

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get_object(v.num)
        return v

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not in xref table")
        lex = _Lexer(self.buf, off)
        if int(lex.next_token()) != num:
            raise ValueError(f"xref offset for object {num} is wrong")
        lex.next_token()  # generation
        if lex.next_token() != b"obj":
            raise ValueError(f"object {num}: missing 'obj' keyword")
        value = lex.parse_object()
        tok = lex.peek_token()
        if tok == b"stream":
            lex.next_token()
            # spec: 'stream' is followed by CRLF or LF (never bare CR)
            p = lex.pos
            if self.buf[p : p + 2] == b"\r\n":
                p += 2
            elif self.buf[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(value.get("Length"))  # type: ignore[union-attr]
            if not isinstance(length, int):
                raise ValueError(f"object {num}: stream /Length missing")
            data = self.buf[p : p + length]
            if len(data) != length:
                raise ValueError(f"object {num}: truncated stream")
            value = _Stream(value, data)  # type: ignore[assignment]
        self._cache[num] = value
        return value


class _Stream:
    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw

    def decoded(self, doc: _Document) -> bytes:
        filt = doc.resolve(self.dict.get("Filter"))
        if filt is None:
            return self.raw
        filters = filt if isinstance(filt, list) else [filt]
        data = self.raw
        for f in filters:
            f = doc.resolve(f)
            if f == "FlateDecode":
                try:
                    data = zlib.decompress(data)
                except zlib.error as exc:
                    raise ValueError(f"corrupt FlateDecode stream: {exc}") from exc
            else:
                raise NotImplementedError(f"PDF stream filter {f} unsupported")
        return data


# ----------------------------------------------------------- extraction ---


def _walk_pages(doc: _Document, node_ref, out: list[dict], depth: int = 0) -> None:
    if depth > 64:
        raise ValueError("PDF page tree too deep (cycle?)")
    node = doc.resolve(node_ref)
    if not isinstance(node, dict):
        raise ValueError("PDF page-tree node is not a dictionary")
    t = doc.resolve(node.get("Type"))
    if t == "Pages" or (t is None and "Kids" in node):
        kids = doc.resolve(node.get("Kids"))
        if not isinstance(kids, list):
            raise ValueError("PDF /Pages node has no /Kids array")
        for kid in kids:
            _walk_pages(doc, kid, out, depth + 1)
    elif t == "Page":
        out.append(node)
    else:
        raise ValueError(f"unexpected page-tree node type {t!r}")


_TEXT_SHOW_OPS = {b"Tj", b"'", b'"'}


def _page_text(doc: _Document, page: dict) -> str:
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return ""
    streams = contents if isinstance(contents, list) else [contents]
    data = b"".join(
        s.decoded(doc)
        for s in (doc.resolve(x) for x in streams)
        if isinstance(s, _Stream)
    )
    lex = _Lexer(data)
    chunks: list[bytes] = []
    operands: list[object] = []
    while True:
        lex._skip_ws()
        if lex.pos >= len(lex.buf):
            break
        c = lex.buf[lex.pos]
        if c in b"[(</" or (0x30 <= c <= 0x39) or c in b"+-.":
            operands.append(lex.parse_object())
            continue
        op = lex.next_token()
        if op in _TEXT_SHOW_OPS:
            # ' and " take leading number operands; the string is last
            for v in reversed(operands):
                if isinstance(v, bytes):
                    chunks.append(v)
                    break
        elif op == b"TJ":
            for v in operands:
                if isinstance(v, list):
                    chunks.extend(x for x in v if isinstance(x, bytes))
        operands = []
    return b"".join(chunks).decode("utf-8", errors="replace")


def extract_pdf_pages(payload: bytes) -> list[str]:
    """Parse a PDF the conforming way (xref → trailer → catalog → page
    tree → content streams) and return the text of each page in document
    order.  See the module docstring for semantics and named seams."""
    if not sniff_pdf(payload):
        raise ValueError("not a PDF payload")
    doc = _Document(payload)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise ValueError("PDF trailer has no /Root catalog")
    pages: list[dict] = []
    _walk_pages(doc, root.get("Pages"), pages)
    return [_page_text(doc, p) for p in pages]


# --------------------------------------------------------------- writer ---


def _escape_literal(data: bytes) -> bytes:
    out = bytearray()
    for b in data:
        if b in b"()\\":
            out += b"\\" + bytes([b])
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def _content_stream(text: str) -> bytes:
    """Text as lines of <=48 chars, alternating Tj and kerning-array TJ
    show operators with Td line moves — both extractor paths exercised."""
    raw = text.encode("utf-8")
    lines = [raw[i : i + 48] for i in range(0, len(raw), 48)] or [b""]
    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            parts.append(b"0 -14 Td")
        if i % 2 == 0 or len(line) < 2:
            parts.append(b"(" + _escape_literal(line) + b") Tj")
        else:
            mid = len(line) // 2
            parts.append(
                b"[(" + _escape_literal(line[:mid]) + b") -250 ("
                + _escape_literal(line[mid:]) + b")] TJ"
            )
    parts.append(b"ET")
    return b" ".join(parts)


def encode_pdf(pages: list[str]) -> bytes:
    """Write a conforming PDF-1.4: catalog, page tree, one Helvetica font,
    one FlateDecode content stream per page, classic xref table."""
    if not pages:
        raise ValueError("PDF needs at least one page")
    n = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    kids = []
    for i in range(n):
        # page at 4+2i, its content stream at 5+2i, its /Length (kept
        # INDIRECT — exercises ref resolution inside stream dicts) at 4+2n+i
        pnum, cnum, lnum = 4 + 2 * i, 5 + 2 * i, 4 + 2 * n + i
        kids.append(b"%d 0 R" % pnum)
        data = zlib.compress(_content_stream(pages[i]), 6)
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % cnum
        )
        objs[cnum] = (
            b"<< /Length %d 0 R /Filter /FlateDecode >>\nstream\n" % lnum
            + data
            + b"\nendstream"
        )
        objs[lnum] = b"%d" % len(data)
    objs[2] = (
        b"<< /Type /Pages /Kids [" + b" ".join(kids) + b"] /Count %d >>" % n
    )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    max_num = max(objs)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_off)
    )
    return bytes(out)
