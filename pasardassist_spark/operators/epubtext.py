"""EPUB text extraction — the e-book member of the document-format
family (operators/pdftext.py / docxtext.py precedent), fully
stdlib-feasible (zipfile + xml.etree).

What is REAL here (the conforming-consumer path, not shortcuts):

- the OCF container walk: ``mimetype`` validation
  (``application/epub+zip``), ``META-INF/container.xml`` → the rootfile
  that names the OPF package document — never a hard-coded path;
- OPF parsing: the ``manifest`` maps item ids to hrefs (resolved
  relative to the OPF's own directory, as the spec requires), and the
  ``spine``'s ``itemref`` order — NOT zip entry order — defines the
  reading sequence; non-linear spine items (``linear='no'``) are
  skipped like a reading system does;
- XHTML content documents parsed namespace-agnostically: chapter text
  is the concatenation of text nodes under ``<body>``, with
  ``script``/``style`` subtrees excluded and ``<br>`` mapped to
  newline.

Out-of-scope-by-name: DRM-protected containers (``META-INF/
encryption.xml``) raise ``NotImplementedError``; malformed zip/XML
raises ``ValueError``.

The writer synthesizes conforming minimal EPUBs (stored-uncompressed
``mimetype`` first, container.xml, OPF with manifest+spine, one XHTML
file per chapter with split text runs) so the extractor runs on genuine
files end-to-end.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
import xml.etree.ElementTree as ET

__all__ = ["encode_epub", "extract_epub_chapters", "sniff_epub"]

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"


def sniff_epub(payload: bytes) -> bool:
    """EPUB zips conventionally store 'mimetype' first; sniff both the
    zip magic and the uncompressed mimetype bytes near the header."""
    return payload[:4] == b"PK\x03\x04" and b"application/epub+zip" in payload[:100]


def extract_epub_chapters(payload: bytes) -> list[str]:
    """Return the text of each spine chapter in reading order."""
    if payload[:4] != b"PK\x03\x04":
        raise ValueError("not a ZIP-based EPUB payload")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt EPUB zip: {exc}") from exc
    with zf:
        names = set(zf.namelist())
        if "META-INF/encryption.xml" in names:
            raise NotImplementedError("DRM-protected EPUB unsupported")
        if "mimetype" in names and zf.read("mimetype").strip() != b"application/epub+zip":
            raise ValueError("EPUB mimetype entry is not application/epub+zip")
        if "META-INF/container.xml" not in names:
            raise ValueError("EPUB has no META-INF/container.xml")
        try:
            container = ET.fromstring(zf.read("META-INF/container.xml"))
        except ET.ParseError as exc:
            raise ValueError(f"malformed container.xml: {exc}") from exc
        rootfile = None
        for rf in container.iter(f"{{{_CONTAINER_NS}}}rootfile"):
            rootfile = rf.get("full-path")
            break
        if not rootfile or rootfile not in names:
            raise ValueError("EPUB container names no readable OPF rootfile")
        try:
            opf = ET.fromstring(zf.read(rootfile))
        except ET.ParseError as exc:
            raise ValueError(f"malformed OPF package: {exc}") from exc
        opf_dir = posixpath.dirname(rootfile)
        items: dict[str, str] = {}
        for it in opf.iter(f"{{{_OPF_NS}}}item"):
            iid, href = it.get("id"), it.get("href")
            if iid and href:
                items[iid] = posixpath.normpath(posixpath.join(opf_dir, href))
        chapters: list[str] = []
        for ref in opf.iter(f"{{{_OPF_NS}}}itemref"):
            if ref.get("linear", "yes") == "no":
                continue
            idref = ref.get("idref")
            href = items.get(idref or "")
            if href is None:
                raise ValueError(f"EPUB spine itemref {idref!r} not in manifest")
            if href not in names:
                raise ValueError(f"EPUB manifest href {href!r} missing from zip")
            try:
                doc = ET.fromstring(zf.read(href))
            except ET.ParseError as exc:
                raise ValueError(f"malformed XHTML chapter {href}: {exc}") from exc
            chapters.append(_xhtml_text(doc))
    if not chapters:
        raise ValueError("EPUB spine is empty")
    return chapters


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xhtml_text(root: ET.Element) -> str:
    body = None
    for el in root.iter():
        if _local(el.tag) == "body":
            body = el
            break
    if body is None:
        raise ValueError("XHTML chapter has no body")
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        name = _local(el.tag)
        if name in ("script", "style"):
            if el.tail:
                parts.append(el.tail)
            return
        if name == "br":
            parts.append("\n")
        if el.text:
            parts.append(el.text)
        for child in el:
            walk(child)
        if el.tail:
            parts.append(el.tail)

    if body.text:
        parts.append(body.text)
    for child in body:
        walk(child)
    return "".join(parts)


# --------------------------------------------------------------- writer ---


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _chapter_xhtml(text: str) -> str:
    # split into spans at irregular boundaries; newlines become real <br/>
    runs = []
    for seg in text.split("\n"):
        spans = [seg[i : i + 17] for i in range(0, len(seg), 17)] or [""]
        runs.append("".join(f"<span>{_xml_escape(c)}</span>" for c in spans))
    body = "<br/>".join(runs)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        "<title>c</title><style>span{color:#000}</style>"
        "</head><body>" + body + "</body></html>"
    )


def encode_epub(chapters: list[str]) -> bytes:
    """Write a conforming minimal EPUB: stored mimetype first,
    container.xml, an OPF under OEBPS/ with manifest + spine, one XHTML
    chapter per string (style elements present so the extractor's
    skip-subtree path is exercised on every file)."""
    if not chapters:
        raise ValueError("EPUB needs at least one chapter")
    manifest = "".join(
        f'<item id="c{i}" href="text/c{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" unique-identifier="id">'
        '<metadata><dc:identifier xmlns:dc="http://purl.org/dc/elements/1.1/"'
        ' id="id">x</dc:identifier></metadata>'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<container xmlns="{_CONTAINER_NS}" version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf"'
        ' media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"), "application/epub+zip",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for i, ch in enumerate(chapters):
            zf.writestr(
                f"OEBPS/text/c{i}.xhtml", _chapter_xhtml(ch),
                compress_type=zipfile.ZIP_DEFLATED,
            )
    return buf.getvalue()
