"""ODT (OpenDocument Text) extraction — the LibreOffice/OpenOffice
member of the office trio (DOCX in operators/docxtext.py, RTF in
operators/rtftext.py), stdlib-only (zipfile + xml.etree).

What is REAL here:

- the ODF package walk: ``mimetype`` validation
  (``application/vnd.oasis.opendocument.text``, stored uncompressed
  first per spec) and the content document at ``content.xml`` inside
  ``office:body/office:text``;
- ODF's WHITESPACE MODEL, which differs from OOXML: literal runs of
  more than one space are collapsed by conforming consumers, so
  documents encode them explicitly — ``<text:s text:c='N'/>`` expands
  to N spaces, ``<text:tab/>`` to a tab, ``<text:line-break/>`` to a
  newline; the extractor implements exactly that expansion;
- paragraphs (``text:p``) and headings (``text:h``) in flow order, with
  nested ``text:span`` formatting runs flattened; table cells
  (``table:table-cell``) contribute their paragraphs in flow order.

Encrypted packages (manifest entries carrying ``manifest:encryption-
data``) decrypt through operators/odfcrypt.py — the ODF 1.2
AES-256-CBC + PBKDF2 profile LibreOffice writes by default (sha256-1k
checksum as the password gate) AND the pre-1.2 OpenOffice Blowfish
8-bit-CFB profile (SHA1 start key, SHA1/1K checksum — r15); foreign
algorithms raise ``NotImplementedError`` by name there.  Malformed
zip/XML raises ``ValueError``.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

__all__ = ["encode_odt", "extract_odt_paragraphs", "sniff_odt"]

_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_MANIFEST = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"
_MIME = "application/vnd.oasis.opendocument.text"


def sniff_odt(payload: bytes) -> bool:
    return payload[:4] == b"PK\x03\x04" and _MIME.encode() in payload[:128]


def _parse_encryption_data(man: ET.Element) -> dict[str, dict]:
    """full-path -> odfcrypt attrs for every encrypted manifest entry."""
    out: dict[str, dict] = {}
    for fe in man.findall(f"{{{_MANIFEST}}}file-entry"):
        ed = fe.find(f"{{{_MANIFEST}}}encryption-data")
        if ed is None:
            continue
        path = fe.get(f"{{{_MANIFEST}}}full-path", "")
        alg = ed.find(f"{{{_MANIFEST}}}algorithm")
        kd = ed.find(f"{{{_MANIFEST}}}key-derivation")
        sk = ed.find(f"{{{_MANIFEST}}}start-key-generation")
        if alg is None or kd is None:
            raise ValueError(f"ODF encryption-data for {path!r} torn")
        attrs = {
            "algorithm": alg.get(f"{{{_MANIFEST}}}algorithm-name", ""),
            "iv": alg.get(f"{{{_MANIFEST}}}initialisation-vector", ""),
            "salt": kd.get(f"{{{_MANIFEST}}}salt", ""),
            # LibreOffice's writer default (and odfcrypt._ITERATIONS) is
            # 1024 — a manifest omitting the attribute means 1024, not
            # the PBKDF2-recommended 100k (r15 ADVICE fix)
            "iterations": kd.get(
                f"{{{_MANIFEST}}}iteration-count", "1024"
            ),
            "derivation": kd.get(
                f"{{{_MANIFEST}}}key-derivation-name", ""
            ),
            "checksum_type": ed.get(f"{{{_MANIFEST}}}checksum-type", ""),
            "checksum": ed.get(f"{{{_MANIFEST}}}checksum", ""),
            "size": fe.get(f"{{{_MANIFEST}}}size"),
        }
        if sk is not None:
            attrs["start_key"] = sk.get(
                f"{{{_MANIFEST}}}start-key-generation-name", ""
            )
        out[path] = attrs
    return out


def extract_odt_paragraphs(payload: bytes, password: str = "") -> list[str]:
    if payload[:4] != b"PK\x03\x04":
        raise ValueError("not a ZIP-based ODF payload")
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt ODF zip: {exc}") from exc
    with zf:
        names = set(zf.namelist())
        if "mimetype" in names and zf.read("mimetype").strip() != _MIME.encode():
            raise ValueError("ODF mimetype is not an OpenDocument text")
        encrypted: dict[str, dict] = {}
        if "META-INF/manifest.xml" in names:
            try:
                man = ET.fromstring(zf.read("META-INF/manifest.xml"))
            except ET.ParseError as exc:
                raise ValueError(f"malformed ODF manifest: {exc}") from exc
            encrypted = _parse_encryption_data(man)
        if "content.xml" not in names:
            raise ValueError("ODF package has no content.xml")
        raw = zf.read("content.xml")
        if "content.xml" in encrypted:
            from pasardassist_spark.operators.odfcrypt import (
                odf_decrypt_member,
            )

            raw = odf_decrypt_member(
                raw, password, encrypted["content.xml"]
            )
        try:
            root = ET.fromstring(raw)
        except ET.ParseError as exc:
            raise ValueError(f"malformed ODF content: {exc}") from exc
    body = root.find(f"{{{_OFFICE}}}body")
    text_el = body.find(f"{{{_OFFICE}}}text") if body is not None else None
    if text_el is None:
        raise ValueError("ODF content has no office:body/office:text")
    out: list[str] = []
    _walk(text_el, out)
    return out


def _walk(node: ET.Element, out: list[str]) -> None:
    for child in node:
        tag = child.tag
        if tag in (f"{{{_TEXT}}}p", f"{{{_TEXT}}}h"):
            out.append(_para_text(child))
        elif tag == f"{{{_TABLE}}}table":
            for cell in child.iter(f"{{{_TABLE}}}table-cell"):
                _walk(cell, out)
        elif tag in (f"{{{_TEXT}}}section", f"{{{_TEXT}}}list"):
            _walk(child, out)
        elif tag == f"{{{_TEXT}}}list-item":
            _walk(child, out)


def _para_text(p: ET.Element) -> str:
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        tag = el.tag
        if tag == f"{{{_TEXT}}}s":
            parts.append(" " * int(el.get(f"{{{_TEXT}}}c", "1")))
        elif tag == f"{{{_TEXT}}}tab":
            parts.append("\t")
        elif tag == f"{{{_TEXT}}}line-break":
            parts.append("\n")
        if el.text:
            parts.append(el.text)
        for child in el:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    if p.text:
        parts.append(p.text)
    for child in p:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


# --------------------------------------------------------------- writer ---


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _encode_run(text: str) -> str:
    """Encode a run the ODF way: multi-space runs become text:s, tabs
    and newlines their elements, the rest split into spans."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == " " and i + 1 < n and text[i + 1] == " ":
            j = i
            while j < n and text[j] == " ":
                j += 1
            out.append(f'<text:s text:c="{j - i}"/>')
            i = j
        elif c == "\t":
            out.append("<text:tab/>")
            i += 1
        elif c == "\n":
            out.append("<text:line-break/>")
            i += 1
        else:
            j = i
            while j < n and text[j] not in "\t\n" and not (
                text[j] == " " and j + 1 < n and text[j + 1] == " "
            ):
                j += 1
            seg = text[i:j]
            # split into spans at irregular boundaries
            for k in range(0, len(seg), 11):
                out.append(f"<text:span>{_xml_escape(seg[k:k + 11])}</text:span>")
            i = j
    return "".join(out)


def encode_odt(
    paragraphs: list[str],
    password: str | None = None,
    *,
    legacy_blowfish: bool = False,
) -> bytes:
    """Conforming minimal .odt: stored mimetype first, manifest,
    content.xml with one text:p per string (spans, text:s for space
    runs, tab/line-break elements).  With ``password`` the content
    member is encrypted per the ODF 1.2 AES-256-CBC + PBKDF2 profile
    (operators/odfcrypt.py) and STORED; ``legacy_blowfish`` writes the
    pre-1.2 OpenOffice profile instead (Blowfish 8-bit CFB, SHA1
    start key, SHA1/1K checksum — r15).  The manifest carries the
    encryption-data element (salt/IV deterministic from the content
    for byte-reproducible fixtures)."""
    body = "".join(f"<text:p>{_encode_run(p)}</text:p>" for p in paragraphs)
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_OFFICE}"'
        f' xmlns:text="{_TEXT}" xmlns:table="{_TABLE}" office:version="1.2">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    ).encode("utf-8")
    enc_entry = ""
    if password is not None:
        import hashlib as _hashlib

        from pasardassist_spark.operators.odfcrypt import (
            odf_encrypt_member,
            odf_encrypt_member_legacy,
        )

        encrypt = (
            odf_encrypt_member_legacy if legacy_blowfish else odf_encrypt_member
        )
        stored, a = encrypt(
            content, password, _hashlib.sha256(content).digest()
        )
        content = stored
        enc_entry = (
            '<manifest:file-entry manifest:full-path="content.xml"'
            f' manifest:media-type="text/xml" manifest:size="{a["size"]}">'
            f'<manifest:encryption-data'
            f' manifest:checksum-type="{a["checksum_type"]}"'
            f' manifest:checksum="{a["checksum"]}">'
            f'<manifest:algorithm manifest:algorithm-name="{a["algorithm"]}"'
            f' manifest:initialisation-vector="{a["iv"]}"/>'
            f'<manifest:key-derivation manifest:key-derivation-name='
            f'"{a["derivation"]}" manifest:salt="{a["salt"]}"'
            f' manifest:iteration-count="{a["iterations"]}"'
            f' manifest:key-size="{a["key_size"]}"/>'
            f'<manifest:start-key-generation'
            f' manifest:start-key-generation-name="{a["start_key"]}"'
            f' manifest:key-size="{20 if legacy_blowfish else 32}"/>'
            "</manifest:encryption-data></manifest:file-entry>"
        )
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<manifest:manifest xmlns:manifest="{_MANIFEST}">'
        f'<manifest:file-entry manifest:full-path="/"'
        f' manifest:media-type="{_MIME}"/>'
        + (
            enc_entry
            or '<manifest:file-entry manifest:full-path="content.xml"'
            ' manifest:media-type="text/xml"/>'
        )
        + "</manifest:manifest>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"), _MIME,
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr("META-INF/manifest.xml", manifest,
                    compress_type=zipfile.ZIP_DEFLATED)
        zf.writestr(
            "content.xml", content,
            compress_type=(
                zipfile.ZIP_STORED if password is not None
                else zipfile.ZIP_DEFLATED
            ),
        )
    return buf.getvalue()
