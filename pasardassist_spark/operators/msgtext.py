"""Outlook ``.msg`` (MS-OXMSG) text extraction on top of the real CFB
container walk (operators/cfb.py) — the last recognized OLE2 document
layer: archived mail exports live as .msg at least as often as mbox.

MAPI properties serialize as streams named
``__substg1.0_{PPPP}{TTTT}`` — four hex digits of property id, four of
type.  The extractor reads the message-level string properties a text
pipeline needs — subject (0x0037), body (0x1000), sender name
(0x0C1A) — honoring both string types (001F = UTF-16LE, 001E = 8-bit
cp1252), and collects attachment sub-storages (``__attach_version1.0_
#NNNNNNNN``) by their long-filename property (0x3707).  Recipient and
nameid storages are walked past, not tripped over.

Real Outlook exports usually omit the plain 0x1000 body and carry it
ONLY as PR_RTF_COMPRESSED (0x1009, binary type 0102) — LZFu compressed
RTF per [MS-OXRTFCP] (operators/lzfu.py, decoder pinned against the
spec's canonical vector).  When 0x1000 is absent the extractor
decompresses 0x1009 and recovers the text through the real RTF
extractor (operators/rtftext.py), dropping the final ``\\par`` newline
artifact.  A present plain body always wins (it is authoritative when
both exist).

The writer synthesizes conforming property-stream layouts (alternating
the two string types by content; optionally storing the body solely as
compressed RTF), so the reader is exercised end-to-end on genuine
compound files.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pasardassist_spark.operators.cfb import read_cfb, write_cfb

__all__ = ["MsgDoc", "encode_msg", "extract_msg"]

_SUBJECT = 0x0037
_BODY = 0x1000
_RTF_COMPRESSED = 0x1009
_SENDER = 0x0C1A
_ATT_NAME = 0x3707
_UNICODE = 0x001F
_ASCII = 0x001E
_BINARY = 0x0102

_SUBSTG = re.compile(r"^__substg1\.0_([0-9A-F]{4})([0-9A-F]{4})$")
_ATTACH = re.compile(r"^__attach_version1\.0_#([0-9A-F]{8})$")


class MsgDoc(NamedTuple):
    subject: str
    body: str
    sender: str
    attachments: list[str]  # long filenames, attachment order


def _decode(blob: bytes, ptype: int) -> str:
    if ptype == _UNICODE:
        return blob.decode("utf-16-le")
    if ptype == _ASCII:
        return blob.decode("cp1252")
    raise ValueError(f"msg: unsupported string property type {ptype:#06x}")


def extract_msg(payload: bytes) -> MsgDoc:
    """Subject, body, sender, and attachment filenames from the MAPI
    property streams; missing properties come back empty."""
    streams = read_cfb(payload)
    top: dict[int, str] = {}
    rtf_compressed: bytes | None = None
    atts: dict[int, str] = {}
    saw_any = False
    for path, blob in streams:
        parts = path.split("/")
        m = _SUBSTG.match(parts[-1])
        if not m:
            continue
        pid, ptype = int(m.group(1), 16), int(m.group(2), 16)
        if len(parts) == 1 and pid == _RTF_COMPRESSED and ptype == _BINARY:
            saw_any = True
            rtf_compressed = blob
            continue
        if ptype not in (_UNICODE, _ASCII):
            continue
        if len(parts) == 1:
            saw_any = True
            top[pid] = _decode(blob, ptype)
        elif len(parts) == 2:
            am = _ATTACH.match(parts[0])
            if am and pid == _ATT_NAME:
                atts[int(am.group(1), 16)] = _decode(blob, ptype)
    if not saw_any:
        raise ValueError("msg: no MAPI property streams found")
    body = top.get(_BODY)
    if body is None and rtf_compressed is not None:
        from pasardassist_spark.operators.lzfu import decompress_lzfu
        from pasardassist_spark.operators.rtftext import rtf_to_text

        text = rtf_to_text(
            decompress_lzfu(rtf_compressed).decode("latin-1")
        )
        # the document-final \par emits one trailing newline artifact
        body = text[:-1] if text.endswith("\n") else text
    return MsgDoc(
        top.get(_SUBJECT, ""),
        body or "",
        top.get(_SENDER, ""),
        [atts[k] for k in sorted(atts)],
    )


# ---------------------------------------------------------------- writer ---


def _cp1252_able(s: str) -> bool:
    try:
        s.encode("cp1252")
        return True
    except UnicodeEncodeError:
        return False


def _prop_stream(pid: int, value: str) -> tuple[str, bytes]:
    if _cp1252_able(value):
        return (
            f"__substg1.0_{pid:04X}{_ASCII:04X}",
            value.encode("cp1252"),
        )
    return (
        f"__substg1.0_{pid:04X}{_UNICODE:04X}",
        value.encode("utf-16-le"),
    )


def encode_msg(
    subject: str,
    body: str,
    sender: str = "corpus writer",
    attachments: list[str] = (),
    rtf_body: bool = False,
) -> bytes:
    """Conforming .msg property-stream layout; string type per property
    decided by content (both types appear in any mixed corpus).
    ``rtf_body=True`` mimics real Outlook exports: NO plain 0x1000
    stream — the body travels solely as PR_RTF_COMPRESSED (LZFu over a
    real RTF render of the text)."""
    if rtf_body:
        from pasardassist_spark.operators.lzfu import compress_lzfu
        from pasardassist_spark.operators.rtftext import encode_rtf

        body_stream = (
            f"__substg1.0_{_RTF_COMPRESSED:04X}{_BINARY:04X}",
            compress_lzfu(encode_rtf([body]).encode("latin-1")),
        )
    else:
        body_stream = _prop_stream(_BODY, body)
    streams = [
        _prop_stream(_SUBJECT, subject),
        body_stream,
        _prop_stream(_SENDER, sender),
    ]
    for i, fname in enumerate(attachments):
        name, blob = _prop_stream(_ATT_NAME, fname)
        streams.append((f"__attach_version1.0_#{i:08X}/{name}", blob))
    # a recipient storage the reader must walk PAST, not trip over
    streams.append(
        ("__recip_version1.0_#00000000/__substg1.0_3001001F",
         "recipient".encode("utf-16-le"))
    )
    return write_cfb(streams)
