"""Legacy PowerPoint 97-2003 ``.ppt`` text extraction ([MS-PPT]) on top
of the real CFB container walk (operators/cfb.py) — completing the
legacy Office trio (.doc piece tables, .xls BIFF8, .ppt record trees).

The PowerPoint Document stream is a TREE OF RECORDS: each node is an
8-byte header (recVer/recInstance, recType, recLen); a node whose
recVer is 0xF is a CONTAINER whose payload is its children, anything
else is an atom.  Text lives in TextCharsAtom (0x0FA0, UTF-16LE) and
TextBytesAtom (0x0FA8, 8-bit cp1252) — the extractor recurses the tree
collecting both in document order, the read path catppt and the
LibreOffice import filter share.  Vertical tabs (PPT's soft line break)
map to newlines, carriage returns to paragraph newlines.

The writer synthesizes a Document container holding SlideListWithText
containers with alternating TextCharsAtom/TextBytesAtom children
(per-atom encoding decided by content), nested exactly per the record
grammar.  The fixture certifies the RECORD WALK — a full
PowerPoint-openable deck would additionally need CurrentUser and
persist directories, which the text read path never touches (and real
crawl extractors never validate).

Encrypted decks decrypt (r15): a top-level CryptSession10Container
(0x2F14, [MS-PPT] §2.3.5) carries the [MS-OFFCRYPTO] §2.3.5 RC4
CryptoAPI header+verifier — the SAME structure .xls FILEPASS wraps, so
the verifier/key machinery is shared with operators/xlscrypt.py — and
the deck's persist objects decrypt with block number = persistId in
one continuous RC4 run (no BIFF 1024-byte rekey).  This repo's
simplified deck is ONE persist object (the Document container,
persistId 1) following the crypt container; a wrong password fails
closed on the SHA-1 verifier ("ppt password incorrect"), and a deck
whose decrypted bytes do not parse as a record tree dead-letters with
ValueError rather than extracting garbage.  A NESTED 0x2F14 (a layout
this walk does not model) still raises by name.
"""

from __future__ import annotations

import struct

from pasardassist_spark.operators.cfb import read_cfb, write_cfb

__all__ = ["encode_ppt", "extract_ppt_text", "sniff_ppt"]

_PERSIST_ID = 1  # the single persist object the simplified deck holds

_DOCUMENT = 0x03E8
_SLWT = 0x0FF0  # SlideListWithText
_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_CRYPT = 0x2F14


def sniff_ppt(payload: bytes) -> bool:
    from pasardassist_spark.operators.cfb import sniff_cfb

    return sniff_cfb(payload)


def _walk(data: bytes, out: list[str], depth: int = 0) -> None:
    if depth > 32:
        raise ValueError("ppt: record tree too deep")
    pos = 0
    while pos + 8 <= len(data):
        ver_inst, rtype, rlen = struct.unpack(
            "<HHI", data[pos : pos + 8]
        )
        body = data[pos + 8 : pos + 8 + rlen]
        if len(body) != rlen:
            raise ValueError("ppt: truncated record")
        if rtype == _CRYPT:
            # top-level containers are handled (and stripped) by
            # extract_ppt_text before the walk; one appearing NESTED is
            # a layout this walk does not model
            raise NotImplementedError(
                "nested .ppt CryptSession10Container unsupported"
            )
        if (ver_inst & 0x000F) == 0x000F:  # container
            _walk(body, out, depth + 1)
        elif rtype == _TEXT_CHARS:
            out.append(body.decode("utf-16-le"))
        elif rtype == _TEXT_BYTES:
            out.append(body.decode("cp1252"))
        pos += 8 + rlen


def extract_ppt_text(payload: bytes, password: str = "") -> list[str]:
    """Text atoms in record-tree order, soft breaks and paragraph marks
    normalized to newlines.  Encrypted decks (a top-level
    CryptSession10Container) authenticate ``password`` against the RC4
    CryptoAPI verifier and decrypt the persist region first."""
    streams = dict(read_cfb(payload))
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("OLE2 container has no PowerPoint Document stream")
    if len(doc) >= 8:
        _ver_inst, rtype, rlen = struct.unpack("<HHI", doc[:8])
        if rtype == _CRYPT:
            from pasardassist_spark.operators.xlscrypt import (
                parse_filepass,
                rc4,
            )

            body = doc[8 : 8 + rlen]
            if len(body) != rlen:
                raise ValueError("ppt: truncated CryptSession10Container")
            try:
                # the container data is the [MS-OFFCRYPTO] RC4 CryptoAPI
                # block .xls FILEPASS wraps behind wEncryptionType=1
                ks = parse_filepass(b"\x01\x00" + body, password)
            except ValueError as exc:
                raise ValueError(
                    str(exc).replace("xls", "ppt")
                ) from exc
            except NotImplementedError as exc:
                raise NotImplementedError(
                    str(exc).replace("xls", "ppt")
                ) from exc
            doc = rc4(ks.key_for_block(_PERSIST_ID), doc[8 + rlen :])
    out: list[str] = []
    _walk(doc, out)
    return [t.replace("\x0b", "\n").replace("\r", "\n") for t in out]


# ---------------------------------------------------------------- writer ---


def _rec(ver_inst: int, rtype: int, body: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(body)) + body


def _cp1252_able(s: str) -> bool:
    try:
        s.encode("cp1252")
        return True
    except UnicodeEncodeError:
        return False


def encode_ppt(texts: list[str], password: str | None = None) -> bytes:
    """One SlideListWithText container per text, its atom encoded 8-bit
    when cp1252-representable and UTF-16 otherwise — both atom types
    appear in any mixed corpus.  With ``password`` the Document
    container is RC4-CryptoAPI encrypted as persist object 1
    (_PERSIST_ID) behind a CryptSession10Container (salt deterministic
    from the content for byte-reproducible fixtures)."""
    slwts = []
    for t in texts:
        body = t.replace("\n", "\r")
        if _cp1252_able(body):
            atom = _rec(0x0000, _TEXT_BYTES, body.encode("cp1252"))
        else:
            atom = _rec(0x0000, _TEXT_CHARS, body.encode("utf-16-le"))
        slwts.append(_rec(0x000F, _SLWT, atom))
    doc = _rec(0x000F, _DOCUMENT, b"".join(slwts))
    if password is not None:
        import hashlib

        from pasardassist_spark.operators.xlscrypt import (
            make_filepass,
            rc4,
        )

        salt = hashlib.sha256(
            b"ppt-salt|" + "\x00".join(texts).encode("utf-8")
        ).digest()[:16]
        fp_payload, ks = make_filepass(password, salt, "cryptoapi")
        crypt = _rec(0x000F, _CRYPT, fp_payload[2:])  # strip wEncryptionType
        doc = crypt + rc4(ks.key_for_block(_PERSIST_ID), doc)
    return write_cfb([("PowerPoint Document", doc)])
