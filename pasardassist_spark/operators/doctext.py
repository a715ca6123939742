"""Legacy Word 97-2003 ``.doc`` text extraction ([MS-DOC]) on top of the
real CFB container walk (operators/cfb.py) — closing the OLE2 seam the
OOXML family documented since round 11.

What is REAL here (the documented read path every .doc consumer
implements):

- the WordDocument stream's FIB: wIdent/nFib validation, the
  ``fWhichTblStm`` flag selecting the ``1Table`` vs ``0Table`` stream,
  ``ccpText`` from FibRgLw97, and ``fcClx``/``lcbClx`` from
  FibRgFcLcb97 (pair 33 — fcStshfOrig..fcSttbfAssoc precede it);
- the Clx in the table stream: the Pcdt (clxt=2) wrapping a PlcPcd —
  n+1 character positions plus n 8-byte PCDs;
- PIECE TABLE decoding: each PCD's fc carries the compression flag in
  bit 30 — set means 8-bit cp1252 text at ``(fc & 0x3FFFFFFF) / 2``,
  clear means UTF-16LE at ``fc`` — the single most-misread rule in the
  format (text in one document routinely mixes both);
- pieces concatenate over CPs 0..ccpText; Word's control characters
  (paragraph mark \\r, cell mark \\x07) map to newline / tab-stop text
  the way antiword does.

The writer synthesizes minimal conforming documents — FIB with correct
structure sizes (csw=14, cslw=22, cbRgFcLcb=93 for nFib 0x00C1), a
multi-piece piece table that deliberately alternates compressed and
unicode pieces at irregular split points, text in the WordDocument
stream, Clx in 1Table — inside a real CFB container, so the extractor
is exercised end-to-end on genuine compound files.

Encrypted documents (fEncrypted) and fastsaved complex formats keep
raising by name; the plain piece-table path is real.
"""

from __future__ import annotations

import struct

from pasardassist_spark.operators.cfb import read_cfb, sniff_cfb, write_cfb

__all__ = ["encode_doc", "extract_doc_text", "sniff_doc"]

_WIDENT = 0xA5EC
_NFIB = 0x00C1  # Word 97
# FIB layout: base(32) + csw(2) + FibRgW97(28) + cslw(2) + FibRgLw97(88)
# + cbRgFcLcb(2) + FibRgFcLcb97(93 pairs * 8)
_FIB_BASE = 32
_CSW, _RGW = 14, 28
_CSLW, _RGLW = 22, 88
_CBRGFCLCB = 93
_OFF_RGLW = _FIB_BASE + 2 + _RGW + 2           # 64
_OFF_RGFCLCB = _OFF_RGLW + _RGLW + 2           # 154
_PAIR_CLX = 33                                  # fcClx/lcbClx pair index
_OFF_FCCLX = _OFF_RGFCLCB + _PAIR_CLX * 8       # 418
_FIB_LEN = _OFF_RGFCLCB + _CBRGFCLCB * 8        # 898


def sniff_doc(payload: bytes) -> bool:
    return sniff_cfb(payload)


def extract_doc_text(payload: bytes, password: str = "") -> str:
    """The document's main text (CPs 0..ccpText), paragraph marks as
    newlines, cell marks as tabs.  fEncrypted documents decrypt through
    operators/doccrypt.py (RC4 standard / CryptoAPI, 512-byte rekey,
    FibBase and the Table-stream header plaintext; empty ``password``
    also tries Word's VelvetSweatshop default); fObfuscation (XOR)
    raises by name."""
    streams = dict(read_cfb(payload))
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError("OLE2 container has no WordDocument stream")
    if len(wd) < _FIB_LEN:
        raise ValueError("WordDocument stream too short for a FIB")
    wident, nfib = struct.unpack("<HH", wd[0:4])
    if wident != _WIDENT:
        raise ValueError(f"bad FIB wIdent {wident:#x}")
    (flags,) = struct.unpack("<H", wd[10:12])
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise ValueError(f".doc has no {table_name} stream")
    if flags & 0x0100:  # fEncrypted
        if flags & 0x8000:  # fObfuscation
            raise NotImplementedError(
                "XOR-obfuscated .doc (fObfuscation) unsupported"
            )
        from pasardassist_spark.operators.doccrypt import (
            FIB_PLAINTEXT,
            parse_word_encryption_header,
        )

        (lkey,) = struct.unpack("<I", wd[14:18])
        if not 0 < lkey <= len(table):
            raise ValueError(f"doc: bad FibBase.lKey {lkey}")
        ks = parse_word_encryption_header(table[:lkey], password)
        wd = wd[:FIB_PLAINTEXT] + ks.xor(
            wd[FIB_PLAINTEXT:], FIB_PLAINTEXT
        )
        table = table[:lkey] + ks.xor(table[lkey:], lkey)
        # the FIB beyond FibBase was encrypted: re-read nothing cached
    (ccp_text,) = struct.unpack("<i", wd[_OFF_RGLW + 12 : _OFF_RGLW + 16])
    fc_clx, lcb_clx = struct.unpack(
        "<Ii", wd[_OFF_FCCLX : _OFF_FCCLX + 8]
    )
    if lcb_clx <= 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("Clx out of table-stream bounds")
    clx = table[fc_clx : fc_clx + lcb_clx]
    # the Clx may start with Prc (clxt=1) grpprl blocks before the Pcdt
    k = 0
    while k < len(clx) and clx[k] == 0x01:
        (cb,) = struct.unpack("<h", clx[k + 1 : k + 3])
        k += 3 + cb
    if k >= len(clx) or clx[k] != 0x02:
        raise ValueError("Clx has no Pcdt")
    (lcb,) = struct.unpack("<I", clx[k + 1 : k + 5])
    plc = clx[k + 5 : k + 5 + lcb]
    if len(plc) != lcb or (lcb - 4) % 12 != 0:
        raise ValueError("PlcPcd size is not 4 + 12n")
    n = (lcb - 4) // 12
    cps = struct.unpack(f"<{n + 1}i", plc[: 4 * (n + 1)])
    out: list[str] = []
    for i in range(n):
        pcd = plc[4 * (n + 1) + 8 * i : 4 * (n + 1) + 8 * i + 8]
        (fc_raw,) = struct.unpack("<I", pcd[2:6])
        count = cps[i + 1] - cps[i]
        if count < 0:
            raise ValueError("PlcPcd character positions not increasing")
        if fc_raw & 0x40000000:  # compressed: cp1252, fc is doubled
            fc = (fc_raw & 0x3FFFFFFF) // 2
            raw = wd[fc : fc + count]
            if len(raw) != count:
                raise ValueError("compressed piece beyond WordDocument end")
            out.append(raw.decode("cp1252"))
        else:
            fc = fc_raw
            raw = wd[fc : fc + 2 * count]
            if len(raw) != 2 * count:
                raise ValueError("unicode piece beyond WordDocument end")
            out.append(raw.decode("utf-16-le"))
    text = "".join(out)[:ccp_text]
    return text.replace("\r", "\n").replace("\x07", "\t")


# ---------------------------------------------------------------- writer ---


def _cp1252_able(s: str) -> bool:
    try:
        s.encode("cp1252")
        return True
    except UnicodeEncodeError:
        return False


def encode_doc(
    text: str, encrypt: str | None = None, password: str = "",
) -> bytes:
    """Minimal conforming .doc: the text is split into pieces at
    irregular boundaries, each piece stored compressed (cp1252) when
    representable and UTF-16 otherwise — both fc encodings exercised on
    every document — with the Clx/PlcPcd in 1Table.  ``encrypt`` =
    "standard" / "cryptoapi" sets FibBase.fEncrypted, writes the RC4
    encryption header at the head of 1Table (size in FibBase.lKey) and
    encrypts both streams past their plaintext prefixes with the
    512-byte-rekey keystream (operators/doccrypt.py); empty
    ``password`` means Word's VelvetSweatshop default."""
    doc = text.replace("\n", "\r").replace("\t", "\x07")
    # irregular piece split: ~37-char pieces so most docs get several
    pieces = [doc[i : i + 37] for i in range(0, len(doc), 37)] or [""]
    text_start = _FIB_LEN
    blobs: list[bytes] = []
    pcds: list[bytes] = []
    cps = [0]
    fc = text_start
    for p in pieces:
        cps.append(cps[-1] + len(p))
        if _cp1252_able(p):
            raw = p.encode("cp1252")
            pcds.append(
                struct.pack("<HIH", 0, (fc * 2) | 0x40000000, 0)
            )
        else:
            raw = p.encode("utf-16-le")
            pcds.append(struct.pack("<HIH", 0, fc, 0))
        blobs.append(raw)
        fc += len(raw)
    plc = struct.pack(f"<{len(cps)}i", *cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    fib = bytearray(_FIB_LEN)
    struct.pack_into("<HH", fib, 0, _WIDENT, _NFIB)
    flags = 0x0200  # fWhichTblStm = 1Table
    header = b""
    ks = None
    if encrypt is not None:
        import hashlib as _hashlib

        from pasardassist_spark.operators.doccrypt import (
            DEFAULT_DOC_PASSWORD,
            make_word_encryption_header,
        )

        pw = password or DEFAULT_DOC_PASSWORD
        salt = _hashlib.md5(
            b"doc-salt|" + encrypt.encode() + b"|" + doc.encode("utf-8")
        ).digest()
        header, ks = make_word_encryption_header(pw, salt, encrypt)
        flags |= 0x0100  # fEncrypted
        struct.pack_into("<I", fib, 14, len(header))  # FibBase.lKey
    struct.pack_into("<H", fib, 10, flags)
    struct.pack_into("<H", fib, 12, 0x00BF)  # nFibBack
    struct.pack_into("<H", fib, _FIB_BASE, _CSW)
    struct.pack_into("<H", fib, _OFF_RGLW - _RGLW - 2, _CSLW)
    # FibRgLw97: cbMac, reserved1, reserved2, ccpText, ...
    struct.pack_into("<i", fib, _OFF_RGLW, text_start + sum(len(b) for b in blobs))
    struct.pack_into("<i", fib, _OFF_RGLW + 12, cps[-1])
    struct.pack_into("<H", fib, _OFF_RGFCLCB - 2, _CBRGFCLCB)
    struct.pack_into("<Ii", fib, _OFF_FCCLX, len(header), len(clx))

    word_doc = bytes(fib) + b"".join(blobs)
    table = header + clx
    if ks is not None:
        from pasardassist_spark.operators.doccrypt import FIB_PLAINTEXT

        word_doc = word_doc[:FIB_PLAINTEXT] + ks.xor(
            word_doc[FIB_PLAINTEXT:], FIB_PLAINTEXT
        )
        table = header + ks.xor(clx, len(header))
    return write_cfb([("WordDocument", word_doc), ("1Table", table)])
