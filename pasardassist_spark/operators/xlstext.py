"""Legacy Excel 97-2003 ``.xls`` (BIFF8) cell extraction ([MS-XLS]) on
top of the real CFB container walk (operators/cfb.py) — the Workbook
stream's record grammar, implemented for the read path every .xls
consumer (xls2csv, LibreOffice's import filter) walks:

- the record stream: 4-byte headers (opcode, length), BOF/EOF substream
  framing (workbook globals first, then one substream per BOUNDSHEET,
  located by its lbPlyPos offset);
- the SST shared-string table with its CONTINUE-record discipline — the
  format's notorious edge: a string may split across records MID-STRING,
  and each continuation fragment restates its OWN compression flag, so
  one logical string can mix 8-bit and UTF-16 fragments; rich-text run
  counts and extended-string bytes are skipped per the grbit flags;
- cells: LABELSST (isst into the SST), NUMBER (xl 64-bit doubles), RK
  (the packed 30-bit form: IEEE-truncated or integer, each optionally
  /100), BOOLERR, and the MULRK run form.

The writer synthesizes minimal conforming workbooks and DELIBERATELY
splits the SST mid-string at irregular points, alternating fragment
compression, so the reader's continuation logic is exercised on every
document.  Encrypted workbooks (FILEPASS) decrypt through
operators/xlscrypt.py — RC4 standard (MD5, EncryptionVersionInfo 1.1)
and RC4 CryptoAPI (SHA-1, vMajor 2-4), including Excel's well-known
default password ``VelvetSweatshop`` tried automatically; XOR
obfuscation raises by name there.
"""

from __future__ import annotations

import struct

from pasardassist_spark.operators.cfb import read_cfb, write_cfb

__all__ = ["encode_xls", "extract_xls_cells", "sniff_xls"]

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F
_MAX_RECORD = 8224


def sniff_xls(payload: bytes) -> bool:
    from pasardassist_spark.operators.cfb import sniff_cfb

    return sniff_cfb(payload)


# ---------------------------------------------------------------- reader ---


def _records(stream: bytes, start: int = 0):
    pos = start
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack("<HH", stream[pos : pos + 4])
        data = stream[pos + 4 : pos + 4 + length]
        if len(data) != length:
            raise ValueError("xls: truncated record")
        yield pos, opcode, data
        pos += 4 + length
        if opcode == _EOF:
            return


class _SstReader:
    """XLUnicodeRichExtendedString across SST + CONTINUE fragments."""

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance(self) -> None:
        while self.fi < len(self.frags) and self._avail() == 0:
            self.fi += 1
            self.pos = 0

    def take(self, n: int) -> bytes:
        """n bytes of NON-string data (may span fragments verbatim)."""
        out = bytearray()
        while n:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("xls: SST ran out of data")
            k = min(n, self._avail())
            out += self.frags[self.fi][self.pos : self.pos + k]
            self.pos += k
            n -= k
        return bytes(out)

    def take_string_chars(self, cch: int, high: bool) -> str:
        """cch CHARACTERS; at a fragment boundary the continuation
        restates its own compression flag byte ([MS-XLS] §2.5.268)."""
        out: list[str] = []
        while cch:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("xls: string continues past the SST")
            if self.pos == 0 and out:
                # continuation fragment: fresh grbit byte
                high = bool(self.take(1)[0] & 0x01)
                self._advance()
            width = 2 if high else 1
            k = min(cch, self._avail() // width)
            if k == 0:
                raise ValueError("xls: split inside a UTF-16 code unit")
            raw = self.frags[self.fi][self.pos : self.pos + k * width]
            self.pos += k * width
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= k
        return "".join(out)


def _parse_sst(fragments: list[bytes]) -> list[str]:
    r = _SstReader(fragments)
    _total, unique = struct.unpack("<ii", r.take(8))
    out: list[str] = []
    for _ in range(unique):
        (cch,) = struct.unpack("<H", r.take(2))
        grbit = r.take(1)[0]
        high = bool(grbit & 0x01)
        rich = struct.unpack("<H", r.take(2))[0] if grbit & 0x08 else 0
        ext = struct.unpack("<i", r.take(4))[0] if grbit & 0x04 else 0
        out.append(r.take_string_chars(cch, high))
        if rich:
            r.take(4 * rich)  # FormatRun entries
        if ext:
            r.take(ext)
    return out


def _rk_value(raw: int) -> float:
    div100 = raw & 0x01
    if raw & 0x02:  # 30-bit signed integer
        v = raw >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (raw & ~0x3) << 32))[0]
    return val / 100.0 if div100 else val


def extract_xls_cells(
    payload: bytes, password: str = ""
) -> list[tuple[str, int, int, str, str]]:
    """(sheet, row, col, kind, value) rows — kind 's' (SST string), 'n'
    (NUMBER/RK/MULRK, repr'd via repr(float)), 'b' (TRUE/FALSE).
    FILEPASS-encrypted workbooks decrypt first (RC4 standard /
    CryptoAPI, operators/xlscrypt.py; empty ``password`` also tries
    Excel's default ``VelvetSweatshop``)."""
    streams = dict(read_cfb(payload))
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("OLE2 container has no Workbook stream")
    from pasardassist_spark.operators.xlscrypt import decrypt_biff_stream

    wb = decrypt_biff_stream(wb, password)
    # workbook globals substream
    sst_frags: list[bytes] = []
    in_sst = False
    sheets: list[tuple[str, int]] = []
    for _pos, opcode, data in _records(wb):
        if opcode == _FILEPASS:
            continue  # already consumed by decrypt_biff_stream
        if opcode == _SST:
            sst_frags = [data]
            in_sst = True
        elif opcode == _CONTINUE and in_sst:
            sst_frags.append(data)
        elif opcode == _BOUNDSHEET:
            (pos_bof,) = struct.unpack("<I", data[:4])
            cch = data[6]
            high = data[7] & 0x01
            name = (
                data[8 : 8 + cch * 2].decode("utf-16-le")
                if high
                else data[8 : 8 + cch].decode("latin-1")
            )
            sheets.append((name, pos_bof))
            in_sst = False
        else:
            if opcode != _CONTINUE:
                in_sst = False
    sst = _parse_sst(sst_frags) if sst_frags else []

    out: list[tuple[str, int, int, str, str]] = []
    for name, pos_bof in sheets:
        if pos_bof + 4 > len(wb):
            raise ValueError(f"xls: BOUNDSHEET offset beyond stream: {name}")
        for _pos, opcode, data in _records(wb, pos_bof):
            if opcode == _LABELSST:
                row, col, _ixfe, isst = struct.unpack("<HHHi", data[:10])
                if not 0 <= isst < len(sst):
                    raise ValueError(f"xls: isst {isst} out of SST range")
                out.append((name, row, col, "s", sst[isst]))
            elif opcode == _NUMBER:
                row, col, _ixfe = struct.unpack("<HHH", data[:6])
                (val,) = struct.unpack("<d", data[6:14])
                out.append((name, row, col, "n", repr(val)))
            elif opcode == _RK:
                row, col, _ixfe, raw = struct.unpack("<HHHI", data[:10])
                out.append((name, row, col, "n", repr(_rk_value(raw))))
            elif opcode == _MULRK:
                row, col_first = struct.unpack("<HH", data[:4])
                (col_last,) = struct.unpack("<H", data[-2:])
                body = data[4:-2]
                for k in range(col_last - col_first + 1):
                    (_ixfe, raw) = struct.unpack(
                        "<HI", body[k * 6 : k * 6 + 6]
                    )
                    out.append(
                        (name, row, col_first + k, "n", repr(_rk_value(raw)))
                    )
            elif opcode == 0x0205:  # BOOLERR
                row, col, _ixfe = struct.unpack("<HHH", data[:6])
                if data[7] == 0:  # fError clear
                    out.append(
                        (name, row, col, "b", "TRUE" if data[6] else "FALSE")
                    )
    return out


# ---------------------------------------------------------------- writer ---


def _rec(opcode: int, data: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(data)) + data


def _bof(dt: int) -> bytes:
    # vers=0x0600 (BIFF8), dt, rupBuild/rupYear as Excel 97 writes them
    return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst_records(strings: list[str], frag_limit: int = 45) -> bytes:
    """SST + CONTINUEs: a tiny fragment budget forces mid-string splits
    on nearly every document, each char-carrying continuation fragment
    leading with its OWN compression flag, and the per-fragment width
    re-decided by content — the exact discipline [MS-XLS] §2.5.268
    demands of readers."""
    frags: list[bytearray] = [bytearray()]

    def room() -> int:
        return frag_limit - len(frags[-1])

    def new_frag() -> None:
        frags.append(bytearray())

    def put(b: bytes) -> None:  # non-string fields: span verbatim
        data = memoryview(b)
        while len(data):
            if room() == 0:
                new_frag()
            k = min(len(data), room())
            frags[-1] += data[:k]
            data = data[k:]

    def put_string(s: str) -> None:
        put(struct.pack("<H", len(s)))
        i = 0
        while True:
            # every fragment of char data (including the first, whose
            # flag byte doubles as the header grbit) starts with a
            # width flag followed by at least one whole char
            if room() < 3:
                new_frag()
            width = 2 if i < len(s) and ord(s[i]) >= 256 else 1
            frags[-1].append(0x01 if width == 2 else 0x00)
            while i < len(s):
                w = 2 if ord(s[i]) >= 256 else 1
                if w > width or room() < width:
                    break  # widen or continue in the next fragment
                frags[-1] += s[i].encode(
                    "utf-16-le" if width == 2 else "latin-1"
                )
                i += 1
            if i >= len(s):
                return
            new_frag()

    put(struct.pack("<ii", len(strings), len(strings)))
    for s in strings:
        put_string(s)
    recs = _rec(_SST, bytes(frags[0]))
    for f in frags[1:]:
        recs += _rec(_CONTINUE, bytes(f))
    return recs


def encode_xls(
    sheet_name: str,
    string_cells: list[tuple[int, int, int]],  # (row, col, sst index)
    strings: list[str],
    number_cells: list[tuple[int, int, float]] = (),
    encrypt: str | None = None,
    password: str = "",
) -> bytes:
    """Minimal conforming BIFF8 workbook: globals (BOF, [FILEPASS,]
    BOUNDSHEET with a fixed-up lbPlyPos, SST with mid-string CONTINUE
    splits, EOF) plus one worksheet substream of LABELSST / NUMBER
    cells.  ``encrypt`` = "standard" (RC4/MD5) or "cryptoapi"
    (RC4/SHA-1) inserts FILEPASS right after the globals BOF and
    RC4-encrypts every non-exempt span ([MS-XLS] §2.2.10.3); empty
    ``password`` means Excel's default ``VelvetSweatshop`` (opens
    without a prompt).  The salt derives deterministically from the
    content so fixtures stay byte-reproducible."""
    sheet = _bof(0x0010)
    for row, col, isst in string_cells:
        sheet += _rec(_LABELSST, struct.pack("<HHHi", row, col, 0, isst))
    for row, col, val in number_cells:
        sheet += _rec(_NUMBER, struct.pack("<HHHd", row, col, 0, val))
    sheet += _rec(_EOF, b"")

    name8 = sheet_name.encode("latin-1")
    bs_data = struct.pack("<IHBB", 0, 0, len(sheet_name), 0) + name8
    globals_ = _bof(0x0005)
    ks = None
    if encrypt is not None:
        import hashlib as _hashlib

        from pasardassist_spark.operators.xlscrypt import (
            DEFAULT_XLS_PASSWORD,
            make_filepass,
        )

        pw = password or DEFAULT_XLS_PASSWORD
        salt = _hashlib.md5(
            b"xls-salt|" + encrypt.encode() + b"|" + b"\x1f".join(
                s.encode("utf-8") for s in strings
            )
        ).digest()
        fp_payload, ks = make_filepass(pw, salt, variant=encrypt)
        globals_ += _rec(_FILEPASS, fp_payload)
    bs_at = len(globals_)
    globals_ += _rec(_BOUNDSHEET, bs_data)
    globals_ += _sst_records(strings)
    globals_ += _rec(_EOF, b"")
    wb = bytearray(globals_ + sheet)
    struct.pack_into("<I", wb, bs_at + 4, len(globals_))  # lbPlyPos fixup
    if ks is not None:
        from pasardassist_spark.operators.xlscrypt import (
            encrypt_biff_stream,
        )

        wb = bytearray(encrypt_biff_stream(bytes(wb), ks))
    return write_cfb([("Workbook", bytes(wb))])
