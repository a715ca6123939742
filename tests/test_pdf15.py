"""PDF 1.5 container machinery: xref streams, object streams, hybrid
files, /Prev chains mixing generations, predictors, and the stream-filter
tail (LZW / ASCII85 / ASCIIHex / RunLength / DCT routing).

These are the hand-case pins for the round-13 upgrade — the layouts
virtually every post-2005 PDF (Acrobat 6+, pdfTeX >= 1.40 defaults) uses.
"""

from __future__ import annotations

import zlib

import pytest

from pasardassist_spark.operators.pdftext import (
    _apply_predictor,
    _ascii85_decode,
    _ascii85_encode,
    _asciihex_decode,
    _asciihex_encode,
    _lzw_decode,
    _lzw_encode,
    _runlength_decode,
    _runlength_encode,
    _Name,
    _Stream,
    encode_pdf,
    extract_pdf_pages,
)


# ------------------------------------------------------------ round-trips


def test_xref_stream_objstm_roundtrip_multipage():
    pages = ["first page text", "page two " * 30, "", "ünïcødé — 日本語"]
    payload = encode_pdf(pages, xref_stream=True)
    assert b"/Type /XRef" in payload and b"/ObjStm" in payload
    assert b"trailer" not in payload  # pure 1.5 layout, no classic table
    assert extract_pdf_pages(payload) == pages


@pytest.mark.parametrize("cf", ["flate", "lzw", "a85flate", "rlhex"])
@pytest.mark.parametrize("xs", [False, True])
def test_all_container_filter_combinations(xs, cf):
    pages = ["alpha beta gamma " * 9, "short"]
    assert extract_pdf_pages(
        encode_pdf(pages, xref_stream=xs, content_filter=cf)
    ) == pages


def test_large_file_offsets_survive_the_w_widths():
    # >64 KiB of content pushes offsets past what 2-byte fields could
    # hold — regression pin for the /W [1 4 2] row layout. High-entropy
    # text so Flate can't squeeze the file back under the threshold.
    import random

    rng = random.Random(13)
    pages = [
        "".join(rng.choice("0123456789abcdef") for _ in range(90_000))
        for _ in range(2)
    ] + ["tail page"]
    payload = encode_pdf(pages, xref_stream=True)
    assert len(payload) > 70_000
    assert extract_pdf_pages(payload) == pages


# ------------------------------------------------- /Prev + hybrid chains


def test_incremental_update_xref_stream_prev_to_classic_table():
    """A classic PDF-1.4 file updated in place by a PDF-1.5 writer: the
    appended section holds a replacement content stream and an xref
    STREAM whose /Prev points at the original classic TABLE. The newest
    entry must win; untouched objects resolve through the old table."""
    base = encode_pdf(["original text"])
    start_of_update = len(base)
    new_cs = zlib.compress(b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET")
    update = bytearray()
    # object 5 is the single page's content stream in encode_pdf's layout
    new5_off = start_of_update + len(update)
    update += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(new_cs)
        + new_cs
        + b"\nendstream\nendobj\n"
    )
    old_xref = int(base.rpartition(b"startxref")[2].split()[0])
    # xref stream covering exactly object 5 (Index [5 1]) + itself (9)
    rows = (
        bytes([1]) + new5_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    xref_payload = zlib.compress(rows)
    xref_off = start_of_update + len(update)
    rows_self = xref_off  # self entry not required; /Index lists only 5
    update += (
        b"9 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] /Index [5 1] "
        b"/Prev %d /Root 1 0 R /Filter /FlateDecode /Length %d >>\n"
        b"stream\n" % (old_xref, len(xref_payload))
        + xref_payload
        + b"\nendstream\nendobj\n"
    )
    update += b"startxref\n%d\n%%%%EOF\n" % xref_off
    assert extract_pdf_pages(bytes(base + update)) == ["updated text"]
    del rows_self


def test_hybrid_file_xrefstm_supplies_compressed_entries():
    """Hybrid-reference file (ISO 32000-1 §7.5.8.4): the classic table
    covers only the file-resident streams; /XRefStm points at an xref
    stream whose type-2 entries locate the catalog/pages/page dicts
    inside an object stream."""
    cs = zlib.compress(b"BT /F1 12 Tf 72 720 Td (hybrid works) Tj ET")
    packed = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    }
    body = bytearray()
    header = bytearray()
    for num in sorted(packed):
        header += b"%d %d " % (num, len(body))
        body += packed[num] + b"\n"
    objstm_payload = zlib.compress(bytes(header + body))

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    off5 = len(out)
    out += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cs)
        + cs
        + b"\nendstream\nendobj\n"
    )
    off6 = len(out)
    out += (
        b"6 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (len(header), len(objstm_payload))
        + objstm_payload
        + b"\nendstream\nendobj\n"
    )
    # xref STREAM: type-2 entries for 1,2,4 (inside objstm 6)
    xrows = bytearray()
    for num, idx in ((1, 0), (2, 1), (4, 2)):
        xrows += bytes([2]) + (6).to_bytes(4, "big") + idx.to_bytes(2, "big")
    xpayload = zlib.compress(bytes(xrows))
    off7 = len(out)
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] "
        b"/Index [1 2 4 1] /Root 1 0 R /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(xpayload)
        + xpayload
        + b"\nendstream\nendobj\n"
    )
    # classic table covering 0, 5, 6, 7; trailer carries /XRefStm
    xref_off = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += b"5 3\n"
    for off in (off5, off6, off7):
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size 8 /Root 1 0 R /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (off7, xref_off)
    )
    assert extract_pdf_pages(bytes(out)) == ["hybrid works"]
    # /Index [1 2 4 1] also pins multi-subsection parsing (gap at 3)


def test_objstm_extends_chain_resolves_parent_objects():
    """Type-2 entries may point at a child object stream whose /Extends
    parent physically holds the object — resolution goes through the
    merged map."""
    parent_objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    child_objs = {
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    }

    def mk_objstm(objs, extends=None):
        body, header = bytearray(), bytearray()
        for num in sorted(objs):
            header += b"%d %d " % (num, len(body))
            body += objs[num] + b"\n"
        payload = zlib.compress(bytes(header + body))
        ext = b" /Extends %d 0 R" % extends if extends else b""
        return (
            b"<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode%s >>\nstream\n"
            % (len(objs), len(header), len(payload), ext)
            + payload
            + b"\nendstream"
        )

    cs = zlib.compress(b"BT (extends ok) Tj ET")
    out = bytearray(b"%PDF-1.5\n")
    off5 = len(out)
    out += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cs)
        + cs + b"\nendstream\nendobj\n"
    )
    off6 = len(out)  # parent objstm
    out += b"6 0 obj\n" + mk_objstm(parent_objs) + b"\nendobj\n"
    off7 = len(out)  # child objstm extending 6
    out += b"7 0 obj\n" + mk_objstm(child_objs, extends=6) + b"\nendobj\n"
    xrows = bytearray()
    # object 1 physically lives in 6, but its entry points at child 7:
    # only the /Extends merge can resolve it
    for num, snum, idx in ((1, 7, 0), (2, 7, 0), (4, 7, 1)):
        xrows += bytes([2]) + snum.to_bytes(4, "big") + idx.to_bytes(2, "big")
    for num, off in ((5, off5), (6, off6), (7, off7)):
        xrows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    # order rows by object number 1,2,4,5,6,7 via /Index
    ordered = bytearray()
    for pos in (0, 1, 2, 3, 4, 5):
        ordered += xrows[pos * 7 : pos * 7 + 7]
    xpayload = zlib.compress(bytes(ordered))
    off8 = len(out)
    out += (
        b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] "
        b"/Index [1 2 4 4] /Root 1 0 R /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(xpayload)
        + xpayload
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % off8
    assert extract_pdf_pages(bytes(out)) == ["extends ok"]


# ----------------------------------------------------------- predictors


def test_png_predictors_all_filter_types():
    raw = bytes(range(30))  # 5 rows x 6 columns
    cols = 6
    for ft in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(cols)
        for r in range(0, len(raw), cols):
            row = raw[r : r + cols]
            enc.append(ft)
            if ft == 0:
                enc += row
            elif ft == 1:
                enc += bytes(
                    (row[i] - (row[i - 1] if i else 0)) & 0xFF
                    for i in range(cols)
                )
            elif ft == 2:
                enc += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
            elif ft == 3:
                enc += bytes(
                    (row[i] - ((row[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                    for i in range(cols)
                )
            else:  # Paeth
                def paeth(a, b, c):
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

                enc += bytes(
                    (row[i] - paeth(row[i - 1] if i else 0, prev[i],
                                    prev[i - 1] if i else 0)) & 0xFF
                    for i in range(cols)
                )
            prev = row
        got = _apply_predictor(
            bytes(enc), {"Predictor": 10 + ft, "Columns": cols}
        )
        assert got == raw, f"PNG filter type {ft}"


def test_tiff_predictor_2():
    raw = b"\x10\x20\x30\x15\x25\x35"  # 2 rows x 3 cols
    enc = b"\x10\x10\x10\x15\x10\x10"  # horizontal differences
    assert _apply_predictor(enc, {"Predictor": 2, "Columns": 3}) == raw


def test_predictor_bad_rows_raise():
    with pytest.raises(ValueError, match="row multiple"):
        _apply_predictor(b"\x00\x01\x02", {"Predictor": 12, "Columns": 5})
    with pytest.raises(ValueError, match="filter type"):
        _apply_predictor(bytes([9, 0, 0]), {"Predictor": 12, "Columns": 2})


# ------------------------------------------------------------ filter tail


def test_ascii85_roundtrip_and_hand_cases():
    for data in (b"", b"A", b"ab", b"abc", b"abcd", b"hello world" * 9,
                 b"\x00\x00\x00\x00then", bytes(range(256))):
        assert _ascii85_decode(_ascii85_encode(data)) == data
    # 'z' shorthand for an all-zero group
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="group of one"):
        _ascii85_decode(b"h~>")
    with pytest.raises(ValueError, match="bad ASCII85"):
        _ascii85_decode(b"\x80~>")


def test_asciihex_roundtrip_and_odd_pad():
    for data in (b"", b"\x01", b"hello", bytes(range(256))):
        assert _asciihex_decode(_asciihex_encode(data)) == data
    assert _asciihex_decode(b"48 6\n5>") == b"He"  # whitespace + odd pad -> 0x65? no:
    # '486 5' -> digits 4,8,6,5 -> 0x48 0x65
    assert _asciihex_decode(b"7>") == b"\x70"  # odd count pads with 0


def test_runlength_roundtrip_and_hand_cases():
    for data in (b"", b"A", b"AAAA", b"ABABAB", b"A" * 300,
                 b"mix" + b"\x00" * 50 + b"tail", bytes(range(256)) * 2):
        assert _runlength_decode(_runlength_encode(data)) == data
    assert _runlength_decode(b"\x02abc\x80") == b"abc"
    assert _runlength_decode(b"\xfeZ\x80") == b"ZZZ"  # 257-254 = 3 repeats
    with pytest.raises(ValueError, match="EOD"):
        _runlength_decode(b"\x02abc")


def test_lzw_roundtrip_and_earlychange_seam():
    for data in (b"", b"TOBEORNOTTOBEORTOBEORNOT", b"a" * 5000,
                 bytes(range(256)) * 3):
        assert _lzw_decode(_lzw_encode(data)) == data
    with pytest.raises(NotImplementedError, match="EarlyChange"):
        _lzw_decode(b"\x00", early=0)


def test_dct_decode_routes_through_jpegcodec():
    import numpy as np

    from pasardassist_spark.operators.imagecodec import Raster
    from pasardassist_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    jpeg = encode_jpeg(Raster(16, 16, 3, px))

    class _D:
        @staticmethod
        def resolve(v):
            return v

    s = _Stream({"Filter": _Name("DCTDecode")}, jpeg)
    assert s.decoded(_D()) == bytes(decode_jpeg(jpeg).pixels)


def test_filter_cascade_with_per_filter_decodeparms():
    """[/ASCII85Decode /FlateDecode] with /DecodeParms [null <<Pred>>] —
    the parms array must align with the filter array."""
    raw = bytes(range(40))  # 8 rows x 5 cols
    cols = 5
    enc = bytearray()
    prev = bytes(cols)
    for r in range(0, len(raw), cols):
        row = raw[r : r + cols]
        enc.append(2)  # Up
        enc += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
        prev = row
    payload = _ascii85_encode(zlib.compress(bytes(enc)))

    class _D:
        @staticmethod
        def resolve(v):
            return v

    s = _Stream(
        {
            "Filter": [_Name("ASCII85Decode"), _Name("FlateDecode")],
            "DecodeParms": [None, {"Predictor": 12, "Columns": cols}],
        },
        payload,
    )
    assert s.decoded(_D()) == raw
