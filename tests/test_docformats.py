"""PDF / DOCX extraction: roundtrips, parser hand-cases on raw
containers, and error contracts."""

from __future__ import annotations

import io
import zipfile

import pytest

from pasardassist_spark.operators.docxtext import (
    encode_docx,
    extract_docx_paragraphs,
    sniff_docx,
)
from pasardassist_spark.operators.pdftext import (
    _Lexer,
    encode_pdf,
    extract_pdf_pages,
    sniff_pdf,
)

# ------------------------------------------------------------------ PDF --


def test_pdf_roundtrip_multi_page():
    pages = ["page one " * 30, "", "par(en)s and \\backslash\\", "unicodé ✓"]
    payload = encode_pdf(pages)
    assert sniff_pdf(payload)
    assert extract_pdf_pages(payload) == pages


def test_pdf_roundtrip_all_byte_classes():
    text = "".join(chr(c) for c in range(1, 128)) + "éü漢"
    assert extract_pdf_pages(encode_pdf([text])) == [text]


def test_pdf_lexer_hand_cases():
    lex = _Lexer(b"<< /A 5 /B [1 2.5 (s) <4142>] /C 7 0 R /N#20x true >>")
    d = lex.parse_object()
    assert d["A"] == 5
    assert d["B"][:2] == [1, 2.5]
    assert d["B"][2] == b"s" and d["B"][3] == b"AB"
    assert d["C"].num == 7
    assert "N x" in d and d["N x"] is True


def test_pdf_literal_string_escapes():
    lex = _Lexer(rb"(a\(b\)c \\ \n \101 nested (deep) end)")
    s = lex.parse_object()
    assert s == b"a(b)c \\ \n A nested (deep) end"


def test_pdf_hex_string_odd_digits_pad():
    assert _Lexer(b"<48656C6C6F2>").parse_object() == b"Hello "


def test_pdf_comments_skipped():
    lex = _Lexer(b"% a comment\n42")
    assert lex.parse_object() == 42


def test_pdf_dangling_encrypt_rejected():
    """/Encrypt pointing at a missing object is malformed, not a seam:
    the standard security handler (round 14) opens real encrypted files
    (tests/test_pdfcrypt.py), so a torn /Encrypt raises ValueError."""
    payload = bytearray(encode_pdf(["x"]))
    # graft /Encrypt into the trailer dict, pointing at no object
    payload = payload.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError, match="not in xref"):
        extract_pdf_pages(bytes(payload))


def test_pdf_startxref_at_non_xref_object_rejected():
    """startxref pointing at an ordinary object (not an xref table and
    not a /Type /XRef stream) must raise, not guess."""
    payload = encode_pdf(["x"])
    # point startxref at the first object (offset of "1 0 obj")
    first_obj = payload.index(b"1 0 obj")
    head, _, _ = payload.rpartition(b"startxref")
    broken = head + b"startxref\n%d\n%%%%EOF\n" % first_obj
    with pytest.raises(ValueError, match="XRef|stream"):
        extract_pdf_pages(broken)


def test_pdf_unknown_filter_rejected():
    """JPXDecode (JPEG 2000) stays a named seam."""
    payload = encode_pdf(["x"]).replace(b"/FlateDecode", b"/JPXDecode\x20\x20")
    with pytest.raises(NotImplementedError, match="JPXDecode"):
        extract_pdf_pages(payload)


def test_pdf_truncation_and_garbage_raise():
    payload = encode_pdf(["some text here"])
    with pytest.raises(ValueError):
        extract_pdf_pages(b"%PDF-1.4\nno xref here")
    with pytest.raises(ValueError):
        extract_pdf_pages(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        extract_pdf_pages(b"GIF89a not a pdf")


def test_pdf_corrupt_flate_raises():
    payload = bytearray(encode_pdf(["hello hello hello"]))
    i = payload.index(b"stream\n") + 7
    payload[i : i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="Flate|truncated"):
        extract_pdf_pages(bytes(payload))


def test_pdf_page_without_contents_is_empty_string():
    """Hand-built one-object-graph PDF: a page with no /Contents."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 4\n0000000000 65535 f \n"
    for num in (1, 2, 3):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    assert extract_pdf_pages(bytes(out)) == [""]


# ----------------------------------------------------------------- DOCX --


def test_docx_roundtrip_runs_tabs_breaks():
    paras = ["plain " * 20, "", "a\tb\tc", "line\nbreak", "  edges  ", "<&> escapes"]
    payload = encode_docx(paras)
    assert sniff_docx(payload)
    assert extract_docx_paragraphs(payload) == paras


def test_docx_table_cells_in_flow_order():
    """Hand-built document.xml with a table between two paragraphs."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>cell1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>cell2</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    base = encode_docx(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            dst.writestr(name, doc if name == "word/document.xml" else src.read(name))
    assert extract_docx_paragraphs(buf.getvalue()) == [
        "before", "cell1", "cell2", "after"
    ]


def test_docx_nested_table_text_emitted_once():
    """A table nested inside a cell must not duplicate its paragraphs
    (iter('w:tc') used to yield the inner cells once via the outer table
    and again via the recursion into the inner w:tbl)."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:tbl><w:tr><w:tc>"
        "<w:p><w:r><w:t>outer-cell</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc>"
        "<w:p><w:r><w:t>inner-cell</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "</w:tc></w:tr></w:tbl>"
        "</w:body></w:document>"
    )
    base = encode_docx(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            dst.writestr(name, doc if name == "word/document.xml" else src.read(name))
    assert extract_docx_paragraphs(buf.getvalue()) == ["outer-cell", "inner-cell"]


def test_docx_main_part_found_via_rels_at_nonstandard_path():
    """The rels walk, not the hard-coded path, locates the main part."""
    base = encode_docx(["via rels"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "word/document.xml":
                dst.writestr("word/doc2.xml", data)
            elif name == "_rels/.rels":
                dst.writestr(
                    name,
                    data.decode().replace("word/document.xml", "word/doc2.xml"),
                )
            else:
                dst.writestr(name, data)
    assert extract_docx_paragraphs(buf.getvalue()) == ["via rels"]


def test_docx_error_contracts():
    with pytest.raises(NotImplementedError, match="OLE2"):
        extract_docx_paragraphs(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1tail")
    with pytest.raises(ValueError, match="zip"):
        extract_docx_paragraphs(b"PK\x03\x04 not really a zip")
    with pytest.raises(ValueError, match="not a ZIP"):
        extract_docx_paragraphs(b"plain text")
    # valid zip without any document part
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(ValueError, match="no main document part"):
        extract_docx_paragraphs(buf.getvalue())


def test_docx_encrypted_package_rejected():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("EncryptionInfo", b"\x00")
        zf.writestr("EncryptedPackage", b"\x00")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_docx_paragraphs(buf.getvalue())


def test_docx_malformed_xml_raises():
    base = encode_docx(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "word/document.xml":
                data = data[:-20]  # chop the closing tags
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="malformed"):
        extract_docx_paragraphs(buf.getvalue())


# ----------------------------------------------------------------- EPUB --


def test_epub_roundtrip_chapters():
    from pasardassist_spark.operators.epubtext import (
        encode_epub,
        extract_epub_chapters,
        sniff_epub,
    )

    chs = ["chapter one " * 15, "", "line\nbreak", "<&> escapes", "unicodé ✓"]
    payload = encode_epub(chs)
    assert sniff_epub(payload)
    assert extract_epub_chapters(payload) == chs


def _repack_epub(payload: bytes, mutate):
    """Round-trip the zip through a mutation callback(name, data) ->
    (name, data) | None (drop) | list (replace with many)."""
    src = zipfile.ZipFile(io.BytesIO(payload))
    buf = io.BytesIO()
    with src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            r = mutate(name, src.read(name))
            if r is None:
                continue
            entries = r if isinstance(r, list) else [r]
            for n, d in entries:
                dst.writestr(n, d)
    return buf.getvalue()


def test_epub_spine_order_wins_over_zip_order():
    """Reverse the spine: extraction must follow it, not entry order."""
    from pasardassist_spark.operators.epubtext import (
        encode_epub,
        extract_epub_chapters,
    )

    payload = encode_epub(["first", "second", "third"])

    def mutate(name, data):
        if name == "OEBPS/content.opf":
            data = data.replace(
                b'<itemref idref="c0"/><itemref idref="c1"/><itemref idref="c2"/>',
                b'<itemref idref="c2"/><itemref idref="c1"/><itemref idref="c0"/>',
            )
        return (name, data)

    assert extract_epub_chapters(_repack_epub(payload, mutate)) == [
        "third", "second", "first"
    ]


def test_epub_nonlinear_spine_items_skipped():
    from pasardassist_spark.operators.epubtext import (
        encode_epub,
        extract_epub_chapters,
    )

    payload = encode_epub(["keep", "skipme", "also keep"])

    def mutate(name, data):
        if name == "OEBPS/content.opf":
            data = data.replace(
                b'<itemref idref="c1"/>', b'<itemref idref="c1" linear="no"/>'
            )
        return (name, data)

    assert extract_epub_chapters(_repack_epub(payload, mutate)) == [
        "keep", "also keep"
    ]


def test_epub_error_contracts():
    from pasardassist_spark.operators.epubtext import (
        encode_epub,
        extract_epub_chapters,
    )

    payload = encode_epub(["x"])
    with pytest.raises(NotImplementedError, match="DRM"):
        extract_epub_chapters(
            _repack_epub(
                payload,
                lambda n, d: [(n, d), ("META-INF/encryption.xml", b"<e/>")]
                if n == "mimetype" else (n, d),
            )
        )
    with pytest.raises(ValueError, match="mimetype"):
        extract_epub_chapters(
            _repack_epub(
                payload,
                lambda n, d: (n, b"text/plain") if n == "mimetype" else (n, d),
            )
        )
    with pytest.raises(ValueError, match="container.xml"):
        extract_epub_chapters(
            _repack_epub(
                payload,
                lambda n, d: None if n == "META-INF/container.xml" else (n, d),
            )
        )
    with pytest.raises(ValueError, match="missing from zip"):
        extract_epub_chapters(
            _repack_epub(
                payload,
                lambda n, d: None if n.endswith(".xhtml") else (n, d),
            )
        )
    with pytest.raises(ValueError, match="not a ZIP"):
        extract_epub_chapters(b"plain text")


# ------------------------------------------------------------- Markdown --


def test_markdown_block_grammar():
    from pasardassist_spark.operators.mdtext import extract_markdown_blocks as x

    assert x("# Title here\n\npara *em* **strong**\n\n> q1\n> q2") == [
        "Title here", "para em strong", "q1 q2"
    ]
    assert x("- one\n- two\n1. three\n2) four") == ["one", "two", "three", "four"]
    assert x("```\nraw **not em** [x](y)\n# not a heading\n```") == [
        "raw **not em** [x](y)\n# not a heading"
    ]
    assert x("---\ntext\n***") == ["text"]
    assert x("## closed heading ##") == ["closed heading"]
    assert x("~~~\nfence tilde\n~~~") == ["fence tilde"]


def test_markdown_inline_grammar():
    from pasardassist_spark.operators.mdtext import extract_markdown_blocks as x

    assert x("pre ![alt text](i.png) post") == ["pre alt text post"]
    assert x("a [link *em*](http://u) b") == ["a link em b"]
    assert x("esc \\* star \\[brak \\`tick") == ["esc * star [brak `tick"]
    assert x("``code with ` tick``") == ["code with ` tick"]
    assert x("`*shielded*` and *not*") == ["*shielded* and not"]
    assert x("not a link [text only") == ["not a link [text only"]
    assert x("_under_ and __double__") == ["under and double"]


def test_markdown_writer_rotation_roundtrip():
    from pasardassist_spark.operators.mdtext import (
        encode_markdown,
        extract_markdown_blocks,
    )

    parts = [f"part {i} with special chars like value. and x_y and a*b"
             for i in range(14)]
    assert extract_markdown_blocks(encode_markdown(parts)) == parts


def test_markdown_unterminated_fence_raises():
    from pasardassist_spark.operators.mdtext import extract_markdown_blocks

    with pytest.raises(ValueError, match="fenced"):
        extract_markdown_blocks("```\nnever closed")


# ---------------------------------------------------------- SRT / WebVTT --


def test_srt_roundtrip_and_multiline():
    from pasardassist_spark.operators.subtext import encode_srt, parse_srt

    cues = [(0, 1200, "first line\nsecond line"), (1500, 2000, "x")]
    got = parse_srt(encode_srt(cues))
    assert [(c.start_ms, c.end_ms, c.text) for c in got] == cues
    assert [c.cue_no for c in got] == [0, 1]
    # index line is optional in the wild
    got = parse_srt("00:00:00,100 --> 00:00:00,900\nno index line\n")
    assert got[0].text == "no index line" and got[0].start_ms == 100


def test_vtt_roundtrip_tags_settings_notes():
    from pasardassist_spark.operators.subtext import encode_vtt, parse_vtt

    cues = [(1000, 2500, "hello brave new world"), (3000, 4800, "more words")]
    got = parse_vtt(encode_vtt(cues))
    assert [(c.start_ms, c.end_ms, c.text) for c in got] == cues
    # hours-optional timestamps + settings + inline tags, hand-written
    got = parse_vtt(
        "WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
        "01:02.500 --> 01:03.000 align:start position:10%\n"
        "hi <i>there</i> <00:01:02.600>karaoke\n"
    )
    assert got == [(0, 62500, 63000, "hi there karaoke")]


def test_subtitle_error_contracts():
    from pasardassist_spark.operators.subtext import parse_srt, parse_vtt

    with pytest.raises(ValueError, match="WEBVTT signature"):
        parse_vtt("1\n00:00:00.000 --> 00:00:01.000\nx")
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt("1\n00:00:00.000 --> 00:00:01,000\nx")  # dot in SRT
    with pytest.raises(ValueError, match="ends before"):
        parse_srt("1\n00:00:02,000 --> 00:00:01,000\nx")
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt("1\n00:61:00,000 --> 00:62:01,000\nx")  # minutes > 59
    with pytest.raises(ValueError, match="no cues"):
        parse_vtt("WEBVTT\n\nNOTE only comments here\n")
    with pytest.raises(ValueError, match="timing"):
        parse_srt("just some text\nwithout any timing\n")


# ---------------------------------------------------------------- LaTeX --


def test_latex_grammar_hand_cases():
    from pasardassist_spark.operators.textext import latex_to_text as x

    assert x(r"pre $x^2 + y$ post") == "pre  post"
    assert x(r"a \emph{b c} d \cite{x} e") == "a b c d  e"
    assert x(r"\section[short]{Long Title} body") == "Long Title body"
    assert x(r"100\% and \$5 and a\_b") == "100% and $5 and a_b"
    assert x(r"line one\\line two") == "line one line two"
    assert x(r"\begin{equation}E=mc^2\end{equation}after") == "after"
    assert x(r"\begin{align*}x &= y\end{align*}z") == "z"
    assert x(r"\begin{verbatim}$raw$ \emph{x}\end{verbatim}") == r"$raw$ \emph{x}"
    assert x(r"\begin{tabular}{ll}a&b\\\end{tabular}") == "a b "
    assert x(r"\unknowncmd{kept text} tail") == "kept text tail"
    assert x("before % comment\nafter") == "before \nafter"
    assert x(r"x~y") == "x y"
    assert x(r"\[ \int_0^1 f \] done") == " done"
    assert x(r"\(a+b\) inline done") == " inline done"
    assert x(r"\footnote{kept note} here") == "kept note here"
    assert x(r"nested \emph{a \textbf{b} c} end") == "nested a b c end"


def test_latex_error_contracts():
    from pasardassist_spark.operators.textext import latex_to_text

    with pytest.raises(ValueError, match="verbatim"):
        latex_to_text(r"\begin{verbatim}never closed")
    with pytest.raises(ValueError, match="unbalanced"):
        latex_to_text("{unbalanced")
    with pytest.raises(ValueError, match="unbalanced"):
        latex_to_text("}extra")
    with pytest.raises(ValueError, match="unbalanced"):
        latex_to_text(r"\emph{never closed")


def test_latex_writer_rotation_roundtrip():
    from pasardassist_spark.operators.textext import encode_latex, latex_to_text

    parts = [f"part {i} with chars like value. x_y a%b c&d"
             for i in range(14)]
    got = [" ".join(seg.split())
           for seg in latex_to_text(encode_latex(parts)).split("\n\n")]
    assert [g for g in got if g] == parts


# ----------------------------------------------------------------- MIDI --


def test_midi_roundtrip_running_status_and_vlq():
    from pasardassist_spark.operators.midicodec import encode_midi, parse_midi

    t0 = [(0, "note_on", 0, 60, 100), (240, "note_off", 0, 60, 64),
          (200, "note_on", 0, 64, 90), (16500, "note_off", 0, 64, 64)]
    t1 = [(100, "program", 1, 42, 0), (30, "note_on", 1, 70, 80),
          (1000, "note_on", 1, 70, 0)]  # velocity 0 => note_off
    div, tracks = parse_midi(encode_midi([t0, t1], division=480,
                                         tempo_us=600000))
    assert div == 480 and len(tracks) == 2
    assert tracks[0][0] == (0, "tempo", -1, 600000, 0)
    assert [e[0] for e in tracks[0][1:]] == [0, 240, 440, 16940]
    assert tracks[1][2] == (1130, "note_off", 1, 70, 0)


def test_midi_vlq_boundaries():
    from pasardassist_spark.operators.midicodec import _read_vlq, _write_vlq

    for v in (0, 1, 127, 128, 129, 16383, 16384, 2097151, 2097152):
        buf = _write_vlq(v)
        got, pos = _read_vlq(buf, 0)
        assert got == v and pos == len(buf)
    assert _write_vlq(127) == b"\x7f"
    assert _write_vlq(128) == b"\x81\x00"  # the spec's canonical example


def test_midi_error_contracts():
    from pasardassist_spark.operators.midicodec import encode_midi, parse_midi

    payload = encode_midi([[(0, "note_on", 0, 60, 100),
                            (10, "note_off", 0, 60, 0)]])
    with pytest.raises(ValueError, match="not a Standard MIDI"):
        parse_midi(b"RIFFnope")
    with pytest.raises(ValueError):
        parse_midi(payload[:20])
    with pytest.raises(ValueError, match="end-of-track"):
        # chop the end-of-track meta but fix the chunk length
        import struct

        body_start = payload.index(b"MTrk") + 8
        (tlen,) = struct.unpack(">I", payload[body_start - 4 : body_start])
        short = payload[: body_start - 4] + struct.pack(">I", tlen - 4) \
            + payload[body_start : body_start + tlen - 4]
        parse_midi(short)
    with pytest.raises(NotImplementedError, match="SMPTE"):
        import struct as s

        parse_midi(b"MThd" + s.pack(">IHHH", 6, 1, 0, 0x8000 | 0x7348))


# ------------------------------------------------------------------ RTF --


def test_rtf_grammar_hand_cases():
    from pasardassist_spark.operators.rtftext import rtf_to_text as x

    assert x(r"{\rtf1 hello {\b bold} world\par}") == "hello bold world\n"
    assert x(r"{\rtf1 a\'e9b}") == "aéb"                       # cp1252 hex
    assert x("{\\rtf1 {\\uc1 \\" + "u8594?next}}") == chr(0x2192) + "next"  # uc1 skip
    assert x("{\\rtf1 {\\uc2 \\" + "u233xyz}}") == "éz"  # 2 fallbacks
    assert x("{\\rtf1 neg \\" + "u-1234? end}") == "neg " + chr(65536 - 1234) + " end"
    assert x(r"{\rtf1 {\fonttbl{\f0 Arial;}}text}") == "text"  # table skip
    assert x(r"{\rtf1 {\*\junk hidden {\nested x}}shown}") == "shown"
    assert x(r"{\rtf1 brace \{x\} and \\ back}") == "brace {x} and \\ back"
    assert x(r"{\rtf1 a\~b\tab c}") == "a b\tc"
    assert x("{\\rtf1 line\r\none}") == "lineone"  # raw newlines not text
    assert x(r"{\rtf1 a\cell b\row c\line d}") == "a b\nc\nd"
    # uc setting is GROUP-SCOPED: restored after the inner group closes
    assert x("{\\rtf1 {\\uc2 }\\" + "u65?B}") == "AB"


def test_rtf_writer_rotation_roundtrip():
    from pasardassist_spark.operators.rtftext import encode_rtf, rtf_to_text

    parts = [f"part {i} with chars like value. x_y café ✓" for i in range(10)]
    got = [" ".join(seg.split())
           for seg in rtf_to_text(encode_rtf(parts)).split("\n")]
    assert [g for g in got if g] == parts


def test_rtf_error_contracts():
    from pasardassist_spark.operators.rtftext import rtf_to_text

    with pytest.raises(ValueError, match="not an RTF"):
        rtf_to_text("plain text")
    with pytest.raises(ValueError, match="unbalanced"):
        rtf_to_text(r"{\rtf1 never closed")
    with pytest.raises(ValueError, match="unbalanced"):
        rtf_to_text(r"{\rtf1 }}")
    with pytest.raises(ValueError, match="hex"):
        rtf_to_text(r"{\rtf1 bad \'f")


# ------------------------------------------------------------ RSS / Atom --


def test_feed_rfc822_dates_match_email_utils():
    import email.utils

    from pasardassist_spark.operators.feedtext import parse_rfc822_date

    for s in [
        "Mon, 07 Aug 2023 14:30:05 +0130",
        "7 Aug 2023 14:30:05 GMT",
        "Tue, 15 Feb 2000 23:59:59 -0800",
        "01 Jan 1970 00:00:00 +0000",
        "29 Feb 2024 12:00:00 +0000",  # leap day
    ]:
        assert parse_rfc822_date(s) == int(
            email.utils.parsedate_to_datetime(s).timestamp()
        )
    with pytest.raises(ValueError, match="month"):
        parse_rfc822_date("01 Foo 2024 12:00:00 +0000")
    with pytest.raises(ValueError, match="zone"):
        parse_rfc822_date("01 Jan 2024 12:00:00 XYZ")


def test_feed_rfc822_two_digit_years_and_missing_seconds():
    """Real RSS feeds still emit RFC-822 2-digit years and 'HH:MM' times;
    RFC 2822 §4.3 windows 00-49 → 2000s, 50-99 → 1900s, 3-digit += 1900."""
    import email.utils

    from pasardassist_spark.operators.feedtext import parse_rfc822_date

    for short, full in [
        ("Mon, 07 Aug 23 14:30:05 +0000", "Mon, 07 Aug 2023 14:30:05 +0000"),
        ("07 Aug 99 14:30:05 GMT", "07 Aug 1999 14:30:05 GMT"),
        ("07 Aug 49 00:00:00 +0000", "07 Aug 2049 00:00:00 +0000"),
        ("07 Aug 50 00:00:00 +0000", "07 Aug 1950 00:00:00 +0000"),
        ("07 Aug 123 00:00:00 +0000", "07 Aug 2023 00:00:00 +0000"),
    ]:
        assert parse_rfc822_date(short) == parse_rfc822_date(full)
    # missing :ss defaults to 0 and agrees with the stdlib parser
    s = "Tue, 15 Feb 2022 23:59 -0800"
    assert parse_rfc822_date(s) == int(
        email.utils.parsedate_to_datetime(s).timestamp()
    )
    assert parse_rfc822_date("07 Aug 23 14:30 UT") == parse_rfc822_date(
        "07 Aug 2023 14:30:00 +0000"
    )


def test_feed_rfc3339_dates_match_fromisoformat():
    import datetime

    from pasardassist_spark.operators.feedtext import parse_rfc3339_date

    for s in [
        "2023-08-07T14:30:05Z",
        "2023-08-07T14:30:05.123+01:30",
        "1999-12-31T23:59:59-08:00",
        "2024-02-29T00:00:00Z",
    ]:
        assert parse_rfc3339_date(s) == int(
            datetime.datetime.fromisoformat(
                s.replace("Z", "+00:00")
            ).timestamp()
        )
    with pytest.raises(ValueError, match="RFC-3339"):
        parse_rfc3339_date("2024-13-01T00:00:00")  # no zone


def test_feed_roundtrip_both_dialects():
    from pasardassist_spark.operators.feedtext import (
        encode_atom,
        encode_rss,
        parse_feed,
    )

    entries = [("t1", "http://a/1", 1690000000, 90, "sum one"),
               ("t2 <&>", "http://a/2", 1690123456, -480, "sum <two>")]
    for enc, kind in ((encode_rss, "rss"), (encode_atom, "atom")):
        k, title, got = parse_feed(enc("Feed <X>", entries))
        assert k == kind
        assert [(e.title, e.link, e.ts_epoch, e.summary) for e in got] == [
            (t, ln, ep, sm) for t, ln, ep, _off, sm in entries
        ]


def test_feed_error_contracts():
    from pasardassist_spark.operators.feedtext import parse_feed

    with pytest.raises(ValueError, match="malformed"):
        parse_feed("not xml <")
    with pytest.raises(ValueError, match="unknown feed root"):
        parse_feed("<html/>")
    with pytest.raises(ValueError, match="channel"):
        parse_feed("<rss version='2.0'/>")
    with pytest.raises(ValueError, match="pubDate"):
        parse_feed(
            "<rss version='2.0'><channel><title>t</title>"
            "<item><title>x</title></item></channel></rss>"
        )


# ------------------------------------------------------------------ ODT --


def test_odt_roundtrip_whitespace_model():
    from pasardassist_spark.operators.odttext import (
        encode_odt,
        extract_odt_paragraphs,
        sniff_odt,
    )

    paras = ["plain " * 10, "", "tabs\there", "line\nbreak",
             "multi   spaces    kept", "<&> escapes", "unicodé ✓"]
    payload = encode_odt(paras)
    assert sniff_odt(payload)
    assert extract_odt_paragraphs(payload) == paras


def test_odt_flow_order_headings_tables_lists():
    import io
    import zipfile as z

    from pasardassist_spark.operators.odttext import extract_odt_paragraphs

    O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    TB = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    content = (
        f'<office:document-content xmlns:office="{O}" xmlns:text="{T}"'
        f' xmlns:table="{TB}"><office:body><office:text>'
        "<text:h>Head</text:h>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>c1</text:p></table:table-cell>"
        "<table:table-cell><text:p>c2</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "<text:list><text:list-item><text:p>item</text:p>"
        "</text:list-item></text:list>"
        "<text:p>tail</text:p></office:text></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with z.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
    assert extract_odt_paragraphs(buf.getvalue()) == [
        "Head", "c1", "c2", "item", "tail"
    ]


def test_odt_error_contracts():
    import io
    import zipfile as z

    from pasardassist_spark.operators.odttext import extract_odt_paragraphs

    with pytest.raises(ValueError, match="not a ZIP"):
        extract_odt_paragraphs(b"plain")
    with pytest.raises(ValueError, match="corrupt"):
        extract_odt_paragraphs(b"PK\x03\x04junkjunk")
    # wrong mimetype
    buf = io.BytesIO()
    with z.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/zip")
        zf.writestr("content.xml", "<x/>")
    with pytest.raises(ValueError, match="mimetype"):
        extract_odt_paragraphs(buf.getvalue())
    # torn encryption-data (no algorithm/key-derivation children) —
    # round 14: encryption is now SUPPORTED (operators/odfcrypt.py), so
    # a structurally torn entry is a ValueError, not a named seam
    M = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"
    buf = io.BytesIO()
    with z.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr(
            "META-INF/manifest.xml",
            f'<manifest:manifest xmlns:manifest="{M}">'
            '<manifest:file-entry manifest:full-path="content.xml">'
            "<manifest:encryption-data/></manifest:file-entry>"
            "</manifest:manifest>",
        )
        zf.writestr("content.xml", "<x/>")
    with pytest.raises(ValueError, match="torn"):
        extract_odt_paragraphs(buf.getvalue())


# ------------------------------------------------------------------ ICS --


def test_ics_roundtrip_folding_and_escapes():
    import datetime

    from pasardassist_spark.operators.icstext import encode_ics, parse_ics

    evs = [("uid-1@x", 1700000000, "short summary",
            "a long description " * 10),
           ("uid-2@x", 1700086400, "with, commas; and\nnewline", "plain")]
    ics = encode_ics(evs)
    # folding actually happened and is mid-content
    assert any(ln.startswith(" ") for ln in ics.split("\r\n"))
    got = parse_ics(ics)
    assert [(e.uid, e.dtstart_epoch, e.summary, e.description)
            for e in got] == evs
    # epoch arithmetic agrees with datetime
    dt = datetime.datetime(2023, 11, 14, 22, 13, 20,
                           tzinfo=datetime.timezone.utc)
    assert int(dt.timestamp()) == 1700000000


def test_ics_quoted_parameter_values_shield_delimiters():
    from pasardassist_spark.operators.icstext import parse_ics

    ics = ("BEGIN:VCALENDAR\r\n"
           'X-P;NOTE="a:b;c":ignored\r\n'
           "BEGIN:VEVENT\r\nUID:u1\r\nDTSTART:20240101T120000Z\r\n"
           "SUMMARY:s\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
    got = parse_ics(ics)
    assert got[0].uid == "u1" and got[0].dtstart_epoch == 1704110400


def test_ics_error_contracts():
    from pasardassist_spark.operators.icstext import parse_ics

    with pytest.raises(ValueError, match="continuation"):
        parse_ics(" folded first line\r\n")
    with pytest.raises(ValueError, match="without matching BEGIN"):
        parse_ics("END:VEVENT\r\n")
    with pytest.raises(ValueError, match="closes BEGIN"):
        parse_ics("BEGIN:VCALENDAR\r\nEND:VEVENT\r\n")
    with pytest.raises(ValueError, match="unterminated"):
        parse_ics("BEGIN:VCALENDAR\r\nX:1\r\n")
    with pytest.raises(ValueError, match="missing UID"):
        parse_ics("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:s\r\n"
                  "END:VEVENT\r\nEND:VCALENDAR\r\n")
    with pytest.raises(NotImplementedError, match="non-UTC"):
        parse_ics("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nUID:u\r\n"
                  "DTSTART:20230101T000000\r\nEND:VEVENT\r\n"
                  "END:VCALENDAR\r\n")


# -------------------------------------------------------------- sniffer --


def test_document_sniffer_routes_all_formats():
    from pasardassist_spark.operators.docsniff import sniff_document
    from pasardassist_spark.operators.docxtext import encode_docx
    from pasardassist_spark.operators.epubtext import encode_epub
    from pasardassist_spark.operators.icstext import encode_ics
    from pasardassist_spark.operators.mdtext import encode_markdown
    from pasardassist_spark.operators.odttext import encode_odt
    from pasardassist_spark.operators.pdftext import encode_pdf
    from pasardassist_spark.operators.rtftext import encode_rtf
    from pasardassist_spark.operators.textext import encode_latex

    assert sniff_document(encode_pdf(["x"])) == "pdf"
    assert sniff_document(encode_docx(["x"])) == "docx"
    assert sniff_document(encode_epub(["x"])) == "epub"
    assert sniff_document(encode_odt(["x"])) == "odt"
    assert sniff_document(encode_rtf(["x"])) == "rtf"
    assert sniff_document(encode_latex(["plain words"])) == "latex"
    assert sniff_document(encode_markdown(["plain words"])) == "markdown"
    assert sniff_document(encode_ics([("u", 0, "s", "d")])) == "ics"
    # utf-8 text payloads arriving as bytes route through decode
    assert sniff_document(encode_rtf(["x"]).encode()) == "rtf"
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_document(b"\x00\xff\xfe binary junk \x80")


def test_document_sniffer_routes_ooxml_triplet():
    from pasardassist_spark.operators.docsniff import sniff_document
    from pasardassist_spark.operators.docxtext import encode_docx
    from pasardassist_spark.operators.pptxtext import encode_pptx
    from pasardassist_spark.operators.xlsxtext import encode_xlsx

    assert sniff_document(encode_xlsx(["a", "b"])) == "xlsx"
    assert sniff_document(encode_pptx(["slide"])) == "pptx"
    assert sniff_document(encode_docx(["para"])) == "docx"
    with pytest.raises(ValueError, match="corrupt zip"):
        sniff_document(b"PK\x03\x04 truncated local header")


# ----------------------------------------------------------------- XLSX --


def test_xlsx_roundtrip_sheets_and_encodings():
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx,
        extract_xlsx_cells,
    )

    cases = [
        [],
        [""],
        ["one"],
        ["a", "b"],  # single sheet
        ["one two", "tab\there", "", "  edges  ", "<&> esc", "dup", "dup"],
        ["long rich text " * 9, "x", "y"],  # multi-run shared string
    ]
    for cells in cases:
        assert extract_xlsx_cells(encode_xlsx(cells)) == cells


def test_xlsx_cell_type_dispatch_and_row_order():
    """Hand-built worksheet: numeric, boolean, cached-formula and shared
    cells; rows/cells deliberately written out of order — the r
    references must drive ordering."""
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx,
        extract_xlsx_cells,
    )

    base = encode_xlsx(["s0", "s1"])
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{s}"><sheetData>'
        '<row r="2"><c r="B2" t="b"><v>1</v></c>'
        '<c r="A2" t="str"><v>cached</v></c></row>'
        '<row r="1"><c r="B1" t="s"><v>0</v></c>'
        '<c r="A1"><v>42.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            if name == "xl/worksheets/sheet1.xml":
                dst.writestr(name, sheet)
            elif name == "xl/worksheets/sheet2.xml":
                continue
            elif name == "xl/workbook.xml":
                xml = src.read(name).decode()
                xml = xml[: xml.index("<sheets>")] + (
                    '<sheets><sheet name="Only" sheetId="1" r:id="rIdS1"/>'
                    "</sheets></workbook>"
                )
                dst.writestr(name, xml)
            else:
                dst.writestr(name, src.read(name))
    assert extract_xlsx_cells(buf.getvalue()) == ["42.5", "s0", "cached", "TRUE"]


def test_xlsx_shared_string_phonetic_runs_skipped():
    """rPh furigana runs carry <t> elements that are NOT cell text."""
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx,
        extract_xlsx_cells,
    )

    base = encode_xlsx(["PLACEHOLDER", "inline"])
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{s}" count="1" uniqueCount="1">'
        "<si><r><t>kan</t></r><r><t>ji</t></r>"
        "<rPh sb=\"0\" eb=\"2\"><t>かんじ</t></rPh></si></sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            dst.writestr(name, sst if name == "xl/sharedStrings.xml" else src.read(name))
    assert extract_xlsx_cells(buf.getvalue()) == ["kanji", "inline"]


def test_xlsx_error_contracts():
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx,
        extract_xlsx_cells,
    )

    with pytest.raises(NotImplementedError, match="OLE2"):
        extract_xlsx_cells(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1tail")
    with pytest.raises(ValueError, match="zip"):
        extract_xlsx_cells(b"PK\x03\x04 not really a zip")
    with pytest.raises(ValueError, match="not a ZIP"):
        extract_xlsx_cells(b"plain text")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("EncryptionInfo", b"\x00")
        zf.writestr("EncryptedPackage", b"\x00")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_xlsx_cells(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(ValueError, match="no main workbook part"):
        extract_xlsx_cells(buf.getvalue())
    # shared-string index out of range
    base = encode_xlsx(["a", "b"])
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    bad = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{s}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>99</v></c></row>'
        "</sheetData></worksheet>"
    )
    out = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(out, "w") as dst:
        for name in src.namelist():
            dst.writestr(
                name, bad if name == "xl/worksheets/sheet1.xml" else src.read(name)
            )
    with pytest.raises(ValueError, match="out of range"):
        extract_xlsx_cells(out.getvalue())


# ----------------------------------------------------------------- PPTX --


def test_pptx_roundtrip_breaks_and_paragraphs():
    from pasardassist_spark.operators.pptxtext import (
        encode_pptx,
        extract_pptx_slides,
    )

    cases = [
        [],
        [""],
        ["one slide"],
        ["a\nb\nc\nd", "no breaks", "", "x\n\ny", "\n", "tail\n"],
        ["<&> esc", "long text " * 15 + "\nsecond"],
    ]
    for slides in cases:
        assert extract_pptx_slides(encode_pptx(slides)) == slides


def test_pptx_slide_order_follows_sldidlst_not_filenames():
    """encode_pptx reverses file numbering: deck slide 0 lives in the
    HIGHEST-numbered file.  A name-ordered walk would reverse the deck."""
    import zipfile as _zf
    from pasardassist_spark.operators.pptxtext import (
        encode_pptx,
        extract_pptx_slides,
    )

    slides = ["first", "second", "third"]
    payload = encode_pptx(slides)
    with _zf.ZipFile(io.BytesIO(payload)) as zf:
        # file slide3.xml holds deck slide 0 and vice versa
        assert b"first" in zf.read("ppt/slides/slide3.xml")
        assert b"third" in zf.read("ppt/slides/slide1.xml")
        assert b"first" not in zf.read("ppt/slides/slide1.xml")
    assert extract_pptx_slides(payload) == slides


def test_pptx_error_contracts():
    from pasardassist_spark.operators.pptxtext import extract_pptx_slides

    with pytest.raises(NotImplementedError, match="OLE2"):
        extract_pptx_slides(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1tail")
    with pytest.raises(ValueError, match="not a ZIP"):
        extract_pptx_slides(b"plain text")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("EncryptionInfo", b"\x00")
        zf.writestr("EncryptedPackage", b"\x00")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pptx_slides(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(ValueError, match="no main presentation part"):
        extract_pptx_slides(buf.getvalue())


def test_xlsx_typed_records_and_date_serials():
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx_table,
        extract_xlsx_typed,
        serial_to_iso,
    )

    hdr = ["name", "qty", "price", "active", "since"]
    rows = [
        ["alpha beta", 7, 3.25, True, ("date", 45000)],
        ["", 0, 0.5, False, ("date", 59)],
        ["<&> esc", 123456789, 2.0, True, ("date", 61)],
    ]
    t = extract_xlsx_typed(encode_xlsx_table(hdr, rows))
    assert t[0] == [("s", h) for h in hdr]
    assert t[1] == [("s", "alpha beta"), ("n", "7"), ("n", "3.25"),
                    ("b", "TRUE"), ("d", "2023-03-15")]
    # the Lotus leap bug: serial 59 is pre-bug (1900-02-28), 61 lands on
    # 1900-03-01, and the phantom 60 is rejected by name
    assert t[2][4] == ("d", "1900-02-28")
    assert t[3][4] == ("d", "1900-03-01")
    assert serial_to_iso(1) == "1900-01-01"
    with pytest.raises(ValueError, match="phantom"):
        serial_to_iso(60)


def test_xlsx_1904_date_system():
    """workbookPr/@date1904 shifts every serial by exactly 1,462 days —
    the silent 4-year corruption regression pin (VERDICT r12 #4)."""
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx_table,
        extract_xlsx_typed,
        serial_to_iso,
    )

    # epoch + shift arithmetic
    assert serial_to_iso(0, date1904=True) == "1904-01-01"
    # no Lotus phantom in the 1904 system: serial 60 is a real day
    assert serial_to_iso(60, date1904=True) == "1904-03-01"
    # the 1,462-day equivalence: the same calendar date in both systems
    for s1900 in (45000, 1462, 40000):
        assert serial_to_iso(s1900) == serial_to_iso(
            s1900 - 1462, date1904=True
        )

    hdr = ["since"]
    rows = [[("date", 45000 - 1462)]]
    t = extract_xlsx_typed(encode_xlsx_table(hdr, rows, date1904=True))
    assert t[1] == [("d", "2023-03-15")]
    # an extractor ignoring the declaration would read 2019-03-14
    t1900 = extract_xlsx_typed(encode_xlsx_table(hdr, [[("date", 45000)]]))
    assert t1900[1] == [("d", "2023-03-15")]
    # explicit date1904="false"/absent means 1900 system
    t_false = extract_xlsx_typed(encode_xlsx_table(hdr, [[("date", 45000)]]))
    assert t_false[1][0][1] == "2023-03-15"


def test_xlsx_custom_numfmt_date_detection():
    """A CUSTOM numFmt whose code contains date tokens outside quoted
    literals types its cells as dates; digit-bearing codes stay
    numeric."""
    from pasardassist_spark.operators.xlsxtext import (
        encode_xlsx_table,
        extract_xlsx_typed,
    )

    base = encode_xlsx_table(["h"], [[("date", 45000)]])
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{s}">'
        '<numFmts count="2">'
        '<numFmt numFmtId="164" formatCode="yyyy&quot;y&quot;-mm-dd"/>'
        '<numFmt numFmtId="165" formatCode="#,##0.00 &quot;days&quot;"/>'
        "</numFmts>"
        '<cellXfs count="3"><xf numFmtId="0"/>'
        '<xf numFmtId="164" applyNumberFormat="1"/>'
        '<xf numFmtId="165" applyNumberFormat="1"/></cellXfs>'
        "</styleSheet>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{s}"><sheetData>'
        '<row r="1"><c r="A1" s="1"><v>45000</v></c>'
        '<c r="B1" s="2"><v>45000</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, zipfile.ZipFile(buf, "w") as dst:
        for name in src.namelist():
            if name == "xl/styles.xml":
                dst.writestr(name, styles)
            elif name == "xl/worksheets/sheet1.xml":
                dst.writestr(name, sheet)
            else:
                dst.writestr(name, src.read(name))
    t = extract_xlsx_typed(buf.getvalue())
    assert t == [[("d", "2023-03-15"), ("n", "45000")]]


def test_document_sniffer_email_rule():
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )
    from pasardassist_spark.operators.emailtext import encode_email

    raw = encode_email("hello", 1700000000, "body words here", 1)
    assert sniff_document(raw) == "email"
    fmt, text = extract_document(raw)
    assert fmt == "email" and text == "body words here"
    # single-line text can never match (no newlines) — markdown default
    assert sniff_document("Subject: looks like a header") == "markdown"
    # one header line alone is not enough
    assert sniff_document("From: a@b\n\nnot mail, no identity pair") in (
        "markdown", "latex",
    )
    # header block without any identity header stays markdown
    assert sniff_document("Alpha: one\nBeta: two\n\nbody") == "markdown"


def test_pptx_speaker_notes_roundtrip_and_rels_level():
    from pasardassist_spark.operators.pptxtext import (
        encode_pptx,
        extract_pptx_notes,
        extract_pptx_slides,
    )

    slides = ["first body", "second body", "third"]
    notes = ["note one", None, "note\nthree lines\nhere"]
    p = encode_pptx(slides, notes)
    assert extract_pptx_slides(p) == slides  # notes never leak into slides
    assert extract_pptx_notes(p) == notes
    # slide order still follows sldIdLst, so notes attach to the RIGHT
    # slide despite the reversed file numbering
    import zipfile as _zf
    with _zf.ZipFile(io.BytesIO(p)) as zf:
        # deck slide 0 lives in slide3.xml; its notes in notesSlide3.xml
        assert b"note one" in zf.read("ppt/notesSlides/notesSlide3.xml")
    assert extract_pptx_notes(encode_pptx(["a"])) == [None]


def test_document_sniffer_routes_ole2_and_doc():
    from pasardassist_spark.operators.cfb import write_cfb
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )
    from pasardassist_spark.operators.doctext import encode_doc

    # OLE2 with an unrecognized document layer (.msg) stays the seam
    msg = write_cfb([("__properties_version1.0", b"\x00" * 64)])
    assert sniff_document(msg) == "ole2"
    with pytest.raises(NotImplementedError, match="container readable"):
        extract_document(msg)
    # a real .ppt extracts its text atoms
    from pasardassist_spark.operators.ppttext import encode_ppt
    ppt = encode_ppt(["atom one", "unicodé ✓ atom"])
    assert sniff_document(ppt) == "ppt"
    fmt_p, text_p = extract_document(ppt)
    assert fmt_p == "ppt" and text_p == "atom one unicodé ✓ atom"
    # a real BIFF8 workbook extracts its string cells
    from pasardassist_spark.operators.xlstext import encode_xls
    xls = encode_xls("S", [(0, 0, 0), (1, 0, 1)], ["cell one", "cell two"])
    assert sniff_document(xls) == "xls"
    fmt_x, text_x = extract_document(xls)
    assert fmt_x == "xls" and text_x == "cell one cell two"
    # a real .doc extracts through the piece table
    payload = encode_doc("legacy word text\nsecond paragraph")
    assert sniff_document(payload) == "doc"
    fmt, text = extract_document(payload)
    assert fmt == "doc" and text == "legacy word text second paragraph"
    # junk WordDocument stream fails loudly, not plausibly
    with pytest.raises(ValueError, match="FIB"):
        extract_document(write_cfb([("WordDocument", b"\x00" * 128)]))


# ------------------------------------------------------------ legacy .doc --


def test_doc_roundtrip_matrix():
    from pasardassist_spark.operators.doctext import (
        encode_doc,
        extract_doc_text,
    )

    cases = [
        "plain ascii words here " * 10,
        "",
        "short",
        "tabs\there\nand newlines\n",
        "unicodé beyond cp1252: ✓ 漢字 and mixed ascii runs " * 5,
        "é cp1252-able but ✓ forces a unicode piece",
        "x" * 36, "y" * 37, "z" * 38,  # piece-boundary edges
    ]
    for t in cases:
        assert extract_doc_text(encode_doc(t)) == t, repr(t[:40])


def test_doc_clx_with_prc_prefix_and_0table():
    """A Clx carrying Prc (clxt=1) property blocks before the Pcdt must
    still find the piece table, and fWhichTblStm=0 selects 0Table."""
    import struct

    from pasardassist_spark.operators.cfb import read_cfb, write_cfb
    from pasardassist_spark.operators.doctext import (
        encode_doc,
        extract_doc_text,
    )

    base = encode_doc("prc prefixed text")
    streams = dict(read_cfb(base))
    clx = streams["1Table"]
    prc = b"\x01" + struct.pack("<h", 4) + b"\xde\xad\xbe\xef"
    wd = bytearray(streams["WordDocument"])
    # repoint lcbClx (fcClx stays 0) and clear fWhichTblStm
    struct.pack_into("<Ii", wd, 418, 0, len(prc) + len(clx))
    struct.pack_into("<H", wd, 10, 0x0000)
    payload = write_cfb(
        [("WordDocument", bytes(wd)), ("0Table", prc + clx)]
    )
    assert extract_doc_text(payload) == "prc prefixed text"


def test_doc_error_contracts():
    import struct

    from pasardassist_spark.operators.cfb import read_cfb, write_cfb
    from pasardassist_spark.operators.doctext import (
        encode_doc,
        extract_doc_text,
    )

    with pytest.raises(ValueError, match="no WordDocument"):
        extract_doc_text(write_cfb([("Workbook", b"\x00" * 8)]))
    with pytest.raises(ValueError, match="FIB"):
        extract_doc_text(write_cfb([("WordDocument", b"\x00" * 64)]))
    base = encode_doc("some text")
    streams = dict(read_cfb(base))
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd, 10, 0x0200 | 0x0100)  # fEncrypted
    enc = write_cfb([("WordDocument", bytes(wd)), ("1Table", streams["1Table"])])
    # round 14: encryption is SUPPORTED (operators/doccrypt.py), so a
    # forged fEncrypted flag with no header (lKey 0) is a torn-file
    # ValueError, not a named seam; the real seam (fObfuscation) and
    # the decrypt contracts are pinned in tests/test_doccrypt.py
    with pytest.raises(ValueError, match="lKey"):
        extract_doc_text(enc)
    # missing table stream
    with pytest.raises(ValueError, match="no 1Table"):
        extract_doc_text(write_cfb([("WordDocument", streams["WordDocument"])]))


# ------------------------------------------------------------ legacy .xls --


def test_xls_roundtrip_and_continue_splits():
    import struct

    from pasardassist_spark.operators.cfb import read_cfb
    from pasardassist_spark.operators.xlstext import (
        encode_xls,
        extract_xls_cells,
    )

    strings = ["", "a" * 200, "unicodé ✓ 漢字 mixed ascii tail " * 4,
               ("x" * 44) + "✓" + ("y" * 44)]
    scells = [(i, 0, i) for i in range(4)] + [(9, 9, 1)]  # shared isst
    ncells = [(5, 1, 3.5), (6, 1, -2.25), (7, 1, 1e300)]
    p = encode_xls("Sheet One", scells, strings, ncells)
    got = extract_xls_cells(p)
    want = [("Sheet One", r, c, "s", strings[i]) for r, c, i in scells] + [
        ("Sheet One", r, c, "n", repr(float(v))) for r, c, v in ncells
    ]
    assert sorted(got) == sorted(want)
    # the SST really split into CONTINUE records
    wb = dict(read_cfb(p))["Workbook"]
    ops, pos = [], 0
    while pos + 4 <= len(wb):
        op, ln = struct.unpack("<HH", wb[pos : pos + 4])
        ops.append(op)
        pos += 4 + ln
    assert ops.count(0x003C) >= 4


def test_xls_rk_and_boolerr_records():
    """Hand-built worksheet records: both RK encodings (int and IEEE-
    truncated, each /100) and BOOLERR booleans."""
    import struct

    from pasardassist_spark.operators.cfb import read_cfb, write_cfb
    from pasardassist_spark.operators.xlstext import (
        encode_xls,
        extract_xls_cells,
    )

    base = encode_xls("S", [], ["u"])
    wb = bytearray(dict(read_cfb(base))["Workbook"])

    def rec(op, data):
        return struct.pack("<HH", op, len(data)) + data

    rk_int = (7 << 2) | 0x02                        # integer 7
    rk_int_c = (1234 << 2) | 0x03                   # 1234/100 = 12.34
    ieee = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    rk_ieee = (ieee >> 32) & ~0x3                   # 2.5 (top 30 bits exact)
    sheet = rec(0x0809, struct.pack("<HHHHII", 0x600, 0x10, 0, 0, 0, 0))
    sheet += rec(0x027E, struct.pack("<HHHI", 0, 0, 0, rk_int))
    sheet += rec(0x027E, struct.pack("<HHHI", 0, 1, 0, rk_int_c))
    sheet += rec(0x027E, struct.pack("<HHHI", 0, 2, 0, rk_ieee))
    sheet += rec(0x00BD, struct.pack("<HH", 1, 0)   # MULRK cols 0-1
                 + struct.pack("<HI", 0, rk_int)
                 + struct.pack("<HI", 0, rk_int_c)
                 + struct.pack("<H", 1))
    sheet += rec(0x0205, struct.pack("<HHHBB", 2, 0, 0, 1, 0))  # TRUE
    sheet += rec(0x0205, struct.pack("<HHHBB", 2, 1, 0, 0, 0))  # FALSE
    sheet += rec(0x000A, b"")
    # splice: find globals EOF, append our sheet, fix lbPlyPos
    pos, g_end = 0, None
    while pos + 4 <= len(wb):
        op, ln = struct.unpack("<HH", wb[pos : pos + 4])
        if op == 0x0085:
            bs_at = pos
        if op == 0x000A:
            g_end = pos + 4
            break
        pos += 4 + ln
    new_wb = bytes(wb[:g_end]) + sheet
    new_wb = bytearray(new_wb)
    struct.pack_into("<I", new_wb, bs_at + 4, g_end)
    p = write_cfb([("Workbook", bytes(new_wb))])
    got = {(r, c): (k, v) for _s, r, c, k, v in extract_xls_cells(p)}
    assert got[(0, 0)] == ("n", repr(7.0))
    assert got[(0, 1)] == ("n", repr(12.34))
    assert got[(0, 2)] == ("n", repr(2.5))
    assert got[(1, 0)] == ("n", repr(7.0))
    assert got[(1, 1)] == ("n", repr(12.34))
    assert got[(2, 0)] == ("b", "TRUE")
    assert got[(2, 1)] == ("b", "FALSE")


def test_xls_error_contracts():
    import struct

    from pasardassist_spark.operators.cfb import read_cfb, write_cfb
    from pasardassist_spark.operators.xlstext import (
        encode_xls,
        extract_xls_cells,
    )

    with pytest.raises(ValueError, match="no Workbook"):
        extract_xls_cells(write_cfb([("WordDocument", b"\x00" * 8)]))
    base = encode_xls("S", [(0, 0, 0)], ["x"])
    wb = dict(read_cfb(base))["Workbook"]
    # splice a FILEPASS record right after the globals BOF
    bof_len = 4 + struct.unpack("<H", wb[2:4])[0]
    fp = struct.pack("<HH", 0x002F, 2) + b"\x00\x00"
    enc = write_cfb([("Workbook", wb[:bof_len] + fp + wb[bof_len:])])
    with pytest.raises(NotImplementedError, match="FILEPASS"):
        extract_xls_cells(enc)
    # isst out of range
    bad = encode_xls("S", [(0, 0, 5)], ["only one"])
    with pytest.raises(ValueError, match="out of SST range"):
        extract_xls_cells(bad)


def test_ppt_roundtrip_and_error_contracts():
    import struct

    from pasardassist_spark.operators.cfb import write_cfb
    from pasardassist_spark.operators.ppttext import (
        encode_ppt,
        extract_ppt_text,
    )

    cases = [
        ["plain ascii slide", "unicodé ✓ 漢字 slide", "", "multi\nline"],
        [],
        ["x" * 500],
    ]
    for texts in cases:
        assert extract_ppt_text(encode_ppt(texts)) == texts
    with pytest.raises(ValueError, match="no PowerPoint Document"):
        extract_ppt_text(write_cfb([("Unrelated", b"\x00")]))
    # truncated record body
    bad = write_cfb([
        ("PowerPoint Document", struct.pack("<HHI", 0, 0x0FA8, 99) + b"xy")
    ])
    with pytest.raises(ValueError, match="truncated record"):
        extract_ppt_text(bad)
    # r15: a top-level empty CryptSession10Container is now parsed as a
    # crypt header — torn (no verifier) -> ValueError, never misparse
    enc = write_cfb([
        ("PowerPoint Document", struct.pack("<HHI", 0x0F, 0x2F14, 0))
    ])
    with pytest.raises(ValueError):
        extract_ppt_text(enc)
    # a NESTED crypt container is a layout the walk does not model
    nested = write_cfb([
        ("PowerPoint Document", struct.pack(
            "<HHI", 0x0F, 0x03E8, 8
        ) + struct.pack("<HHI", 0x0F, 0x2F14, 0))
    ])
    with pytest.raises(NotImplementedError, match="nested"):
        extract_ppt_text(nested)


def test_ppt_encrypted_roundtrip_and_gates():
    """RC4 CryptoAPI encrypted decks (r15): the CryptSession10Container
    wraps the same [MS-OFFCRYPTO] header .xls FILEPASS carries; persist
    object decrypts with block = persistId."""
    from pasardassist_spark.operators.ppttext import (
        encode_ppt,
        extract_ppt_text,
    )

    texts = ["plain ascii slide", "unicodé ✓ 漢字 slide", "multi\nline"]
    enc = encode_ppt(texts, password="deckpw")
    assert extract_ppt_text(enc, "deckpw") == texts
    with pytest.raises(ValueError, match="ppt password incorrect"):
        extract_ppt_text(enc, "wrong")
    with pytest.raises(ValueError, match="ppt password incorrect"):
        extract_ppt_text(enc)
    # deterministic fixtures
    assert enc == encode_ppt(texts, password="deckpw")
    # the encrypted body really is ciphertext: text absent from stream
    assert b"plain ascii slide" not in enc
    assert "unicodé".encode("utf-16-le") not in enc


def test_msg_extraction_and_sniffer_route():
    from pasardassist_spark.operators.cfb import write_cfb
    from pasardassist_spark.operators.docsniff import (
        extract_document,
        sniff_document,
    )
    from pasardassist_spark.operators.msgtext import encode_msg, extract_msg

    p = encode_msg("subj", "the body words", "alice",
                   ["a.txt", "ünicodé ✓.bin"])
    d = extract_msg(p)
    assert (d.subject, d.body, d.sender) == ("subj", "the body words", "alice")
    assert d.attachments == ["a.txt", "ünicodé ✓.bin"]
    assert sniff_document(p) == "msg"
    fmt, text = extract_document(p)
    assert fmt == "msg" and text == "the body words"
    # missing optional properties come back empty, not raising
    d2 = extract_msg(encode_msg("", ""))
    assert d2.subject == "" and d2.attachments == []
    # a property-less container is NOT a msg
    with pytest.raises(ValueError, match="no MAPI property streams"):
        extract_msg(write_cfb([("__properties_version1.0", b"\x00" * 16)]))
