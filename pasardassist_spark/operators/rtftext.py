"""RTF text extraction — the legacy-Office member of the document-format
family (decades of .rtf documents circulate in enterprise crawls;
operators/pdftext.py / docxtext.py precedent).

A real group-aware parser, not regex substitution:

- brace groups tracked with a STATE STACK — each group inherits its
  parent's state (the \\uN skip count, destination-ness) and restores it
  on close, exactly RTF's scoping model;
- control words (``\\word`` with an optional signed numeric parameter
  and the spec's trailing-space delimiter rule) and control symbols
  (``\\{``, ``\\}``, ``\\\\``, ``\\~`` non-breaking space, ``\\-``/
  ``\\_`` hyphens);
- DESTINATIONS dropped wholesale: ``{\\*\\...}`` ignorable destinations
  and the known table set (``fonttbl``, ``colortbl``, ``stylesheet``,
  ``info``, ``pict``, ``field``, ``header``, ``footer``, ``footnote``) —
  their nested groups vanish with them;
- encoded characters: ``\\'hh`` hex escapes (cp1252-decoded) and
  ``\\uN`` signed 16-bit Unicode escapes with the \\ucN fallback-skip
  protocol (the N characters after \\uN are replacement fallbacks a
  Unicode-aware reader must SKIP);
- paragraph/line controls: ``\\par``/``\\line`` → newline, ``\\tab`` →
  tab, ``\\cell``/``\\row`` → separator space/newline.

Unbalanced braces and a non-RTF payload raise ``ValueError``.

The writer wraps text parts in rotating constructs (format runs, hex
and unicode escapes with fallbacks, ignorable destinations, tables in
the header) so every parser path runs on each document.
"""

from __future__ import annotations

import re

__all__ = ["encode_rtf", "rtf_to_text"]

_CW = re.compile(r"\\([a-z]+)(-?\d+)? ?", re.IGNORECASE)
_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "field",
    "header", "footer", "footnote", "themedata", "xmlnstbl",
    "generator", "operator",
}
_NEWLINE_WORDS = {"par": "\n", "line": "\n", "row": "\n", "cell": " ",
                  "tab": "\t"}


def rtf_to_text(src: str) -> str:
    """Extract the plain text of an RTF document."""
    if not src.startswith("{\\rtf"):
        raise ValueError("not an RTF payload")
    out: list[str] = []
    # state: (uc_skip_setting, in_destination)
    stack: list[tuple[int, bool]] = []
    uc_skip = 1
    dest = False
    pending_skip = 0  # \uN fallback characters still to swallow
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c == "{":
            stack.append((uc_skip, dest))
            i += 1
            continue
        if c == "}":
            if not stack:
                raise ValueError("unbalanced RTF braces")
            uc_skip, dest = stack.pop()
            i += 1
            continue
        if c == "\\":
            if i + 1 >= n:
                break
            nxt = src[i + 1]
            if nxt == "'":
                hh = src[i + 2 : i + 4]
                if len(hh) != 2:
                    raise ValueError("truncated RTF hex escape")
                if pending_skip:
                    pending_skip -= 1
                elif not dest:
                    out.append(bytes([int(hh, 16)]).decode("cp1252"))
                i += 4
                continue
            if nxt in "{}\\":
                if pending_skip:
                    pending_skip -= 1
                elif not dest:
                    out.append(nxt)
                i += 2
                continue
            if nxt == "~":
                if not dest and not pending_skip:
                    out.append(" ")
                i += 2
                continue
            if nxt in "-_":
                i += 2  # optional/non-breaking hyphens: dropped
                continue
            if nxt == "*":
                dest = True  # ignorable destination: group-scoped
                i += 2
                continue
            m = _CW.match(src, i)
            if not m:
                i += 2  # unknown control symbol
                continue
            word, param = m.group(1), m.group(2)
            i = m.end()
            if word == "u":
                if param is None:
                    raise ValueError("RTF \\u without a code point")
                cp = int(param)
                if cp < 0:
                    cp += 65536
                if not dest:
                    out.append(chr(cp))
                pending_skip = uc_skip
                continue
            if word == "uc":
                uc_skip = int(param or 0)
                continue
            if word in _DESTINATIONS:
                dest = True
                continue
            if word in _NEWLINE_WORDS and not dest:
                out.append(_NEWLINE_WORDS[word])
            continue
        if c in "\r\n":
            i += 1  # raw newlines are NOT text in RTF
            continue
        if pending_skip:
            pending_skip -= 1
            i += 1
            continue
        if not dest:
            out.append(c)
        i += 1
    if stack:
        raise ValueError("unbalanced RTF braces")
    return "".join(out)


# --------------------------------------------------------------- writer ---


def _rtf_escape(w: str) -> str:
    parts: list[str] = []
    for ch in w:
        o = ord(ch)
        if ch in "{}\\":
            parts.append("\\" + ch)
        elif o < 128:
            parts.append(ch)
        elif o < 256:
            parts.append(f"\\'{o:02x}")
        else:
            signed = o - 65536 if o > 32767 else o
            parts.append(f"\\u{signed}?")  # '?' is the \uc1 fallback
    return "".join(parts)


def encode_rtf(parts: list[str]) -> str:
    """Each part becomes one paragraph, rotating the grammar: plain,
    bold/italic format runs, hex-escaped, unicode-escaped with
    fallbacks, and an ignorable-destination-laced paragraph — behind a
    real header with font and color tables the extractor must skip."""
    body: list[str] = []
    for bi, part in enumerate(parts):
        words = [w for w in part.split(" ") if w]
        kind = bi % 5
        if kind == 0:
            body.append(_rtf_escape(" ".join(words)))
        elif kind == 1:
            dec = [
                ("{\\b " + _rtf_escape(w) + "}") if j % 2 == 0
                else ("{\\i " + _rtf_escape(w) + "}")
                for j, w in enumerate(words)
            ]
            body.append(" ".join(dec))
        elif kind == 2:
            # force hex escapes for EVERY character (ASCII included)
            dec = "".join(
                f"\\'{ord(ch):02x}" if ord(ch) < 256 else _rtf_escape(ch)
                for ch in " ".join(words)
            )
            body.append(dec)
        elif kind == 3:
            # unicode escapes with 2-char fallbacks under \uc2
            dec = "{\\uc2 " + "".join(
                f"\\u{ord(ch)}xx" if ord(ch) < 32768 else _rtf_escape(ch)
                for ch in " ".join(words)
            ) + "}"
            body.append(dec)
        else:
            body.append(
                "{\\*\\gibberish {\\nested junk}}"
                + _rtf_escape(" ".join(words))
                + "{\\field{\\*\\fldinst HYPERLINK}{\\fldrslt }}"
            )
        body.append("\\par ")
    return (
        "{\\rtf1\\ansi\\deff0"
        "{\\fonttbl{\\f0 Times New Roman;}{\\f1 Arial;}}"
        "{\\colortbl;\\red0\\green0\\blue0;\\red255\\green0\\blue0;}"
        "{\\info{\\title synthesized}}"
        + "".join(body)
        + "}"
    )
