"""Markdown text extraction — the developer-corpus member of the
document-format family (GitHub/readme content dominates code-adjacent
crawls; operators/pdftext.py / epubtext.py precedent).

A CommonMark-subset parser, implemented as a real two-level pass rather
than a pile of regex substitutions:

- BLOCK level: paragraphs split on blank lines; ATX headings (``#``
  through ``######``, with the optional closing hash run); fenced code
  blocks (``` or ~~~, content preserved VERBATIM — inline rules must not
  fire inside them); blockquotes (``>`` prefix stripped per line,
  lazily-continued lines included); list items (``-``/``*``/``+`` and
  ``1.``-style ordered markers); thematic breaks (``---``/``***``/
  ``___``) dropped.
- INLINE level, applied to non-code blocks: code spans (backtick runs
  of any length, content verbatim, closed by a MATCHING-length run);
  images ``![alt](url)`` → alt; links ``[text](url)`` → text (nested
  inline markup inside the text re-processed); emphasis ``**``/``*``/
  ``__``/``_`` delimiters stripped; backslash escapes of ASCII
  punctuation unescaped.

``extract_markdown_blocks`` returns the plain text of each block in
document order.  ``markdown_to_text`` joins them with newlines.

The writer synthesizes markdown that wraps a given text's words in
rotating constructs (heading / emphasis / links / code spans / quotes /
lists / fences) so the extractor is exercised across the full grammar on
every document.
"""

from __future__ import annotations

import re

__all__ = ["encode_markdown", "extract_markdown_blocks", "markdown_to_text"]

_FENCE_RE = re.compile(r"^(```+|~~~+)\s*([^`\s]*)\s*$")
_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)(?:\s+#+\s*)?$")
_THEMATIC_RE = re.compile(r"^ {0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
_LIST_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])\s+(.*)$")


def extract_markdown_blocks(md: str) -> list[str]:
    """Parse markdown into plain-text blocks in document order."""
    blocks: list[str] = []
    lines = md.split("\n")
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        m = _FENCE_RE.match(line.strip())
        if m:
            fence = m.group(1)[0] * len(m.group(1))
            i += 1
            content: list[str] = []
            while i < n:
                close = lines[i].strip()
                if close.startswith(fence) and set(close) <= {fence[0]}:
                    i += 1
                    break
                content.append(lines[i])
                i += 1
            else:
                raise ValueError("unterminated fenced code block")
            blocks.append("\n".join(content))
            continue
        if _THEMATIC_RE.match(line):
            i += 1
            continue
        m = _ATX_RE.match(line.strip())
        if m:
            blocks.append(_inline(m.group(2)))
            i += 1
            continue
        if line.lstrip().startswith(">"):
            quoted: list[str] = []
            while i < n and lines[i].strip() and not _THEMATIC_RE.match(lines[i]):
                s = lines[i].lstrip()
                quoted.append(s[1:].lstrip() if s.startswith(">") else s)
                i += 1
            blocks.append(_inline(" ".join(quoted)))
            continue
        m = _LIST_RE.match(line)
        if m:
            while i < n:
                lm = _LIST_RE.match(lines[i])
                if lm is None:
                    break
                blocks.append(_inline(lm.group(1)))
                i += 1
            continue
        para: list[str] = []
        while i < n and lines[i].strip():
            if (
                _FENCE_RE.match(lines[i].strip())
                or _ATX_RE.match(lines[i].strip())
                or _LIST_RE.match(lines[i])
                or _THEMATIC_RE.match(lines[i])
            ):
                break
            para.append(lines[i].strip())
            i += 1
        blocks.append(_inline(" ".join(para)))
    return blocks


def markdown_to_text(md: str) -> str:
    return "\n".join(extract_markdown_blocks(md))


_ESCAPABLE = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def _inline(s: str) -> str:
    """Strip inline markup: code spans first (their content is verbatim
    and shields everything inside), then images/links, then emphasis
    delimiters, then backslash escapes."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n and s[i + 1] in _ESCAPABLE:
            out.append(s[i + 1])
            i += 2
            continue
        if c == "`":
            j = i
            while j < n and s[j] == "`":
                j += 1
            run = j - i
            close = s.find("`" * run, j)
            # a longer run would also match; scan for an EXACT run
            while close != -1:
                end = close + run
                if end < n and s[end] == "`":
                    k = end
                    while k < n and s[k] == "`":
                        k += 1
                    close = s.find("`" * run, k)
                    continue
                break
            if close == -1:
                out.append(s[i:j])
                i = j
                continue
            code = s[j:close]
            # CommonMark: one leading+trailing space stripped if both
            # present and content isn't all spaces
            if len(code) >= 2 and code[0] == " " and code[-1] == " " and code.strip():
                code = code[1:-1]
            out.append(code)
            i = close + run
            continue
        if c == "!" and i + 1 < n and s[i + 1] == "[":
            txt, end = _bracketed(s, i + 1)
            if txt is not None:
                out.append(_inline(txt))
                i = end
                continue
        if c == "[":
            txt, end = _bracketed(s, i)
            if txt is not None:
                out.append(_inline(txt))
                i = end
                continue
        if c in "*_":
            i += 1  # emphasis delimiter: dropped
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _bracketed(s: str, i: int) -> tuple[str | None, int]:
    """Parse [text](dest) starting at the '[' — returns (text, end) or
    (None, i) when it isn't a link."""
    depth = 0
    j = i
    n = len(s)
    while j < n:
        if s[j] == "\\":
            j += 2
            continue
        if s[j] == "[":
            depth += 1
        elif s[j] == "]":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if j >= n or j + 1 >= n or s[j + 1] != "(":
        return None, i
    k = s.find(")", j + 2)
    if k == -1:
        return None, i
    return s[i + 1 : j], k + 1


# --------------------------------------------------------------- writer ---


def _md_escape(w: str) -> str:
    return re.sub(r"([\\`*_\[\]()!#>~])", r"\\\1", w)


def encode_markdown(parts: list[str]) -> str:
    """Each part becomes one markdown block, rotating the grammar:
    heading, bold/italic-wrapped paragraph, link-and-image paragraph,
    blockquote, list items collapsed to one block each, code span
    paragraph, and a verbatim code fence — with thematic breaks
    interleaved (they extract to nothing)."""
    blocks: list[str] = []
    for bi, part in enumerate(parts):
        words = [w for w in part.split(" ") if w]
        kind = bi % 7
        if kind == 5:  # code fence: content verbatim (no escaping needed)
            blocks.append("```\n" + " ".join(words) + "\n```")
            blocks.append("---")
            continue
        ws = [_md_escape(w) for w in words]
        if kind == 0:
            blocks.append("# " + " ".join(ws) if ws else "#  ")
        elif kind == 1:
            dec = [
                f"**{w}**" if i % 3 == 0 else f"*{w}*" if i % 3 == 1 else w
                for i, w in enumerate(ws)
            ]
            blocks.append(" ".join(dec))
        elif kind == 2:
            dec = [
                f"[{w}](http://x/{i})" if i % 2 == 0 else f"![{w}](y.png)"
                for i, w in enumerate(ws)
            ]
            blocks.append(" ".join(dec))
        elif kind == 3:
            blocks.append("> " + " ".join(ws))
        elif kind == 4:
            # all words on ONE list item (one block per part contract)
            blocks.append("- " + " ".join(ws) if ws else "- ")
        else:  # kind == 6: code spans over raw words (verbatim content)
            dec = [f"`{w}`" if i % 2 == 0 else _md_escape(w)
                   for i, w in enumerate(words)]
            blocks.append(" ".join(dec))
        blocks.append("***")
    return "\n\n".join(blocks)
