"""LaTeX text extraction — the arXiv-corpus member of the
document-format family (scientific text is a major LLM pretraining
source; the de-macro/strip pass is what arXiv ingestion pipelines run
before quality filtering).

A real tokenizer-driven parser, not regex substitution:

- control sequences: ``\\word`` (letters, with following whitespace
  consumed per TeX rules) and ``\\X`` single-char control symbols;
  known text-argument commands (``\\emph``, ``\\textbf``, ``\\textit``,
  ``\\underline``, ``\\section`` family, ``\\caption``, ``\\footnote``)
  KEEP their argument text; known discard-argument commands
  (``\\label``, ``\\ref``, ``\\cite`` family, ``\\usepackage``,
  ``\\documentclass``, ``\\input``, ``\\include``, ``\\bibliography``)
  drop it; unknown commands are dropped, their brace groups left to
  normal processing;
- groups: ``{...}`` braces transparent to text flow (content kept),
  nesting tracked;
- math mode: ``$...$``, ``$$...$$``, ``\\(...\\)``, ``\\[...\\]`` and the
  ``equation``/``align`` environments produce NO text (the convention of
  arXiv-cleaning pipelines — math tokens poison word statistics);
- comments: ``%`` to end of line (respecting ``\\%`` escapes);
- environments: ``\\begin{name}...\\end{name}`` tracked by name —
  ``verbatim`` content is preserved VERBATIM, math environments are
  dropped, ``itemize``/``enumerate`` keep item text with ``\\item``
  consumed, ``tabular`` cell separators ``&`` become spaces;
- escapes: ``\\%``, ``\\&``, ``\\$``, ``\\#``, ``\\_``, ``\\{``, ``\\}``,
  ``~`` (non-breaking space), ``\\\\`` (line break → space).

Unbalanced groups and an unterminated verbatim raise ``ValueError``.

The writer wraps given text parts in rotating constructs so every parser
path runs on each document.
"""

from __future__ import annotations

import re

__all__ = ["encode_latex", "latex_to_text"]

_KEEP_ARG = {
    "emph", "textbf", "textit", "texttt", "underline", "section",
    "subsection", "subsubsection", "paragraph", "caption", "footnote",
    "title", "author", "chapter", "mbox", "text",
}
_DROP_ARG = {
    "label", "ref", "eqref", "pageref", "cite", "citep", "citet",
    "usepackage", "documentclass", "input", "include", "bibliography",
    "bibliographystyle", "vspace", "hspace", "includegraphics", "url",
}
_MATH_ENVS = {"equation", "equation*", "align", "align*", "math",
              "displaymath", "eqnarray", "eqnarray*"}

_LETTERS = re.compile(r"[A-Za-z]+")


def latex_to_text(src: str) -> str:
    """Extract the plain text of a LaTeX source fragment."""
    out: list[str] = []
    i, n = 0, len(src)
    depth = 0
    math = False

    def skip_ws(j: int) -> int:
        while j < n and src[j] in " \t":
            j += 1
        return j

    def read_group(j: int) -> tuple[str, int]:
        """src[j] == '{': return (content, pos after closing brace)."""
        if j >= n or src[j] != "{":
            return "", j
        d = 0
        k = j
        while k < n:
            c = src[k]
            if c == "\\":
                k += 2
                continue
            if c == "{":
                d += 1
            elif c == "}":
                d -= 1
                if d == 0:
                    return src[j + 1 : k], k + 1
            k += 1
        raise ValueError("unbalanced LaTeX group")

    while i < n:
        c = src[i]
        if c == "%":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "\\":
            if i + 1 >= n:
                break
            nxt = src[i + 1]
            if nxt in "%&$#_{}":
                if not math:
                    out.append(nxt)
                i += 2
                continue
            if nxt == "\\":
                if not math:
                    out.append(" ")
                i += 2
                continue
            if nxt == "(" or nxt == "[":
                math = True
                i += 2
                continue
            if nxt == ")" or nxt == "]":
                math = False
                i += 2
                continue
            m = _LETTERS.match(src, i + 1)
            if not m:
                i += 2  # control symbol like \, or \;
                continue
            name = m.group(0)
            j = skip_ws(m.end())
            if name in ("begin", "end"):
                env, j = read_group(j)
                if env in _MATH_ENVS:
                    math = name == "begin"
                elif env.startswith("tabular") and name == "begin":
                    # the column-spec argument {ll...} is not text
                    j = skip_ws(j)
                    _, j = read_group(j)
                elif env == "verbatim" and name == "begin":
                    close = src.find(r"\end{verbatim}", j)
                    if close == -1:
                        raise ValueError("unterminated verbatim environment")
                    out.append(src[j:close])
                    j = close + len(r"\end{verbatim}")
                i = j
                continue
            if math:
                i = m.end()
                continue
            if name in _KEEP_ARG:
                # optional [..] argument dropped, brace group text kept
                if j < n and src[j] == "[":
                    k = src.find("]", j)
                    j = k + 1 if k != -1 else j
                    j = skip_ws(j)
                grp, j = read_group(j)
                out.append(latex_to_text(grp))
                i = j
                continue
            if name in _DROP_ARG:
                if j < n and src[j] == "[":
                    k = src.find("]", j)
                    j = k + 1 if k != -1 else j
                    j = skip_ws(j)
                _, j = read_group(j)
                i = j
                continue
            if name == "item":
                out.append(" ")
                i = j
                continue
            i = m.end()  # unknown command: dropped, args flow as groups
            continue
        if c == "$":
            if i + 1 < n and src[i + 1] == "$":
                i += 2
            else:
                i += 1
            math = not math
            continue
        if math:
            i += 1
            continue
        if c == "{":
            depth += 1
            i += 1
            continue
        if c == "}":
            depth -= 1
            if depth < 0:
                raise ValueError("unbalanced LaTeX group")
            i += 1
            continue
        if c == "&" or c == "~":
            out.append(" ")
            i += 1
            continue
        out.append(c)
        i += 1
    if depth != 0:
        raise ValueError("unbalanced LaTeX group")
    return "".join(out)


# --------------------------------------------------------------- writer ---


def _tex_escape(w: str) -> str:
    return re.sub(r"([%&$#_{}\\~])", lambda m: "\\" + m.group(1), w)


def encode_latex(parts: list[str]) -> str:
    """Each part becomes one construct, rotating: section heading,
    emphasis-wrapped paragraph with citations, math-interleaved
    paragraph, itemize list, verbatim block, tabular row, and a
    comment-laced paragraph. Extraction recovers each part's words
    single-spaced (the query normalizes both sides)."""
    blocks: list[str] = []
    for bi, part in enumerate(parts):
        words = [w for w in part.split(" ") if w]
        kind = bi % 7
        if kind == 4:  # verbatim: content preserved byte-for-byte
            blocks.append(
                "\\begin{verbatim}" + " ".join(words) + "\\end{verbatim}"
            )
            continue
        ws = [_tex_escape(w) for w in words]
        if kind == 0:
            blocks.append(
                "\\section{" + " ".join(ws) + "}\\label{sec:" + str(bi) + "}"
            )
        elif kind == 1:
            dec = [
                f"\\emph{{{w}}}" if i % 3 == 0
                else f"\\textbf{{{w}}}" if i % 3 == 1 else w
                for i, w in enumerate(ws)
            ]
            blocks.append(" ".join(dec) + "\\cite{x" + str(bi) + "}")
        elif kind == 2:
            mid = len(ws) // 2
            blocks.append(
                " ".join(ws[:mid])
                + " $\\alpha^2 + \\beta_i$ "
                + ("\\[ \\int_0^1 f(x) dx \\] " if bi % 2 else "")
                + " ".join(ws[mid:])
            )
        elif kind == 3:
            items = "".join(f"\\item {w}\n" for w in ws) or "\\item\n"
            blocks.append("\\begin{itemize}\n" + items + "\\end{itemize}")
        elif kind == 5:
            blocks.append(
                "\\begin{tabular}{ll}\n" + "&".join(ws) + "\\\\\n"
                + "\\end{tabular}"
            )
        else:
            blocks.append(
                "% a comment line\n" + " ".join(ws)
                + " % trailing comment\n\\vspace{2em}"
            )
    return (
        "\\documentclass{article}\\usepackage{amsmath}\n\\begin{document}\n"
        + "\n\n".join(blocks)
        + "\n\\end{document}\n"
    )
