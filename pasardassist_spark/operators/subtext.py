"""SRT / WebVTT subtitle parsing — the transcript member of the
multimodal family (video corpora ship speech as subtitle files;
the cue stream is what transcript-alignment pipelines consume).

Stdlib-only and REAL:

- SRT: numbered cue blocks separated by blank lines, ``HH:MM:SS,mmm``
  comma-millisecond timestamps, multi-line cue text;
- WebVTT: the ``WEBVTT`` signature line, optional cue identifiers,
  ``MM:SS.mmm`` / ``HH:MM:SS.mmm`` dot-millisecond timestamps (hours
  optional per spec), cue settings after the arrow ignored, ``NOTE``
  comment blocks and ``STYLE``/``REGION`` blocks skipped, and inline
  markup stripped: ``<b>``/``<i>``/``<u>``/``<v Speaker>``/``<c.class>``
  voice/class spans and ``<00:00:01.000>`` karaoke timestamps;
- overlap/ordering validation: a cue whose end precedes its start
  raises; files with no cues raise.

Malformed structure raises ``ValueError``.  The writers synthesize
conforming files (SRT and VTT, with VTT fixtures carrying voice/class
spans and karaoke tags) so the parsers run on genuine content.
"""

from __future__ import annotations

import re
from typing import NamedTuple

__all__ = ["Cue", "encode_srt", "encode_vtt", "parse_srt", "parse_vtt"]


class Cue(NamedTuple):
    cue_no: int
    start_ms: int
    end_ms: int
    text: str


_SRT_TIME = re.compile(r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})$")
_VTT_TIME = re.compile(r"^(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})$")
_ARROW = "-->"
_VTT_TAG = re.compile(r"</?[^>]*>")


def _srt_ms(tok: str) -> int:
    m = _SRT_TIME.match(tok)
    if not m:
        raise ValueError(f"bad SRT timestamp {tok!r}")
    h, mi, s, ms = (int(g) for g in m.groups())
    if mi > 59 or s > 59:
        raise ValueError(f"bad SRT timestamp {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _vtt_ms(tok: str) -> int:
    m = _VTT_TIME.match(tok)
    if not m:
        raise ValueError(f"bad WebVTT timestamp {tok!r}")
    h = int(m.group(1) or 0)
    mi, s, ms = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if mi > 59 or s > 59:
        raise ValueError(f"bad WebVTT timestamp {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _blocks(text: str) -> list[list[str]]:
    out: list[list[str]] = []
    cur: list[str] = []
    for line in text.split("\n"):
        if line.strip():
            cur.append(line)
        elif cur:
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out


def parse_srt(text: str) -> list[Cue]:
    cues: list[Cue] = []
    for block in _blocks(text):
        i = 0
        # the numeric index line is optional in the wild; skip if present
        if i < len(block) and block[i].strip().isdigit():
            i += 1
        if i >= len(block) or _ARROW not in block[i]:
            raise ValueError(f"SRT block without a timing line: {block[:2]!r}")
        left, _, right = block[i].partition(_ARROW)
        start = _srt_ms(left.strip())
        end = _srt_ms(right.strip())
        if end < start:
            raise ValueError(f"SRT cue ends before it starts: {block[i]!r}")
        cues.append(Cue(len(cues), start, end, "\n".join(block[i + 1 :])))
    if not cues:
        raise ValueError("SRT file has no cues")
    return cues


def parse_vtt(text: str) -> list[Cue]:
    if text.lstrip("﻿")[:6] != "WEBVTT":
        raise ValueError("missing WEBVTT signature")
    blocks = _blocks(text.lstrip("﻿"))
    cues: list[Cue] = []
    for bi, block in enumerate(blocks):
        if bi == 0 and block[0].startswith("WEBVTT"):
            block = block[1:]
            if not block:
                continue
        head = block[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        i = 0
        if _ARROW not in block[i]:
            i += 1  # cue identifier line
            if i >= len(block) or _ARROW not in block[i]:
                raise ValueError(
                    f"WebVTT cue without a timing line: {block[:2]!r}"
                )
        left, _, right = block[i].partition(_ARROW)
        start = _vtt_ms(left.strip())
        # settings (position/align/...) follow the end timestamp
        end_tok = right.strip().split(" ", 1)[0] if right.strip() else ""
        end = _vtt_ms(end_tok)
        if end < start:
            raise ValueError(f"WebVTT cue ends before it starts: {block[i]!r}")
        raw = "\n".join(block[i + 1 :])
        cues.append(Cue(len(cues), start, end, _VTT_TAG.sub("", raw)))
    if not cues:
        raise ValueError("WebVTT file has no cues")
    return cues


# -------------------------------------------------------------- writers ---


def _srt_time(ms: int) -> str:
    s, ms = divmod(ms, 1000)
    mi, s = divmod(s, 60)
    h, mi = divmod(mi, 60)
    return f"{h:02d}:{mi:02d}:{s:02d},{ms:03d}"


def _vtt_time(ms: int) -> str:
    s, ms = divmod(ms, 1000)
    mi, s = divmod(s, 60)
    h, mi = divmod(mi, 60)
    return f"{h:02d}:{mi:02d}:{s:02d}.{ms:03d}"


def encode_srt(cues: list[tuple[int, int, str]]) -> str:
    """(start_ms, end_ms, text) cues -> conforming SRT."""
    parts = []
    for i, (start, end, text) in enumerate(cues):
        parts.append(f"{i + 1}\n{_srt_time(start)} {_ARROW} {_srt_time(end)}\n{text}")
    return "\n\n".join(parts) + "\n"


def encode_vtt(cues: list[tuple[int, int, str]]) -> str:
    """(start_ms, end_ms, text) cues -> conforming WebVTT, with the cue
    text's words wrapped in rotating voice/class/bold spans and karaoke
    timestamps so the tag-stripping path is exercised on every file."""
    parts = ["WEBVTT", "NOTE synthesized fixture"]
    for i, (start, end, text) in enumerate(cues):
        words = text.split(" ")
        dec = []
        for j, w in enumerate(words):
            k = j % 4
            if k == 0:
                dec.append(f"<b>{w}</b>")
            elif k == 1:
                dec.append(f"<c.yellow>{w}</c>")
            elif k == 2:
                dec.append(f"<{_vtt_time(start + j)}>{w}")
            else:
                dec.append(w)
        body = " ".join(dec)
        parts.append(
            f"cue-{i}\n{_vtt_time(start)} {_ARROW} {_vtt_time(end)}"
            f" align:start position:10%\n<v Speaker{i % 3}>{body}</v>"
        )
    return "\n\n".join(parts) + "\n"
