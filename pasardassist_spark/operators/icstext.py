"""iCalendar (RFC 5545) parsing — the scheduling member of the
document-format family (calendar exports circulate in enterprise
corpora; the event stream is structured training data).

Stdlib-only and REAL:

- CONTENT-LINE layer: physical lines are CRLF-separated and FOLDED at
  75 octets (a continuation line starts with one space or tab);
  unfolding must happen BEFORE any parsing — a property name or escape
  may be split across the fold;
- content lines split into name, optional ;-separated parameters
  (quoted parameter values may contain ``:`` and ``;``), and the value
  after the first unquoted ``:``;
- TEXT value unescaping: ``\\n``/``\\N`` → newline, ``\\,`` ``\\;``
  ``\\\\`` literal;
- component nesting via BEGIN:/END: with matching names enforced
  (VCALENDAR > VEVENT here; unknown components skipped intact);
- DATE-TIME values in the UTC form ``YYYYMMDDTHHMMSSZ`` parsed to an
  epoch through the same civil-date arithmetic as operators/feedtext.py
  (cross-checked against datetime in tests); non-UTC forms raise by
  name (timezone registries are out of scope for a text pass).

Malformed folding targets, unterminated components, and mismatched
END names raise ``ValueError``.
"""

from __future__ import annotations

from typing import NamedTuple

from pasardassist_spark.operators.feedtext import _days_from_civil

__all__ = ["IcsEvent", "encode_ics", "parse_ics"]


class IcsEvent(NamedTuple):
    event_no: int
    uid: str
    dtstart_epoch: int
    summary: str
    description: str


def _unfold(text: str) -> list[str]:
    lines = text.replace("\r\n", "\n").split("\n")
    out: list[str] = []
    for ln in lines:
        if ln[:1] in (" ", "\t"):
            if not out:
                raise ValueError("iCalendar continuation line at start")
            out[-1] += ln[1:]
        elif ln:
            out.append(ln)
    return out


def _split_content_line(ln: str) -> tuple[str, dict[str, str], str]:
    name = ""
    params: dict[str, str] = {}
    i, n = 0, len(ln)
    in_quote = False
    start = 0
    key: str | None = None
    while i < n:
        c = ln[i]
        if c == '"':
            in_quote = not in_quote
        elif not in_quote and c in ":;":
            seg = ln[start:i]
            if not name:
                name = seg.upper()
            elif key is None:
                raise ValueError(f"bad iCalendar parameter in {ln!r}")
            else:
                params[key] = seg.strip('"')
                key = None
            if c == ":":
                return name, params, ln[i + 1 :]
            # after ';' the next '=' separates the param name
            j = ln.find("=", i + 1)
            if j == -1:
                raise ValueError(f"iCalendar parameter without '=' in {ln!r}")
            key = ln[i + 1 : j].upper()
            i = j
            start = j + 1
        i += 1
    raise ValueError(f"iCalendar content line without ':' : {ln!r}")


def _unescape_text(v: str) -> str:
    out: list[str] = []
    i, n = 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\" and i + 1 < n:
            e = v[i + 1]
            if e in "nN":
                out.append("\n")
            elif e in ",;\\":
                out.append(e)
            else:
                out.append(e)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_utc_datetime(v: str) -> int:
    if len(v) != 16 or v[8] != "T" or not v.endswith("Z"):
        if len(v) in (8, 15):
            raise NotImplementedError(
                f"non-UTC iCalendar DATE-TIME {v!r} unsupported (floating/"
                "DATE forms need a timezone registry)"
            )
        raise ValueError(f"bad iCalendar DATE-TIME {v!r}")
    y, mo, d = int(v[0:4]), int(v[4:6]), int(v[6:8])
    h, mi, s = int(v[9:11]), int(v[11:13]), int(v[13:15])
    if not (1 <= mo <= 12 and 1 <= d <= 31 and h < 24 and mi < 60 and s < 60):
        raise ValueError(f"bad iCalendar DATE-TIME {v!r}")
    return _days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s


def parse_ics(text: str) -> list[IcsEvent]:
    lines = _unfold(text)
    stack: list[str] = []
    events: list[IcsEvent] = []
    cur: dict[str, str] = {}
    for ln in lines:
        name, params, value = _split_content_line(ln)
        if name == "BEGIN":
            stack.append(value.upper())
            if value.upper() == "VEVENT":
                cur = {}
            continue
        if name == "END":
            if not stack:
                raise ValueError(f"END:{value} without matching BEGIN")
            top = stack.pop()
            if top != value.upper():
                raise ValueError(f"END:{value} closes BEGIN:{top}")
            if value.upper() == "VEVENT":
                if "DTSTART" not in cur or "UID" not in cur:
                    raise ValueError("VEVENT missing UID or DTSTART")
                events.append(IcsEvent(
                    len(events),
                    cur.get("UID", ""),
                    _parse_utc_datetime(cur["DTSTART"]),
                    _unescape_text(cur.get("SUMMARY", "")),
                    _unescape_text(cur.get("DESCRIPTION", "")),
                ))
            continue
        if stack and stack[-1] == "VEVENT":
            cur[name] = value
    if stack:
        raise ValueError(f"unterminated iCalendar component {stack[-1]}")
    if not any(True for _ in events):
        raise ValueError("iCalendar stream has no VEVENTs")
    return events


# --------------------------------------------------------------- writer ---


def _escape_text(v: str) -> str:
    return (v.replace("\\", "\\\\").replace(",", "\\,")
            .replace(";", "\\;").replace("\n", "\\n"))


def _fmt_utc(epoch: int) -> str:
    from pasardassist_spark.operators.feedtext import _civil_from_days

    days, rem = divmod(epoch, 86400)
    h, rem2 = divmod(rem, 3600)
    mi, s = divmod(rem2, 60)
    y, mo, d = _civil_from_days(days)
    return f"{y:04d}{mo:02d}{d:02d}T{h:02d}{mi:02d}{s:02d}Z"


def _fold(line: str) -> str:
    """RFC 5545 folding at 75 octets (ASCII fixtures: octets == chars)."""
    if len(line) <= 75:
        return line
    parts = [line[:75]]
    i = 75
    while i < len(line):
        parts.append(" " + line[i : i + 74])
        i += 74
    return "\r\n".join(parts)


def encode_ics(events: list[tuple[str, int, str, str]]) -> str:
    """(uid, dtstart_epoch, summary, description) -> conforming stream
    with CRLF line ends, 75-octet folding (long descriptions fold
    mid-word), escaped text, and a parameterized property carrying a
    quoted ':'-containing value (exercises the quote-aware splitter)."""
    out = ["BEGIN:VCALENDAR", "VERSION:2.0",
           'PRODID;X-Q="a:b;c":-//synth//EN']
    for uid, ep, summ, desc in events:
        out.append("BEGIN:VEVENT")
        out.append(_fold(f"UID:{uid}"))
        out.append(f"DTSTART:{_fmt_utc(ep)}")
        out.append(_fold(f"SUMMARY:{_escape_text(summ)}"))
        out.append(_fold(f"DESCRIPTION:{_escape_text(desc)}"))
        out.append("END:VEVENT")
    out.append("END:VCALENDAR")
    return "\r\n".join(out) + "\r\n"
