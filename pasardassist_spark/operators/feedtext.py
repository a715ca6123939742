"""RSS 2.0 / Atom feed parsing — the syndication member of the
document-format family (feed XML is how crawlers DISCOVER most fresh
web content; the entry stream is a first-class crawl input).

Stdlib-only and REAL:

- RSS 2.0: ``rss > channel > item`` with ``title``/``link``/
  ``pubDate``/``description``; pubDate is RFC-822/1123
  (``Mon, 07 Aug 2023 14:30:05 +0130`` — named weekday optional, named
  month, numeric ``+hhmm`` offsets and the named zones GMT/UT/UTC/Z and
  US EST..PDT), parsed to an epoch;
- Atom 1.0 (namespace-aware): ``feed > entry`` with ``title``,
  ``link[@href]`` (the first ``rel='alternate'`` or unqualified link),
  ``updated``/``published`` in ISO-8601 / RFC-3339 (``Z`` or
  ``±hh:mm`` offsets, optional fractional seconds), ``summary`` or
  ``content``;
- malformed XML, unknown root elements, and unparseable dates raise
  ``ValueError``.

The writers synthesize conforming feeds so both dialects and both date
grammars run on genuine bytes end-to-end.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import NamedTuple

__all__ = ["FeedEntry", "encode_atom", "encode_rss", "parse_feed",
           "parse_rfc822_date", "parse_rfc3339_date"]

_ATOM_NS = "http://www.w3.org/2005/Atom"

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}
_NAMED_ZONES = {"GMT": 0, "UT": 0, "UTC": 0, "Z": 0,
                "EST": -500, "EDT": -400, "CST": -600, "CDT": -500,
                "MST": -700, "MDT": -600, "PST": -800, "PDT": -700}

_RFC822 = re.compile(
    r"^(?:[A-Za-z]{3},\s+)?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{2,4})\s+"
    r"(\d{2}):(\d{2})(?::(\d{2}))?\s+([+-]\d{4}|[A-Za-z]{1,3})$"
)
_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})(?:\.\d+)?"
    r"(Z|z|[+-]\d{2}:\d{2})$"
)


class FeedEntry(NamedTuple):
    entry_no: int
    title: str
    link: str
    ts_epoch: int
    summary: str


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Howard Hinnant's days-from-civil (proleptic Gregorian)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _epoch(y, mo, d, h, mi, s, off_minutes) -> int:
    return (_days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s
            - off_minutes * 60)


def parse_rfc822_date(s: str) -> int:
    m = _RFC822.match(s.strip())
    if not m:
        raise ValueError(f"bad RFC-822 date {s!r}")
    d, mon, y, h, mi, sec, zone = m.groups()
    if mon not in _MONTHS:
        raise ValueError(f"bad RFC-822 month {mon!r}")
    # RFC 822 allowed 2-digit years; RFC 2822 §4.3 windows them:
    # 00-49 → 2000s, 50-99 → 1900s, and 3-digit years add 1900.
    if len(y) == 2:
        y = str((2000 if int(y) < 50 else 1900) + int(y))
    elif len(y) == 3:
        y = str(1900 + int(y))
    sec = sec or "0"  # RSS in the wild commonly omits :ss
    if zone[0] in "+-":
        off = int(zone[1:3]) * 60 + int(zone[3:5])
        off = -off if zone[0] == "-" else off
    elif zone in _NAMED_ZONES:
        raw = _NAMED_ZONES[zone]
        off = (abs(raw) // 100 * 60 + abs(raw) % 100) * (-1 if raw < 0 else 1)
    else:
        raise ValueError(f"unknown RFC-822 zone {zone!r}")
    return _epoch(int(y), _MONTHS[mon], int(d), int(h), int(mi), int(sec), off)


def parse_rfc3339_date(s: str) -> int:
    m = _RFC3339.match(s.strip())
    if not m:
        raise ValueError(f"bad RFC-3339 date {s!r}")
    y, mo, d, h, mi, sec, zone = m.groups()
    if zone in ("Z", "z"):
        off = 0
    else:
        off = int(zone[1:3]) * 60 + int(zone[4:6])
        off = -off if zone[0] == "-" else off
    return _epoch(int(y), int(mo), int(d), int(h), int(mi), int(sec), off)


def parse_feed(xml: str) -> tuple[str, str, list[FeedEntry]]:
    """Returns (kind, feed_title, entries) with kind 'rss' or 'atom'."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"malformed feed XML: {exc}") from exc
    if root.tag == "rss":
        ch = root.find("channel")
        if ch is None:
            raise ValueError("RSS feed without a channel")
        title = (ch.findtext("title") or "").strip()
        entries = []
        for i, item in enumerate(ch.findall("item")):
            pd_ = item.findtext("pubDate")
            if pd_ is None:
                raise ValueError(f"RSS item {i} missing pubDate")
            entries.append(FeedEntry(
                i,
                (item.findtext("title") or "").strip(),
                (item.findtext("link") or "").strip(),
                parse_rfc822_date(pd_),
                (item.findtext("description") or "").strip(),
            ))
        return "rss", title, entries
    if root.tag == f"{{{_ATOM_NS}}}feed":
        title = (root.findtext(f"{{{_ATOM_NS}}}title") or "").strip()
        entries = []
        for i, e in enumerate(root.findall(f"{{{_ATOM_NS}}}entry")):
            ts = e.findtext(f"{{{_ATOM_NS}}}updated") or e.findtext(
                f"{{{_ATOM_NS}}}published"
            )
            if ts is None:
                raise ValueError(f"Atom entry {i} missing updated/published")
            link = ""
            for ln in e.findall(f"{{{_ATOM_NS}}}link"):
                if ln.get("rel") in (None, "alternate"):
                    link = ln.get("href") or ""
                    break
            body = e.findtext(f"{{{_ATOM_NS}}}summary")
            if body is None:
                body = e.findtext(f"{{{_ATOM_NS}}}content") or ""
            entries.append(FeedEntry(
                i,
                (e.findtext(f"{{{_ATOM_NS}}}title") or "").strip(),
                link.strip(),
                parse_rfc3339_date(ts),
                body.strip(),
            ))
        return "atom", title, entries
    raise ValueError(f"unknown feed root element {root.tag!r}")


# -------------------------------------------------------------- writers ---

_DOW = ["Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed"]  # epoch day 0 = Thu
_MONTH_NAMES = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _civil_from_days(z: int) -> tuple[int, int, int]:
    z += 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    return y + (m <= 2), m, d


def _fmt_rfc822(epoch: int, off_minutes: int) -> str:
    local = epoch + off_minutes * 60
    days, rem = divmod(local, 86400)
    h, rem = divmod(rem, 3600)
    mi, s = divmod(rem, 60)
    y, mo, d = _civil_from_days(days)
    sign = "+" if off_minutes >= 0 else "-"
    a = abs(off_minutes)
    return (f"{_DOW[days % 7]}, {d:02d} {_MONTH_NAMES[mo - 1]} {y} "
            f"{h:02d}:{mi:02d}:{s:02d} {sign}{a // 60:02d}{a % 60:02d}")


def _fmt_rfc3339(epoch: int, off_minutes: int) -> str:
    local = epoch + off_minutes * 60
    days, rem = divmod(local, 86400)
    h, rem = divmod(rem, 3600)
    mi, s = divmod(rem, 60)
    y, mo, d = _civil_from_days(days)
    if off_minutes == 0:
        z = "Z"
    else:
        sign = "+" if off_minutes >= 0 else "-"
        a = abs(off_minutes)
        z = f"{sign}{a // 60:02d}:{a % 60:02d}"
    return f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}{z}"


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def encode_rss(
    title: str, entries: list[tuple[str, str, int, int, str]]
) -> str:
    """entries: (title, link, epoch, offset_minutes, summary)."""
    items = "".join(
        f"<item><title>{_esc(t)}</title><link>{_esc(ln)}</link>"
        f"<pubDate>{_fmt_rfc822(ep, off)}</pubDate>"
        f"<description>{_esc(sm)}</description></item>"
        for t, ln, ep, off, sm in entries
    )
    return (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        f"<title>{_esc(title)}</title><link>http://x/</link>"
        f"<description>d</description>{items}</channel></rss>"
    )


def encode_atom(
    title: str, entries: list[tuple[str, str, int, int, str]]
) -> str:
    es = "".join(
        f"<entry><title>{_esc(t)}</title>"
        f'<link rel="alternate" href="{_esc(ln)}"/>'
        f"<updated>{_fmt_rfc3339(ep, off)}</updated>"
        f"<summary>{_esc(sm)}</summary><id>urn:{i}</id></entry>"
        for i, (t, ln, ep, off, sm) in enumerate(entries)
    )
    return (
        f'<?xml version="1.0"?><feed xmlns="{_ATOM_NS}">'
        f"<title>{_esc(title)}</title><id>urn:f</id>"
        f"<updated>{_fmt_rfc3339(0, 0)}</updated>{es}</feed>"
    )
