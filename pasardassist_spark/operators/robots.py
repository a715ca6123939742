"""robots.txt parsing and the RFC 9309 allow/disallow decision — the
crawl-frontier gate every pipeline that FETCHES (rather than receives)
documents runs before anything else touches a URL.

Grammar (RFC 9309 / the Google REP draft it standardized):

- groups of ``User-agent:`` lines followed by ``Allow:`` / ``Disallow:``
  rules; consecutive user-agent lines share one group; ``#`` comments,
  blank-line tolerance, CRLF, and case-insensitive field names;
- group selection: the group whose user-agent token exactly matches the
  product token (case-insensitive), else the ``*`` group, else no rules;
- rule matching on the URL PATH: ``*`` matches any char run, ``$``
  anchors the end, otherwise the pattern is a prefix;
- decision: the MOST SPECIFIC match wins — longest pattern in octets;
  on an allow/disallow tie the LEAST RESTRICTIVE (allow) wins; no match
  means allowed.  An empty ``Disallow:`` value disallows nothing.

``pattern_to_regex`` emits the equivalent anchored regex in the common
dialect Spark ``rlike`` and DuckDB ``regexp_matches`` share, so the
distributed gate (queries/curation.py:curate_robots_gate) evaluates the
SAME rule table on both engines.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_robots", "rules_for", "pattern_to_regex", "robots_decision",
]


def parse_robots(text: str) -> dict[str, list[tuple[str, str]]]:
    """{user-agent-token(lower): [(kind, pattern), ...]} in file order.
    Unknown fields (crawl-delay, sitemap) are skipped, not errors."""
    groups: dict[str, list[tuple[str, str]]] = {}
    current: list[str] = []  # user-agent tokens of the open group
    rules_seen_in_group = False
    for raw in text.replace("\r\n", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_seen_in_group:
                current = []
                rules_seen_in_group = False
            ua = value.lower()
            current.append(ua)
            groups.setdefault(ua, [])
        elif field in ("allow", "disallow"):
            rules_seen_in_group = True
            if not value:
                continue  # empty Disallow: allows everything
            for ua in current:
                groups[ua].append((field, value))
        # other fields: ignored
    return groups


def rules_for(text: str, ua: str) -> list[tuple[str, str]]:
    """The rule list governing product token ``ua``: its exact group if
    present, else the ``*`` group, else []."""
    groups = parse_robots(text)
    return groups.get(ua.lower(), groups.get("*", []))


def pattern_to_regex(pattern: str) -> str:
    """REP path pattern -> anchored regex valid in both Spark rlike and
    DuckDB regexp_matches: ``*`` -> ``.*``, trailing ``$`` -> end
    anchor, everything else literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.^$+?{}[]()|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def robots_decision(
    rules: list[tuple[str, str]], path: str
) -> tuple[bool, str | None]:
    """(allowed, winning_pattern): longest matching pattern wins, ties
    go to allow, no match allows."""
    best: tuple[int, int, str] | None = None  # (len, allow_pref, pattern)
    for kind, pattern in rules:
        if re.search(pattern_to_regex(pattern), path):
            key = (len(pattern), 1 if kind == "allow" else 0, pattern)
            if best is None or key > (best[0], best[1], best[2]):
                best = key
    if best is None:
        return True, None
    return best[1] == 1, best[2]
