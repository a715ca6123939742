"""RFC 9309 robots.txt parsing + decision (operators/robots.py)."""

from __future__ import annotations

from pasardassist_spark.operators.robots import (
    parse_robots,
    pattern_to_regex,
    robots_decision,
    rules_for,
)

SAMPLE = (
    "# policy\r\n"
    "User-agent: alpha\r\n"
    "User-agent: beta\r\n"
    "Disallow: /a/\r\n"
    "Allow: /a/ok/\r\n"
    "\r\n"
    "User-agent: alpha\r\n"  # second group for same token: rules combine
    "Disallow: /b/\r\n"
    "\r\n"
    "User-agent: *\r\n"
    "Disallow: /c/\r\n"
    "Crawl-delay: 10\r\n"
    "Sitemap: http://x/s.xml\r\n"
)


def test_group_continuation_and_combination():
    g = parse_robots(SAMPLE)
    assert g["beta"] == [("disallow", "/a/"), ("allow", "/a/ok/")]
    # alpha's two groups combine in file order
    assert g["alpha"] == [
        ("disallow", "/a/"), ("allow", "/a/ok/"), ("disallow", "/b/"),
    ]
    assert g["*"] == [("disallow", "/c/")]


def test_group_selection_exact_then_star():
    assert rules_for(SAMPLE, "BETA") == parse_robots(SAMPLE)["beta"]
    assert rules_for(SAMPLE, "unknownbot") == [("disallow", "/c/")]
    assert rules_for("User-agent: x\nDisallow: /\n", "y") == []


def test_empty_disallow_allows_everything():
    rules = rules_for("User-agent: *\nDisallow:\n", "any")
    assert rules == []
    assert robots_decision(rules, "/anything") == (True, None)


def test_pattern_translation():
    assert pattern_to_regex("/a/") == "^/a/"
    assert pattern_to_regex("/*.zip$") == "^/.*\\.zip$"
    assert pattern_to_regex("/p/*/draft") == "^/p/.*/draft"


def test_longest_match_wins_and_allow_breaks_ties():
    rules = [
        ("disallow", "/private/"),
        ("allow", "/private/pub/"),
        ("disallow", "/*.zip$"),
    ]
    assert robots_decision(rules, "/private/x") == (False, "/private/")
    assert robots_decision(rules, "/private/pub/x") == (True, "/private/pub/")
    assert robots_decision(rules, "/d/f.zip") == (False, "/*.zip$")
    assert robots_decision(rules, "/d/f.zip.txt") == (True, None)
    assert robots_decision(rules, "/open/") == (True, None)
    # exact-length tie between allow and disallow: allow wins
    tie = [("disallow", "/t/x/"), ("allow", "/t/y/")]
    assert robots_decision(tie + [("allow", "/t/x/")], "/t/x/1") == (
        True, "/t/x/",
    )
