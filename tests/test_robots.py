"""robots.txt gate (llm/robots.py, round 13): parser group selection,
pattern precedence, and the Spark decision lane. The declared
robots_gate query hash-verifies the end-to-end stack against a
hand-derived truth table; these tests pin the parser's spec corners."""

from __future__ import annotations

from egal_yet_another_earthquake_project_spark.llm.robots import (
    _pattern_rx,
    parse_robots,
    robots_allowed,
    robots_rules,
)


def test_pattern_rx_translation():
    assert _pattern_rx("/private/") == "^/private/"
    assert _pattern_rx("/*.pdf$") == "^/.*\\.pdf$"
    assert _pattern_rx("/a*/b") == "^/a.*/b"
    # non-trailing $ is literal
    assert _pattern_rx("/a$b") == "^/a\\$b"


def test_agent_group_shadows_star_group():
    txt = (
        "User-agent: egalbot\nDisallow: /*.pdf$\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    rules = parse_robots(txt, "egalbot")
    assert [(p, a) for p, a, _, _ in rules] == [("/*.pdf$", False)]
    # a different crawler falls to the * group
    rules = parse_robots(txt, "otherbot")
    assert [(p, a) for p, a, _, _ in rules] == [("/", False)]


def test_shared_ua_lines_comments_and_empty_disallow():
    txt = (
        "# politeness\n"
        "User-agent: a\nUser-agent: egalbot\n"
        "Disallow:\n"          # empty = allow-all, contributes no rule
        "Disallow: /x # inline comment\n"
        "BadLineWithoutColon\n"
    )
    rules = parse_robots(txt, "egalbot")
    assert [(p, a) for p, a, _, _ in rules] == [("/x", False)]
    assert parse_robots("", "egalbot") == []
    assert parse_robots(None, "egalbot") == []


def test_longest_pattern_wins_and_allow_breaks_ties(spark):
    robots = spark.createDataFrame(
        [
            (
                "ex.com",
                "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n"
                "Allow: /tie\nDisallow: /tie\n",
            )
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots, agent="egalbot")
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/p/x"),        # denied by /p/
            (2, "https://ex.com/p/ok/x"),     # longer Allow wins
            (3, "https://ex.com/tie"),        # equal length: Allow wins
            (4, "https://ex.com/free"),       # no rule: default allow
            (5, "https://other.com/p/x"),     # no rules for domain
            (6, "https://EX.com/p/x"),        # host case-insensitive
        ],
        "id long, url string",
    )
    got = {
        r.id: r.allowed for r in robots_allowed(urls, rules).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True, 5: True, 6: False}
