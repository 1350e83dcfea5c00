"""robots.txt parsing: block grammar, comment handling, and composition with
the broadcast rule application (north rule: the host->rule map is derived
from fetched robots bodies, not handed in pre-parsed)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from openreviewcrawler_spark.operators.robots import apply_robots, parse_robots

BODY = "\n".join(
    [
        "# global banner comment",
        "User-agent: googlebot",
        "Disallow: /google-only",
        "",
        "User-agent: aux",
        "User-agent: *",  # maximal UA run: one header naming {aux, *}
        "Disallow: /tmp   # trailing comment",
        "Disallow:",  # empty value: ignored
        "Allow: /public",  # not part of the simplified grammar: ignored
        "Crawl-delay: 2",
        "Crawl-delay: 7",  # last one wins
        "",
        "User-agent: bingbot",
        "Disallow: /bing-only",
    ]
)

NO_STAR = "User-agent: googlebot\nDisallow: /x\nCrawl-delay: 9"


def test_parse_robots_block_grammar(spark):
    bodies = spark.createDataFrame(
        [("a.example", BODY), ("b.example", NO_STAR)], "host string, body string"
    )
    rows = {r["host"]: r for r in parse_robots(bodies).collect()}
    a = rows["a.example"]
    # only the {aux, *} block applies: not googlebot's, not bingbot's
    assert a["disallow_prefix"] == ["/tmp"]
    assert a["crawl_delay_s"] == 7.0
    # host with no star block: present, fully allowed, no delay
    b = rows["b.example"]
    assert b["disallow_prefix"] == [] and b["crawl_delay_s"] is None


def test_parse_robots_feeds_apply_robots(spark):
    """End-to-end: raw body -> parse -> broadcast rule application yields the
    same allow/deny + budget decisions as the equivalent pre-parsed table."""
    bodies = spark.createDataFrame([("h.example", BODY)], "host string, body string")
    rules = parse_robots(bodies).withColumn("max_per_round", F.lit(None).cast("int"))
    cand = spark.createDataFrame(
        [
            ("h.example", "https://h.example/tmp/page"),  # denied: /tmp prefix
            ("h.example", "https://h.example/ok/page"),
            ("unknown.example", "https://unknown.example/tmp/x"),  # no rule: allowed
        ],
        "host string, url string",
    )
    allowed, denied = apply_robots(cand, rules, default_budget=8, round_seconds=60.0)
    assert {r["url"] for r in denied.collect()} == {"https://h.example/tmp/page"}
    got = {r["url"]: r["budget"] for r in allowed.collect()}
    # delay 7 -> floor(60/7) = 8 capped by default 8; unknown host: default 8
    assert got == {
        "https://h.example/ok/page": 8,
        "https://unknown.example/tmp/x": 8,
    }


def test_parse_robots_delay_budget(spark):
    bodies = spark.createDataFrame(
        [("s.example", "User-agent: *\nCrawl-delay: 25")], "host string, body string"
    )
    rules = parse_robots(bodies).withColumn("max_per_round", F.lit(None).cast("int"))
    cand = spark.createDataFrame(
        [("s.example", "https://s.example/a")], "host string, url string"
    )
    allowed, _ = apply_robots(cand, rules, default_budget=8, round_seconds=60.0)
    assert allowed.collect()[0]["budget"] == 2  # floor(60/25)


def test_parse_robots_crlf_body(spark):
    """CRLF bodies (what most real servers serve) parse identically to LF:
    a bare-\\n split leaves '\\r' on every value, so 'User-agent: *\\r' never
    matches '*' and the host silently parses as fully allowed — the r4
    ADVICE politeness regression an LF-only fixture cannot catch."""
    bodies = spark.createDataFrame(
        [("crlf.example", BODY.replace("\n", "\r\n")), ("lf.example", BODY)],
        "host string, body string",
    )
    rows = {r["host"]: r for r in parse_robots(bodies).collect()}
    assert rows["crlf.example"]["disallow_prefix"] == rows["lf.example"]["disallow_prefix"] == ["/tmp"]
    assert rows["crlf.example"]["crawl_delay_s"] == rows["lf.example"]["crawl_delay_s"] == 7.0


def test_wildcard_rules_star_anchor_tie_and_default(spark):
    from openreviewcrawler_spark.operators.robots import apply_robots_wildcard

    frontier = spark.createDataFrame(
        [
            ("https://a.example/d/10",),   # '/d/*' deny vs '/d/*0' allow vs '/d/1*' deny
            ("https://a.example/d/15",),   # '/d/*' deny + '/d/1*' deny
            ("https://a.example/d/25",),   # only '/d/*' deny
            ("https://b.example/d/13",),   # '$' anchor: ends in 3 -> deny
            ("https://b.example/d/131",),  # does NOT end in 3 -> no match -> allow
            ("https://c.example/x",),      # rule-less host -> default allow
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.example", "/d/*", False),
            ("a.example", "/d/*0", True),   # len 5, allow
            ("a.example", "/d/1*", False),  # len 5, deny — ties with above on /d/10
            ("b.example", "/d/*3$", False),
        ],
        "host string, rule string, allow boolean",
    )
    out = {r["url"]: (r["allowed"], r["winning_rule"])
           for r in apply_robots_wildcard(frontier, rules).collect()}
    assert out["https://a.example/d/10"] == (True, "/d/*0")    # allow wins the tie
    assert out["https://a.example/d/15"] == (False, "/d/1*")   # longest deny
    assert out["https://a.example/d/25"] == (False, "/d/*")
    assert out["https://b.example/d/13"] == (False, "/d/*3$")
    assert out["https://b.example/d/131"] == (True, "")
    assert out["https://c.example/x"] == (True, "")


def test_wildcard_like_escape_handles_metacharacters(spark):
    from openreviewcrawler_spark.operators.robots import apply_robots_wildcard

    # literal '%' and '_' in a rule must match only themselves
    frontier = spark.createDataFrame(
        [("https://e.example/p%20x/1",), ("https://e.example/pA20x/1",),
         ("https://e.example/a_b",), ("https://e.example/aXb",)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("e.example", "/p%20x/*", False), ("e.example", "/a_b", False)],
        "host string, rule string, allow boolean",
    )
    out = {r["url"]: r["allowed"]
           for r in apply_robots_wildcard(frontier, rules).collect()}
    assert out["https://e.example/p%20x/1"] is False
    assert out["https://e.example/pA20x/1"] is True   # '%' was NOT a wildcard
    assert out["https://e.example/a_b"] is False
    assert out["https://e.example/aXb"] is True       # '_' was NOT a wildcard
