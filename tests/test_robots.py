"""robots.txt parsing + longest-match filtering vs REP semantics."""

from __future__ import annotations

from pii_detector_spark.operators.robots import (
    _parse_one,
    filter_disallowed,
    parse_robots,
)

ROBOTS_A = """
# comments ignored
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*.html
Disallow: /exact$

User-agent: trainingbot
Disallow: /no-train/
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""


def test_parse_one_groups_and_idioms():
    rows = _parse_one("a.com", ROBOTS_A)
    agents = {r[1] for r in rows}
    assert agents == {"*", "trainingbot"}
    star = [(r[2], r[3]) for r in rows if r[1] == "*"]
    assert (False, "/private/") in star and (True, "/private/ok/") in star
    # empty Disallow -> allow-all rule at priority 0
    b = _parse_one("b.com", ROBOTS_B)
    assert b == [("b.com", "*", True, "/", True, 0)]
    assert _parse_one("c.com", "") == []


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return parse_robots(df)


def test_filter_longest_match_precedence(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.com/private/x",),        # disallowed
            ("https://a.com/private/ok/x",),     # allow (longer) wins
            ("https://a.com/public/x",),         # no rule -> allowed
            ("https://a.com/tmp123.html",),      # wildcard disallow
            ("https://a.com/tmp/",),             # '*' needs the suffix
            ("https://a.com/exact",),            # $-anchored disallow
            ("https://a.com/exactly",),          # anchor doesn't match
            ("https://b.com/anything",),         # empty Disallow idiom
            ("https://c.com/whatever",),         # unknown host -> allowed
            ("https://a.com",),                  # bare host -> path '/'
        ],
        "url string",
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in filter_disallowed(urls, _rules(spark)).collect()
    }
    assert got == {
        "https://a.com/private/x": False,
        "https://a.com/private/ok/x": True,
        "https://a.com/public/x": True,
        "https://a.com/tmp123.html": False,
        "https://a.com/tmp/": True,
        "https://a.com/exact": False,
        "https://a.com/exactly": True,
        "https://b.com/anything": True,
        "https://c.com/whatever": True,
        "https://a.com": True,
    }


def test_named_group_shadows_star(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.com/no-train/x",),   # trainingbot group disallows
            ("https://a.com/private/x",),    # * group would disallow, but
                                             # the named group shadows it
        ],
        "url string",
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in filter_disallowed(
            urls, _rules(spark), agent="trainingbot/1.0"
        ).collect()
    }
    assert got["https://a.com/no-train/x"] is False
    assert got["https://a.com/private/x"] is True


def test_ports_and_case(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /x/")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [("HTTPS://A.COM:8443/x/1",)], "url string"
    )
    got = filter_disallowed(urls, rules).collect()[0]
    assert got["robots_allowed"] is False  # host lowercased, port stripped


def test_empty_user_agent_value_ignored():
    """A malformed empty 'User-agent:' must not become token '' (which
    contains-matches EVERY crawler and would shadow the '*' group)."""
    rows = _parse_one(
        "a.com",
        "User-agent:\nDisallow: /x/\nUser-agent: bot\nDisallow: /y/",
    )
    assert [(r[1], r[3]) for r in rows] == [("bot", "/y/")]
    # an empty-agent group alongside '*' no longer shadows it
    txt = "User-agent:\nDisallow: /x/\n\nUser-agent: *\nDisallow: /z/"
    rows = _parse_one("a.com", txt)
    assert [(r[1], r[3]) for r in rows] == [("*", "/z/")]


def test_broadcast_size_gate(spark):
    """Above broadcast_max_rules the hint is withheld (no broadcast in the
    optimized plan) and verdicts are identical on both paths."""
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("https://a.com/private/x",),
            ("https://a.com/public/x",),
            ("https://b.com/anything",),
        ],
        "url string",
    )
    hinted = filter_disallowed(urls, rules, broadcast_rules=True,
                               broadcast_max_rules=None)
    gated = filter_disallowed(urls, rules, broadcast_rules=True,
                              broadcast_max_rules=0)
    assert "broadcast" in hinted._jdf.queryExecution().optimizedPlan() \
        .toString().lower()
    assert "broadcast" not in gated._jdf.queryExecution().optimizedPlan() \
        .toString().lower()
    a = sorted(map(tuple, hinted.select("url", "robots_allowed").collect()))
    b = sorted(map(tuple, gated.select("url", "robots_allowed").collect()))
    assert a == b


def test_pattern_regex_pins_jvm_translation(spark):
    """_pattern_regex (the Python reference translation) and the JVM
    regexp_replace chain in filter_disallowed must agree on every REP
    pattern shape — pinned via verdict parity on adversarial patterns."""
    import re as _re

    from pii_detector_spark.operators.robots import _pattern_regex

    pats = ["/a*b$", "/w*", "/exact$", "/lit", "/do.t$", "/pl(us)+",
            "/b[r]ack", "/c^aret", "/d$mid/x", "/e*f*g$"]
    txt = "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in pats)
    rules = parse_robots(
        spark.createDataFrame(
            [("h.com", txt)], "host string, robots_txt string"
        )
    )
    paths = ["/a!!!b", "/ab", "/axb/tail", "/w", "/wZZZ", "/exact",
             "/exactly", "/lit/x", "/doXt", "/do.t", "/pl(us)+",
             "/plusus", "/b[r]ack", "/brack", "/c^aret", "/d$mid/x",
             "/eXfYg", "/eXfYg/h"]
    urls = spark.createDataFrame(
        [(f"https://h.com{p}",) for p in paths], "url string"
    )
    got = {
        r["url"].replace("https://h.com", ""): r["robots_allowed"]
        for r in filter_disallowed(urls, rules).collect()
    }
    for p in paths:
        py_disallowed = any(
            _re.match(_pattern_regex(pat), p) for pat in pats
        )
        assert got[p] is (not py_disallowed), (p, got[p])
