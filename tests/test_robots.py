"""robots.txt (RFC 9309) parser + matcher: RFC example vectors for
longest-match, allow-on-tie, wildcards, end anchor, group selection and
merge, empty-disallow, comments, and the Spark-side gate semantics."""

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.robots import (
    _pattern_to_regex, parse_robots,
)


def _decide(txt, path, agent="*"):
    """Pure-python replica of robots_allowed_col's pick (longest rule,
    allow wins ties, no match = allowed) for parser-level vectors."""
    import re

    rules = parse_robots(txt, agent=agent)
    hits = [(r["ln"], r["allow"]) for r in rules
            if re.search(r["rx"].replace("\\z", "\\Z"), path)]
    if not hits:
        return True
    return max(hits)[1]


def test_pattern_translation():
    assert _pattern_to_regex("/p/") == "^/p/"
    assert _pattern_to_regex("/p/*.php") == "^/p/.*\\.php"
    assert _pattern_to_regex("/tmp/$") == "^/tmp/\\z"
    # '$' not at the end is literal
    assert _pattern_to_regex("/a$b") == "^/a\\$b"


def test_longest_match_and_allow_tie():
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/public/"
    assert _decide(txt, "/private/x") is False
    assert _decide(txt, "/private/public/y") is True  # longer allow wins
    assert _decide(txt, "/open") is True              # no match
    # RFC: equal-length allow/disallow -> allow wins
    tie = "User-agent: *\nDisallow: /page\nAllow: /page"
    assert _decide(tie, "/page") is True


def test_wildcard_and_end_anchor():
    txt = ("User-agent: *\nDisallow: /p/\nAllow: /p/4*\n"
           "Disallow: /tmp/$")
    assert _decide(txt, "/p/123") is False
    assert _decide(txt, "/p/456") is True    # /p/4* (len 5) beats /p/ (4)
    assert _decide(txt, "/tmp/") is False    # exact via $
    assert _decide(txt, "/tmp/z") is True    # anchor blocks prefix reach


def test_group_selection_and_merge():
    txt = ("User-agent: googlebot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /generic/\n\n"
           "User-agent: *\nDisallow: /second/")
    # '*' groups MERGE
    assert _decide(txt, "/generic/a") is False
    assert _decide(txt, "/second/b") is False
    assert _decide(txt, "/else") is True
    # specific agent picks ITS group (Disallow: / — everything blocked),
    # and the '*' groups do not apply to it
    assert _decide(txt, "/else", agent="googlebot") is False
    assert _decide(txt, "/anything", agent="googlebot") is False
    # longest agent token wins among prefix matches
    txt2 = ("User-agent: google\nDisallow: /a/\n\n"
            "User-agent: googlebot\nDisallow: /b/")
    assert _decide(txt2, "/a/x", agent="googlebot-news") is True
    assert _decide(txt2, "/b/x", agent="googlebot-news") is False


def test_multi_agent_group_and_noise():
    txt = ("# comment\nUser-agent: a\nUser-agent: *\n"
           "Crawl-delay: 5\nDisallow: /x/  # trailing comment\n"
           "Sitemap: https://e.com/s.xml\nDisallow:\n")
    assert _decide(txt, "/x/1") is False      # rule binds to the *-group
    assert _decide(txt, "/y") is True         # empty Disallow = no rule
    assert parse_robots(None) == []
    assert parse_robots("") == []
    assert _decide("Disallow: /orphan/", "/orphan/a") is True  # no group


def test_robots_gate_spark(spark):
    from tweets_elastic_spark.operators.curation import robots_gate

    pages = spark.createDataFrame(
        [(1, "https://a.com/private/x"),
         (2, "https://a.com/private/public/y"),
         (3, "https://a.com/open"),
         (4, "https://b.com/anything"),      # no robots row -> allowed
         (5, "https://c.com/tmp/"),
         (6, "https://c.com/tmp/deeper"),
         (7, "https://a.com")],              # empty path -> '/'
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n"
                   "Allow: /private/public/"),
         ("c.com", "User-agent: *\nDisallow: /tmp/$"),
         ("d.com", None)],
        "host string, robots_txt string",
    )
    got = sorted(
        r["doc_id"]
        for r in robots_gate(pages, robots, url_col="url").collect()
    )
    assert got == [2, 3, 4, 6, 7]
    # the decision column survives for auditing on kept rows
    row = robots_gate(pages, robots, url_col="url").filter(
        "doc_id = 2").head()
    assert row["robots_allowed"] is True
    # plan: no shuffle introduced by the gate beyond the broadcast join
    plan = robots_gate(pages, robots, url_col="url") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_robots_gate_matches_query_component(spark):
    # REP matching (RFC 9309 / the Google reference parser) is against
    # path PLUS query: 'Disallow: /*?session=' must fire on
    # '/q/a?session=1' even though the path alone contains no '?'
    from tweets_elastic_spark.operators.curation import robots_gate

    pages = spark.createDataFrame(
        [(1, "https://a.com/q/a?session=1"),
         (2, "https://a.com/q/a"),
         (3, "https://a.com/q/a?id=2"),
         (4, "https://a.com/?session=9")],   # empty path -> '/?session=9'
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /*?session=")],
        "host string, robots_txt string",
    )
    got = sorted(
        r["doc_id"]
        for r in robots_gate(pages, robots, url_col="url").collect()
    )
    assert got == [2, 3]
