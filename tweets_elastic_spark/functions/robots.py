"""robots.txt (RFC 9309) parsing + allow/disallow matching — the crawl
politeness gate that sits next to the URL quality/blocklist filters in a
crawl->corpus pipeline (CommonCrawl honors robots at fetch time; serious
pipelines RE-CHECK at curation time because policies change and refetch
lists are built from the curated set).

Split by cost class, like the URL gates:

* ``parse_robots`` — pure Python over ONE robots.txt body. Robots bodies
  are small and per-HOST, so parsing runs once per host in an
  Arrow-batched pandas UDF over the hosts relation (thousands of rows),
  never per page. Emits (regex, pattern_length, allow) triples with the
  RFC wildcard translation (* = any chars, $ = end anchor) already
  compiled to an anchored RE2/Java-safe regex, so page-side matching is
  a pure JVM ``rlike``.
* ``robots_allowed_col`` — the page-side decision as ONE scan-local
  expression over the broadcast-joined rule array: longest-match wins,
  allow wins length ties, no match = allowed (RFC 9309 §2.2.2).

Group selection follows RFC 9309: a group is one or more user-agent
lines followed by rules; the crawler uses the group(s) whose agent
token is the LONGEST prefix match of its product token,
case-insensitively, falling back to the ``*`` group; rules from all
selected groups merge. Unknown directives (crawl-delay, sitemap, ...)
are ignored per spec. Reference pytest vectors mirror the RFC examples
(tests/test_robots.py)."""

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex: '*' matches any char
    run, a TRAILING '$' anchors the end, every other char is literal.
    A '$' not at the end is literal per spec."""
    out = []
    for i, ch in enumerate(pattern):
        if ch == "*":
            out.append(".*")
        elif ch == "$" and i == len(pattern) - 1:
            out.append("\\z")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out)


def parse_robots(txt: str | None, agent: str = "*") -> list[dict]:
    """Parse one robots.txt body into the rule list for ``agent``:
    [{"rx": anchored_regex, "ln": pattern_octets, "allow": bool}, ...].
    Missing/empty body or no applicable group -> [] (allow all)."""
    if not txt:
        return []
    agent_l = agent.lower()
    # group collection: (agent_tokens, rules) pairs
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agents = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if not in_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if not cur_agents:
                continue  # rules before any user-agent line: ignored
            if val == "":
                # empty (dis)allow = no pattern = no rule (RFC: an
                # empty Disallow means allow-all; expressed by simply
                # contributing nothing)
                continue
            cur_rules.append((val, key == "allow"))
        else:
            in_agents = False  # crawl-delay / sitemap / unknown: skip
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # RFC group selection: longest agent token that prefix-matches the
    # product token, else '*'; ALL groups with that token merge.
    best_token = None
    for agents, _ in groups:
        for a in agents:
            if a != "*" and agent_l.startswith(a):
                if best_token is None or len(a) > len(best_token):
                    best_token = a
    rules: list[tuple[str, bool]] = []
    want = best_token if best_token is not None else "*"
    for agents, rs in groups:
        if want in agents:
            rules.extend(rs)
    return [
        {"rx": _pattern_to_regex(p), "ln": len(p.encode()), "allow": al}
        for p, al in rules
    ]


ROBOTS_RULES_SCHEMA = "array<struct<rx:string,ln:int,allow:boolean>>"


def make_parse_udf(agent: str = "*"):
    """Arrow-batched parser over the per-host robots relation. Defined
    HERE (a module without ``from __future__ import annotations``)
    because pandas_udf reads the pd.Series type hints at definition
    time and stringified annotations defeat the inference."""

    @F.pandas_udf(ROBOTS_RULES_SCHEMA)
    def _parse(bodies: pd.Series) -> pd.Series:
        return bodies.map(
            lambda t: [
                (r["rx"], r["ln"], r["allow"])
                for r in parse_robots(t, agent=agent)
            ]
        )

    return _parse


def robots_allowed_col(path: Column, rules: Column) -> Column:
    """RFC 9309 decision for ``path`` against a parsed rule array:
    among matching rules the LONGEST pattern wins; at equal length
    Allow wins; no matching rule (or NULL rules — host without a
    robots.txt) = allowed. One scan-local expression: a HOF filter
    (JVM rlike per rule — rule arrays are small) + array_max over
    (length, allow) structs, the same lexicographic-pick idiom as
    dominant_script."""
    # NULL rules (host without a robots.txt) propagate NULL through
    # filter/transform/array_max and land in the isNull() -> allowed
    # branch — no typed-empty-array coalesce needed.
    matched = F.filter(rules, lambda r: F.rlike(path, r["rx"]))
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                r["ln"].alias("ln"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return F.element_at(
        F.transform(
            F.array(best),
            lambda b: F.when(b.isNull(), F.lit(True))
            .otherwise(b["a"] == 1),
        ),
        1,
    )
