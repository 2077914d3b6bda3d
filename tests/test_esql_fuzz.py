"""Differential fuzz for the ES|QL compiler: randomly generated pipe
programs run through plans/esql.py AND as hand-derived equivalent SQL on
DuckDB over the same parquet — value-hash compared via the shared oracle
harness. Two shapes per seed: a WHERE/EVAL/KEEP/SORT/LIMIT projection
pipeline (row-level semantics) and a WHERE/STATS..BY aggregation
pipeline (agg semantics). Every generated operator stays inside the
documented supported subset, so any mismatch is a compiler bug, not a
spec gap."""

from __future__ import annotations

import random

import pytest

from tests.oracle_harness import compare
from tweets_elastic_spark.plans.esql import esql
from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _cond(rng: random.Random, depth: int) -> tuple[str, str]:
    """-> (esql condition, equivalent DuckDB condition)."""
    if depth <= 0 or rng.random() < 0.45:
        kind = rng.randrange(5)
        if kind == 0:
            op = rng.choice(["==", "!=", "<", "<=", ">", ">="])
            k = rng.randint(0, 500)
            sop = {"==": "=", "!=": "<>"}.get(op, op)
            return f"n_chars {op} {k}", f"n_chars {sop} {k}"
        if kind == 1:
            v = rng.choice(["en", "de", "fr", "es"])
            if rng.random() < 0.5:
                return f'lang == "{v}"', f"lang = '{v}'"
            return f'lang != "{v}"', f"lang <> '{v}'"
        if kind == 2:
            vs = rng.sample(["en", "de", "fr", "es", "zh"], rng.randint(1, 3))
            e = ", ".join(f'"{v}"' for v in vs)
            s = ", ".join(f"'{v}'" for v in vs)
            return f"lang IN ({e})", f"lang IN ({s})"
        if kind == 3:
            n = rng.randint(0, 2)
            if rng.random() < 0.3:
                # the 8.16 pattern-list form: any-match (r15)
                n2 = rng.randint(0, 3)
                return (f'source LIKE ("src{n}*", "src{n2}*")',
                        f"(source LIKE 'src{n}%' OR "
                        f"source LIKE 'src{n2}%')")
            return (f'source LIKE "src{n}*"',
                    f"source LIKE 'src{n}%'")
        m = rng.randint(2, 9)
        r = rng.randrange(m)
        return f"doc_id % {m} == {r}", f"doc_id % {m} = {r}"
    a_e, a_s = _cond(rng, depth - 1)
    b_e, b_s = _cond(rng, depth - 1)
    join = rng.choice(["AND", "OR"])
    if rng.random() < 0.25:
        return f"NOT ({a_e}) {join} ({b_e})", \
               f"NOT ({a_s}) {join} ({b_s})"
    return f"({a_e}) {join} ({b_e})", f"({a_s}) {join} ({b_s})"


def _arith(rng: random.Random) -> tuple[str, str]:
    m, k, p = rng.randint(2, 9), rng.randint(1, 40), rng.randint(2, 7)
    forms = [
        (f"n_chars % {m} + doc_id % {p}",
         f"n_chars % {m} + doc_id % {p}"),
        (f"(n_chars + {k}) * {p}", f"(n_chars + {k}) * {p}"),
        (f"TO_LONG(n_chars / {p})",
         f"CAST(floor(n_chars / {p}.0) AS BIGINT)"),
        (f'LENGTH(CONCAT(lang, "-", source))',
         "CAST(length(lang || '-' || source) AS BIGINT)"),
        (f"ABS(doc_id - {k * 10})", f"abs(doc_id - {k * 10})"),
    ]
    return rng.choice(forms)


_AGGS = [
    ("n = COUNT(*)", "CAST(count(*) AS BIGINT) AS n"),
    ("s = SUM(n_chars)", "CAST(sum(n_chars) AS BIGINT) AS s"),
    ("a = ROUND(AVG(n_chars), 4)", "round(avg(n_chars), 4) AS a"),
    ("mx = MAX(doc_id)", "max(doc_id) AS mx"),
    ("dl = COUNT_DISTINCT(lang)",
     "CAST(count(DISTINCT lang) AS BIGINT) AS dl"),
    ("md = ROUND(MEDIAN(n_chars), 4)",
     "round(quantile_cont(n_chars, 0.5), 4) AS md"),
]

_KEYS = [("lang", "lang"), ("source", "source"),
         ("k = doc_id % 4", "doc_id % 4 AS k", "k")]


@pytest.mark.parametrize("seed", range(30))
def test_esql_fuzz_matches_duckdb(spark, seed):
    rng = random.Random(7000 + seed)
    docs = load_table(spark, SF, "documents")
    tabs = {"documents": docs}

    # shape A: projection pipeline
    ce, cs = _cond(rng, 2)
    ae, as_ = _arith(rng)
    lim = rng.randint(5, 60)
    q = (f"FROM documents | WHERE {ce} | EVAL x = {ae} "
         f"| KEEP doc_id, x | SORT doc_id | LIMIT {lim}")
    sql = (f"SELECT doc_id, {as_} AS x FROM documents WHERE {cs} "
           f"ORDER BY doc_id LIMIT {lim}")
    ok, msg = compare(esql(spark, q, tabs), sql, SF)
    assert ok, f"shape A seed {seed}: {msg}\n{q}\n{sql}"

    # shape B: aggregation pipeline
    ce, cs = _cond(rng, 2)
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    key = rng.choice(_KEYS)
    key_e, key_s = key[0], key[1]
    key_name = key[2] if len(key) == 3 else key[0]
    q = (f"FROM documents | WHERE {ce} "
         f"| STATS {', '.join(a for a, _ in aggs)} BY {key_e} "
         f"| SORT {key_name} ASC")
    sql = (f"SELECT {key_s}, {', '.join(s for _, s in aggs)} "
           f"FROM documents WHERE {cs} GROUP BY 1 ORDER BY 1")
    ok, msg = compare(esql(spark, q, tabs), sql, SF)
    assert ok, f"shape B seed {seed}: {msg}\n{q}\n{sql}"


_INLINE_AGGS = [
    ("mx = MAX(n_chars)", "max(n_chars) OVER (PARTITION BY {k}) AS mx",
     "n_chars == mx", "n_chars = mx"),
    ("mn = MIN(n_chars)", "min(n_chars) OVER (PARTITION BY {k}) AS mn",
     "n_chars == mn", "n_chars = mn"),
    ("c = COUNT(*)",
     "CAST(count(*) OVER (PARTITION BY {k}) AS BIGINT) AS c",
     "c > 10", "c > 10"),
]


def _filtered_agg(rng: random.Random) -> tuple[str, str]:
    """One per-aggregate-WHERE item (8.16, r15) + its CASE-conditional
    DuckDB replay."""
    ce, cs = _cond(rng, 1)
    forms = [
        (f"fn = COUNT(*) WHERE {ce}",
         f"CAST(count(CASE WHEN {cs} THEN 1 END) AS BIGINT) AS fn"),
        (f"fs = SUM(n_chars) WHERE {ce}",
         f"CAST(sum(CASE WHEN {cs} THEN n_chars END) AS BIGINT) AS fs"),
        (f"fm = MAX(n_chars) WHERE {ce}",
         f"max(CASE WHEN {cs} THEN n_chars END) AS fm"),
        (f"fd = COUNT_DISTINCT(lang) WHERE {ce}",
         f"CAST(count(DISTINCT CASE WHEN {cs} THEN lang END) AS BIGINT)"
         " AS fd"),
    ]
    return rng.choice(forms)


@pytest.mark.parametrize("seed", range(15))
def test_esql_stats_where_fuzz_matches_duckdb(spark, seed):
    """Shape D (r15): per-aggregate WHERE filters + the WEIGHTED_AVG /
    STD_DEV widening, vs CASE-conditional aggregates on DuckDB. The
    weighted average divides two EXACT integer sums, so the single
    double division is bit-deterministic cross-engine."""
    rng = random.Random(11000 + seed)
    docs = load_table(spark, SF, "documents")
    tabs = {"documents": docs}
    ce, cs = _cond(rng, 2)
    f1e, f1s = _filtered_agg(rng)
    key = rng.choice(["lang", "source"])
    q = (f"FROM documents | WHERE {ce} "
         f"| STATS n = COUNT(*), {f1e}, "
         f"sd = ROUND(STD_DEV(n_chars), 4), "
         f"wa = ROUND(WEIGHTED_AVG(n_chars, doc_id), 4) BY {key} "
         f"| SORT {key} ASC")
    sql = (f"SELECT {key}, CAST(count(*) AS BIGINT) AS n, {f1s}, "
           f"round(stddev_pop(n_chars), 4) AS sd, "
           f"round(sum(CASE WHEN n_chars IS NOT NULL AND doc_id IS NOT "
           f"NULL THEN n_chars * doc_id END) "
           f"/ sum(CASE WHEN n_chars IS NOT NULL AND doc_id IS NOT NULL "
           f"THEN doc_id END), 4) AS wa "
           f"FROM documents WHERE {cs} GROUP BY 1 ORDER BY 1")
    ok, msg = compare(esql(spark, q, tabs), sql, SF)
    assert ok, f"shape D seed {seed}: {msg}\n{q}\n{sql}"


@pytest.mark.parametrize("seed", range(10))
def test_esql_bucket_fuzz_matches_duckdb(spark, seed):
    """Shape E (r15): BUCKET numeric + fixed-width time spans as STATS
    BY keys, vs the same grid arithmetic on DuckDB."""
    rng = random.Random(12000 + seed)
    events = load_table(spark, SF, "events")
    tabs = {"events": events}
    w = rng.choice([5.0, 10.0, 25.0, 50.0])
    hrs = rng.randint(1, 12)
    q = (f"FROM events | WHERE ts IS NOT NULL "
         f"| STATS n = COUNT(*), mx = MAX(value) "
         f"BY vb = BUCKET(value, {w}), "
         f"tb = BUCKET(ts, {hrs} hours) "
         f'| EVAL tb = DATE_FORMAT("yyyy-MM-dd HH:mm", tb) '
         f"| SORT vb ASC NULLS LAST, tb ASC")
    width = hrs * 3600
    sql = (f"SELECT floor(value / {w}) * {w} AS vb, "
           f"strftime(to_timestamp(floor(epoch(ts) / {width}) * {width}),"
           f" '%Y-%m-%d %H:%M') AS tb, "
           f"CAST(count(*) AS BIGINT) AS n, max(value) AS mx "
           f"FROM events WHERE ts IS NOT NULL "
           f"GROUP BY 1, 2 ORDER BY 1 NULLS LAST, 2")
    ok, msg = compare(esql(spark, q, tabs), sql, SF)
    assert ok, f"shape E seed {seed}: {msg}\n{q}\n{sql}"


@pytest.mark.parametrize("seed", range(12))
def test_esql_inlinestats_fuzz_matches_duckdb(spark, seed):
    """Shape C (r14): WHERE -> INLINESTATS agg BY key -> WHERE on the
    appended column -> STATS, vs the identical SQL window pipeline."""
    rng = random.Random(9100 + seed)
    docs = load_table(spark, SF, "documents")
    tabs = {"documents": docs}
    ce, cs = _cond(rng, 2)
    key = rng.choice(["lang", "source"])
    agg_e, agg_s, flt_e, flt_s = rng.choice(_INLINE_AGGS)
    q = (f"FROM documents | WHERE {ce} "
         f"| INLINESTATS {agg_e} BY {key} "
         f"| WHERE {flt_e} "
         f"| STATS n = COUNT(*) BY {key} | SORT {key} ASC")
    sql = (f"WITH t AS (SELECT {key}, n_chars, "
           f"{agg_s.format(k=key)} "
           f"FROM documents WHERE {cs}) "
           f"SELECT {key}, CAST(count(*) AS BIGINT) AS n "
           f"FROM t WHERE {flt_s} GROUP BY 1 ORDER BY 1")
    ok, msg = compare(esql(spark, q, tabs), sql, SF)
    assert ok, f"shape C seed {seed}: {msg}\n{q}\n{sql}"
