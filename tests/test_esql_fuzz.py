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
