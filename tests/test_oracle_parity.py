"""Every registered query with an oracle must hash-match it (the driver gate,
replicated locally at sf0.01 — SURVEY §5.2 item 1)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare
from tweets_elastic_spark import registry


def _oracle_cases():
    registry._ensure_loaded()
    return [name for name, r in registry._REGISTRY.items() if r.oracle is not None]


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, sf_correct, name):
    reg = registry.get(name)
    df = reg.fn(spark, sf_correct)
    ok, msg = compare(df, reg.oracle, sf_correct)
    assert ok, f"{name}: {msg}"


def _all_cases():
    registry._ensure_loaded()
    return list(registry._REGISTRY)


@pytest.mark.parametrize("name", _all_cases())
def test_query_runs_smoke(spark, sf_dir, name):
    """Every query (oracle or not) must run at sf0.001 with a stable schema."""
    reg = registry.get(name)
    df = reg.fn(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()


def test_approx_distinct_within_error_bound(spark, sf_correct):
    """HLL++ approximate distincts stay within 5% of the exact counts (the
    rsd=0.02 sketch's practical bound on this corpus). r12: the query
    itself emits the bound as booleans (the driver hash-checks them
    against the oracle's TRUE columns); here we assert the booleans hold
    and the exact counts match an independent computation."""
    from pyspark.sql import functions as F

    from tweets_elastic_spark.sources.catalog import load_table

    reg = registry.get("approx_distinct_profile")
    rows = reg.fn(spark, sf_correct).collect()
    exact = {
        r["lang"]: (r["s"], r["t"])
        for r in load_table(spark, sf_correct, "documents")
        .groupBy("lang")
        .agg(
            F.countDistinct("source").alias("s"),
            F.countDistinct(F.md5("text")).alias("t"),
        )
        .collect()
    }
    assert {r["lang"] for r in rows} == set(exact)
    for r in rows:
        assert r["sources_within_5pct"], r
        assert r["texts_within_5pct"], r
        assert (r["exact_sources"], r["exact_texts"]) == exact[r["lang"]], r
