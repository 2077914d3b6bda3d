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
