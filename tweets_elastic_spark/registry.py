"""Query registry: the single source of truth for the driver contract.

Each entry couples a named Spark query (SURVEY §2 operator showcase) with an
ANSI-SQL oracle that DuckDB runs on the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash at sf=0.01
(see __spark_entry__.py). Registration notes:

* Alias every computed column IDENTICALLY in Spark and SQL.
* Keep result types hash-stable across engines: counts → BIGINT, money →
  exact DECIMAL sums cast to DOUBLE once at the end (bit-identical both
  sides), arrays → sorted arrays of primitives.
* Ops that SQL can't express (stateful streaming, LSH internals) register
  with ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: r.fn for n, r in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: r.oracle for n, r in _REGISTRY.items() if r.oracle is not None}


def get(name: str) -> RegisteredQuery:
    _ensure_loaded()
    return _REGISTRY[name]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import tweets_elastic_spark.queries  # noqa: F401  (registration side effects)

    _LOADED = True
