"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``tweets_elastic_spark`` package; this module
only adapts its registry to the driver's API.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full tweet-document
    denormalization (queries.sql:18-71 — J1-J9/A1/P1-P4) over star tables
    derived from the fixtures, flattened to a stable primitive schema."""
    from tweets_elastic_spark import registry

    return registry.get("tweet_documents_flat").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tweets_elastic_spark import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    from tweets_elastic_spark import registry

    return registry.all_oracles()
