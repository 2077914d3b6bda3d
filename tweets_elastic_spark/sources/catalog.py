"""Table catalog: strict-schema parquet scans (SURVEY §2.1 S1-S4).

The reference streams rows out of Postgres through a server-side cursor with
keyset pagination (src/main.py:41,98-100,118-124) because a single client
must not materialize 32 M rows. In Spark the scan itself is distributed and
lazy, so the whole mechanism collapses into ``spark.read.schema(...).parquet``:
partition parallelism replaces the pagination loop, the vectorized reader
replaces fetchmany batching, and predicate pushdown replaces the keyset
predicate. ``incremental.py`` keeps an explicit watermark variant for
re-runnable ingestion (S3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tweets_elastic_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema (never inferred)."""
    schema = TESTDATA_TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
