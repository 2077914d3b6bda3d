"""Data-layout optimization for the written corpus: time-partitioned,
sorted-within-partition parquet — the storage-side half of the 100 TB read
path. The query-side pins (tests/test_plans.py) prove filters PUSH to the
scan; this module makes the scan able to SKIP:

* ``partitionBy`` on a derived date column → directory-level partition
  pruning: a day-ranged query plans ``PartitionFilters`` and never opens
  the other days' files (Catalyst prunes at the file index, before IO).
* ``sortWithinPartitions`` on the timestamp (plus optional secondary
  keys) → parquet row-group min/max statistics become TIGHT: within a
  selected day, a narrow time predicate skips most row groups
  (``PushedFilters`` + statistics skipping — Lucene's per-segment range
  pruning, re-expressed as parquet's native machinery).

Shape: ONE shuffle (repartition by the partition value, so each day's
rows land in the same task and produce one file per day instead of
files-per-day x tasks — the small-files killer at 1000 executors), then
a task-local sort. The sort is per-partition, never global.

Reference parity: the reference's Postgres source is index-ordered by id
(src/main.py keyset loop); this is the same idea applied to the OUTPUT
side, where the reference had no counterpart (single ES index, no file
layout to optimize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "_p_date"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as date-partitioned parquet, each partition internally
    sorted by ``sort_cols`` (default: the timestamp itself). Rows with a
    NULL timestamp go to the ``__HIVE_DEFAULT_PARTITION__`` directory —
    kept, not dropped (the quarantine-not-silent-loss contract)."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}
    if granularity not in fmt:
        raise ValueError(
            f"granularity must be one of {sorted(fmt)}, got {granularity!r}"
        )
    if PARTITION_COL in df.columns:
        raise ValueError(f"{PARTITION_COL!r} already exists on the input")
    out = df.withColumn(
        PARTITION_COL, F.date_format(F.col(ts_col), fmt[granularity])
    )
    (
        out.repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(*(sort_cols or [ts_col]))
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_time_partitioned(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read a layout written by write_time_partitioned. The partition
    column comes back as a string; filter on it (or on the timestamp —
    both prune: the former at the directory level, the latter at the
    row-group level)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
