"""Skew mitigation for heavy-hitter keys (SURVEY §2.12 / 100 TB notes).

AQE's skew-join splitting handles skewed JOINS automatically
(``spark.sql.adaptive.skewJoin.enabled``, session.py), but a skewed
AGGREGATION with non-algebraic state — ``collect_list``/``collect_set``
per key, the A1 denormalization shape — still funnels every row of a hot
key through one reducer task and can OOM it. The classic fix is two-stage
salted aggregation:

    stage 1: group by (key, salt)  — hot keys split across S reducers,
             each building a partial array;
    stage 2: group by key          — merge the ≤S partials per key.

Partial aggregation doesn't help ``collect_list`` (nothing shrinks
map-side), which is exactly why the salt matters: stage 1's shuffle
spreads a hot key over S partitions instead of one.

For ALGEBRAIC aggregates (count/sum/min/max) Spark's map-side partial
aggregation already absorbs skew — don't salt those; it only adds a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: Column,
    alias: str,
    salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """Two-stage ``collect_list(value)`` per ``key`` that survives hot keys.

    Equivalent to ``df.groupBy(key).agg(collect_list(value))`` (plus a
    deterministic ``array_sort`` so the salt-dependent merge order never
    shows), but no single reducer ever holds more than ~1/``salts`` of a
    hot key's rows while building partials.

    ``salts`` sizes the split: use ≥ the ratio (hottest key's rows /
    rows-per-task budget). The salt must carry PER-ROW entropy — salting by
    a hash of the value would collapse a hot key whose rows share one value
    (the canonical duplicate-heavy hot key) into a single salt bucket.
    ``monotonically_increasing_id`` is per-(partition, row-position), so
    a deterministic input partitioning re-derives the same salts on task
    retry; and because the merged array is sorted, the RESULT is identical
    under any salt assignment anyway.
    """
    salt = (F.monotonically_increasing_id() % salts).cast("int").alias("_salt")
    stage1 = (
        df.select(F.col(key), value.alias("_v"), salt)
        .groupBy(key, "_salt")
        .agg(F.collect_list("_v").alias("_partial"))
    )
    merged = (
        stage1.groupBy(key)
        .agg(F.flatten(F.collect_list("_partial")).alias(alias))
    )
    if sort:
        merged = merged.withColumn(alias, F.array_sort(F.col(alias)))
    return merged
