"""Deterministic corpus splitting / sampling for training-data pipelines.

Train/val/test assignment must be a pure function of the document id —
stable across runs, engines, partitionings, and corpus growth (a doc never
migrates between splits when new data arrives). Spark's ``randomSplit`` is
none of those (seed + partition dependent). Here the assignment hashes the
id with md5 and buckets the first 8 hex chars against cumulative-fraction
thresholds: one codegen'd projection, no shuffle, no state — and exactly
reproducible in any engine with md5 (the DuckDB oracles inline the same
hex thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound-hex) per split, cumulative over the declared
    order; the last bound is forced to the top of the space so fractions
    that don't sum exactly to 1.0 still cover every row."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names:
        cum += fractions[name]
        bound = _HEX_SPACE if name == names[-1] else round(cum * _HEX_SPACE)
        out.append((name, format(min(bound, _HEX_SPACE), "09x")[-8:]
                    if bound < _HEX_SPACE else "g" * 8))
    # 'gggggggg' sorts above every hex string — the catch-all last bucket
    return out


def split_hash_col(id_col: Column, salt: str = "split") -> Column:
    """First 8 hex chars of md5(id ':' salt) — the bucketing key. The salt
    decorrelates independent splits of the same corpus (resample by
    changing it without touching the data)."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 8
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col`` with the id's bucket name. Pure projection —
    survives any repartitioning and appends; at 100 TB it's free (rides
    whatever scan is already happening, no shuffle, no Python)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = split_hash_col(F.col(id_col), salt)
    expr: Column | None = None
    for name, bound in reversed(split_thresholds(fractions)):
        expr = (
            F.lit(name)
            if expr is None
            else F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
        )
    return df.withColumn(split_col, expr)
