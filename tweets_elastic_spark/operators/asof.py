"""As-of join: for each left row, the LATEST right row at or before it.

The classic time-series operator (trades←quotes, events←sessions,
training examples←latest feature snapshot) that Spark has no built-in
for — and the naive formulations are scale traps: a range-condition join
explodes into a per-key cross product, and a per-key ``collect`` isn't
distributed at all.

Spark-first formulation = the sort-merge as-of: tag both streams, union
them, ONE shuffle on the key, and carry the last non-null right payload
forward through a per-key time-ordered window. Cost is a single exchange
+ sort of both streams combined — exactly the physical plan a dedicated
ASOF JOIN operator (DuckDB's, which the oracle uses) executes natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the latest
    ``right`` row with ``right_ts <= left_ts`` in the same ``on`` key
    group (NULL payload when no right row precedes it).

    Ties: right rows sort BEFORE left rows at equal timestamps (the join
    is inclusive), and among right rows sharing a timestamp the one with
    the greatest ``right_order`` value wins — pass it to make the result
    deterministic when right timestamps can collide.

    Returns all ``left`` columns plus ``payload_cols`` (which must not
    collide with left's column names — alias on the right beforehand)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    # left columns other than the key/ts ride in a struct; the key and ts
    # already travel as the shuffle's top-level columns — duplicating them
    # inside the struct would double key bytes through the one exchange
    # this operator exists to minimize
    left_extra = [c for c in left.columns if c not in set(on) | {left_ts}]
    order_tail = [F.col("_rord").asc_nulls_first()] if right_order else []

    # a NULL right timestamp means "never happened": it must not match any
    # left row (DuckDB ASOF's comparison is false for NULL), but Spark's
    # nulls-first ordering would sort it before everything and backfill it
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_pay"),
        F.lit(0).alias("_side"),
        *( [F.col(right_order).alias("_rord")] if right_order else [F.lit(0).alias("_rord")] ),
        F.lit(None).cast(
            left.select(F.struct(*left_extra).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
    )
    l_side = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r_side.schema["_pay"].dataType).alias("_pay"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_side.schema["_rord"].dataType).alias("_rord"),
        F.struct(*left_extra).alias("_lrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r_side.unionByName(l_side)
        .withColumn("_p", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )

    def left_col(c: str):
        if c in on:
            return F.col(c)
        if c == left_ts:
            return F.col("_ts").alias(c)
        return F.col(f"_lrow.{c}").alias(c)

    return filled.select(
        *[left_col(c) for c in left.columns],
        *[F.col(f"_p.{c}").alias(c) for c in payload_cols],
    )
