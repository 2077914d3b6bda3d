"""Bounded-interval range join: points joined to the intervals containing
them, without the cross-product trap.

A naive ``events JOIN intervals ON ts BETWEEN start AND end`` has no
equality key, so Spark falls back to a broadcast-nested-loop (or worse,
cartesian) — O(|points|·|intervals|) comparisons, a non-starter at scale.
When interval length is BOUNDED (incident windows, sessions with a cap,
calendar buckets), the standard fix is bucketization: quantize time into
buckets no smaller than the max interval length, explode each interval
into the ≤2 buckets it can touch, and equi-join on (key, bucket) before
the exact range filter. The join becomes a plain hash join whose fan-out
is bounded by bucket occupancy — shuffle on (key, bucket), pushdown-
friendly, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts: str,
    start: str,
    end: str,
    max_duration_s: int,
) -> DataFrame:
    """Inner-join every ``points`` row to each ``intervals`` row (same
    ``on`` key) whose ``[start, end]`` contains ``ts`` (inclusive bounds).
    ``max_duration_s`` must upper-bound every interval's length in
    seconds; it sets the bucket width, so each interval explodes into at
    most 2 bucket rows. An over-long interval would still produce CORRECT
    results (``sequence`` emits every bucket it spans), but with unbounded
    explode fan-out — the runtime guard raises so the cost bound the
    caller declared stays true. Returns all columns of both inputs."""
    bucket = F.lit(max_duration_s)

    def b(c: Column) -> Column:
        return F.floor(c.cast("long") / bucket)

    guard = F.when(
        F.col(end).cast("long") - F.col(start).cast("long") > max_duration_s,
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval longer than max_duration_s="),
                F.lit(str(max_duration_s)),
            )
        ),
    ).otherwise(F.lit(True))
    iv = (
        intervals.filter(guard)
        .withColumn(
            "_bucket",
            F.explode(F.sequence(b(F.col(start)), b(F.col(end)))),
        )
    )
    pt = points.withColumn("_bucket", b(F.col(ts)))
    return (
        pt.join(iv, [*on, "_bucket"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bucket")
    )
