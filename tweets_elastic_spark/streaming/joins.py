"""Watermarked stream-stream joins (SURVEY §2.9 engine extension).

The batch engine answers "which clicks landed inside each error's incident
window" with a bucketized interval join (operators/rangejoin.py). Live
pipelines ask the same question of two UNBOUNDED streams — Spark's
stream-stream join with event-time range conditions is the native answer:
both sides are watermarked, the range condition bounds how long either
side's rows stay in join state (a click can only match errors from the
last ``window``; an error can only match clicks up to ``window`` ahead),
so state is evicted as the watermark advances instead of growing forever.

The time-range predicate is REQUIRED, not an optimization: without it
Spark would have to keep every row of both streams in state indefinitely.
That is exactly the bucketized-batch operator's cost argument transposed
to state size — the same bound that kept the batch join's fan-out finite
keeps the streaming join's state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def click_error_pairs(
    clicks: DataFrame,
    errors: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """(err_id, user_id, err_ts, click_ts) for every click inside
    ``[err_ts, err_ts + window]`` of a same-user error — the streaming twin
    of the batch interval_join registration (inner semantics: zero-click
    errors don't emit; the batch LEFT variant needs a follow-up agg the
    batch query performs). Works identically on batch DataFrames (the
    watermark is a no-op there) — the streaming-vs-batch twin tests rely
    on that unification."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
        )
        .withWatermark("click_ts", watermark)
    )
    e = (
        errors.select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("click_ts") >= F.col("err_ts"))
        & (F.col("click_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(e, cond, "inner").select(
        "err_id", F.col("e_user").alias("user_id"), "err_ts", "click_ts"
    )


def run_click_error_join(
    clicks_stream: DataFrame,
    errors_stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """availableNow stream-stream join → parquet append sink."""
    pairs = click_error_pairs(clicks_stream, errors_stream, window, watermark)
    return (
        pairs.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", sink_path)
        .start()
    )
