"""Event-time window queries over the events table (SURVEY §2.9 extension:
the reference has no windows; the engine ships tumbling/sliding/session).
The same functions power the Structured-Streaming entry points
(streaming/ingest.py) — registered here in batch mode for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_elastic_spark.registry import register
from tweets_elastic_spark.sources.catalog import load_table
from tweets_elastic_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@register(
    "tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window + agg (streaming twin in streaming/ingest.py).",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@register(
    "sliding_window",
    oracle="""
    SELECT ws AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
        SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS ws,
               value
        FROM events
    )
    GROUP BY 1
    """,
    doc="Sliding window (2h width, 1h slide): every event lands in 2 windows.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"), "2 hours", "1 hour")


@register(
    "session_window",
    oracle="""
    WITH d AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM d
    ),
    per AS (SELECT user_id, sid, count(*) AS cnt FROM s GROUP BY user_id, sid)
    SELECT user_id, count(*) AS n_sessions, max(cnt) AS max_session_events
    FROM per GROUP BY user_id
    """,
    doc="Session windows (30 min gap) per user — gaps-and-islands oracle; "
        "touching boundaries start a new session on both sides.",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = session_counts(load_table(spark, sf_dir, "events"), "30 minutes")
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


@register(
    "events_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts, event_id AS view_id, value AS view_value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC
            ) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, v.view_id,
           round(v.view_value, 6) AS view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    doc="As-of join: each click gains the user's latest view at or before "
        "it (NULL when none precedes) — the time-series backfill operator "
        "Spark lacks natively, expressed as union-tag + one key shuffle + "
        "a per-key ts-ordered last() window (the sort-merge as-of plan). "
        "The oracle is DuckDB's native ASOF LEFT JOIN; equal-ts view "
        "collisions resolve to the max view_id on both sides.",
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tweets_elastic_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    res = asof_join(
        clicks, views, on=["user_id"],
        payload_cols=["view_id", "view_value"], right_order="view_id",
    )
    return res.select(
        "event_id", "user_id", "view_id",
        F.round("view_value", 6).alias("view_value"),
    )


@register(
    "corpus_length_quantiles",
    oracle="""
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.9), 6) AS p90,
           round(quantile_cont(n_chars, 0.99), 6) AS p99
    FROM documents GROUP BY lang
    """,
    doc="Exact per-language length percentiles (linear interpolation): "
        "Spark's percentile() and DuckDB's quantile_cont compute the same "
        "estimator, so the values hash-match; at 100 TB swap in "
        "approx_percentile (t-digest) for one-pass bounded memory.",
)
def q_corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99"),
    )
