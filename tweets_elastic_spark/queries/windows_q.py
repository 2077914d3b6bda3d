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
