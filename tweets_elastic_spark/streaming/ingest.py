"""Structured-Streaming ingestion: the reference's micro-batch loop done
properly (SURVEY §2.9).

``stream_events`` turns the events table into a file-source stream;
``run_windowed_stream`` runs a watermarked windowed aggregation to a sink
with ``availableNow`` (process-everything-then-stop — the batch-parity
trigger used in tests); ``run_foreach_batch_ingest`` is the streaming twin
of sources/incremental.py: each micro-batch appends to an id-keyed parquet
sink, with Spark's checkpoint replacing the hand-rolled ``last_id`` state
(src/main.py:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tweets_elastic_spark.schemas import TESTDATA_TABLES
from tweets_elastic_spark.sources.catalog import (
    events_raw_schema,
    parquet_ts_is_nanos,
)
from tweets_elastic_spark.streaming.windows import tumbling_counts


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files (new
    files are discovered per micro-batch — the S3/keyset analogue where
    arrival order, not an id column, defines the increment). Fixture
    generations that store ts as TIMESTAMP(NANOS) are read as raw longs
    and converted (Spark rejects nanos outright — see sources/catalog.py);
    micros generations stream with the declared schema directly."""
    if parquet_ts_is_nanos(events_dir, "ts"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(events_raw_schema())
            .option("maxFilesPerTrigger", 4)
            .parquet(events_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return (
        spark.readStream.schema(TESTDATA_TABLES["events"])
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )


def run_windowed_stream(
    events_stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Watermarked tumbling aggregation → parquet (append mode: windows
    emit once the watermark passes them — late data inside the horizon is
    incorporated, later data dropped)."""
    agg = tumbling_counts(
        events_stream.withWatermark("ts", watermark), width=width
    )
    return (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", sink_path)
        .start()
    )


def run_foreach_batch_ingest(
    events_stream: DataFrame,
    sink_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """foreachBatch sink: arbitrary per-batch logic (dedup within batch by
    event_id). The checkpoint gives at-least-once batch replay; writing each
    batch to a deterministic ``batch_id=<id>`` partition with OVERWRITE makes
    the replay idempotent (a crash after the write but before the checkpoint
    commit re-runs the same batch_id into the same directory) — together,
    effectively exactly-once. A plain append here would duplicate rows on
    exactly that crash. Same scheme as the batch twin in
    sources/incremental.py."""
    import os

    def handle(batch: DataFrame, batch_id: int) -> None:
        (
            batch.dropDuplicates(["event_id"])
            .write.mode("overwrite")
            .parquet(os.path.join(sink_path, f"batch_id={batch_id}"))
        )

    return (
        events_stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
