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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tweets_elastic_spark.schemas import TESTDATA_TABLES
from tweets_elastic_spark.sources.catalog import (
    events_raw_schema,
    parquet_ts_is_nanos,
)
from tweets_elastic_spark.streaming.windows import tumbling_counts


def stream_events(
    spark: SparkSession, events_dir: str, *, allow_empty: bool = False
) -> DataFrame:
    """File-source stream over a directory of events parquet files (new
    files are discovered per micro-batch — the S3/keyset analogue where
    arrival order, not an id column, defines the increment). Fixture
    generations that store ts as TIMESTAMP(NANOS) are read as raw longs
    and converted (Spark rejects nanos outright — see sources/catalog.py);
    micros generations stream with the declared schema directly.

    The ts encoding is probed ONCE, at stream-definition time, from the
    first file present. An EMPTY directory can't be probed, and guessing
    micros would make the running query fail at runtime
    (PARQUET_TYPE_ILLEGAL) if nanos files later arrive — so by default this
    raises instead of guessing. Pass ``allow_empty=True`` to accept the
    micros guess, with the contract that the stream MUST be re-created
    (this function re-called) after the first files land if they turn out
    to be nanos-encoded; the encoding probe is identity-cached per file, so
    the re-call re-probes."""
    has_files = os.path.isdir(events_dir) and any(
        p.endswith(".parquet") for p in os.listdir(events_dir)
    )
    if not has_files and not allow_empty:
        raise FileNotFoundError(
            f"stream_events: no parquet files in {events_dir!r} to probe the "
            "ts encoding from; pass allow_empty=True to start anyway "
            "(assumes micros; re-create the stream after first files land)"
        )
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
