"""Streaming index maintenance: keep the written search index fresh from
a document stream — the streaming twin of ``indexing.index_increment``,
and the declarative form of the reference's keyset ingest loop feeding an
index (src/main.py:106-162, where every page ends in a bulk upsert).

Each micro-batch lands as ONE new index segment (Lucene's NRT segment
story: appends never rewrite existing segments; per-segment statistics
aggregate at query time via ``bm25_stats_from_index``). The segment name
is derived from the micro-batch id, and ``foreachBatch`` replays a failed
batch under the SAME id — the segment write is an overwrite of that one
segment directory, so crash replay is idempotent (exactly-once effects,
the same ``ingest_wm=`` pattern the parquet sinks use).

Scale shape: the stream's maxFilesPerTrigger bounds segment size; the
quantizer/codebooks would come from the base build's sidecar exactly as
in ``index_increment`` (document segments only here — the text-search
half of the index; embedding streams follow the same pattern with
``_write_emb_segment``)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from tweets_elastic_spark.indexing import _write_doc_segment
from tweets_elastic_spark.schemas import TESTDATA_TABLES
from tweets_elastic_spark.sources.catalog import fan_out


def stream_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files —
    new files are discovered per micro-batch (the arrival-order increment,
    like stream_events). Raises on an empty directory rather than
    guessing a schema mismatch later."""
    has_files = os.path.isdir(docs_dir) and any(
        p.endswith(".parquet") for p in os.listdir(docs_dir)
    )
    if not has_files:
        raise FileNotFoundError(
            f"stream_documents: no parquet files in {docs_dir!r}"
        )
    return (
        spark.readStream.schema(TESTDATA_TABLES["documents"])
        .option("maxFilesPerTrigger", 2)
        .parquet(docs_dir)
    )


def run_streaming_index_maintenance(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Drain the document stream into the segmented index with
    ``availableNow`` (process-everything-then-stop, the batch-parity
    trigger): micro-batch ``n`` → ``segment=stream_n``. Existing segments
    (base or earlier stream batches) are never touched."""
    spark = stream_docs.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_doc_segment(
            spark, index_dir, fan_out(batch_df), f"stream_{batch_id}"
        )

    return (
        stream_docs.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
