"""Streaming deduplication — the training-data-pipeline dedup operators
(operators/dedup.py) for continuously-arriving corpora.

Two tiers:

* ``streaming_dedup_exact`` — exact fingerprint dedup over a stream with
  ``dropDuplicatesWithinWatermark``: state holds one fingerprint entry per
  document seen inside the watermark horizon, and the watermark bounds the
  state store (unbounded ``dropDuplicates`` state is the classic streaming
  OOM). A duplicate arriving within the horizon of its original is
  suppressed; one arriving later is a late re-crawl and passes — at which
  point the id-keyed batch sink's overwrite-by-id absorbs it
  (sinks.write_documents), so the end-to-end result is still exact.
* ``streaming_first_seen`` — the keeper side: emits only the first
  occurrence per key (same mechanism keyed by the id itself), the
  streaming analogue of dedup_exact's min-id keeper under arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.textstats import normalized_text


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact near-real-time dedup: md5 of normalized text as the identity,
    state bounded by the event-time watermark."""
    fp = F.md5(normalized_text(F.col(text_col)))
    return (
        stream.withColumn("_fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per key within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )
