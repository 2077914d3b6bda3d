"""ES transforms (`PUT _transform` + `_start`): a pivot — group_by +
aggregations — continuously materialized into a destination index.

Two execution modes, same definition object:

* ``transform_batch`` — one full recompute of the pivot written to the
  dest (ES's batch transform). The pivot compiles through the same
  ``es_aggregate`` machinery the search path uses: one partial/final
  hash aggregation, dest written id-keyed (the group key is the doc id,
  ES's transform contract).
* ``transform_continuous`` — the continuous transform: a Structured
  Streaming pivot in update mode, each micro-batch MERGING its changed
  groups into the dest (read-modify-replace by key through
  ``foreachBatch`` — the same swap-safe write ``increment_counters``
  uses; a transactional MERGE is the deploy-scale twin). The dest always
  holds the latest value per group, exactly ES's checkpointed behavior;
  late data is governed by the watermark ``delay``.

Definition subset: ``group_by`` entries of kind terms / histogram /
date_histogram (the engine's bucket-key expressions), ``aggregations``
of the metric kinds ``_metric_cols`` supports. Anything else raises.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compile_pivot", "transform_batch", "transform_continuous"]


def _group_cols(group_by: dict):
    from tweets_elastic_spark.plans.aggs import _bucket_key

    if not isinstance(group_by, dict) or not group_by:
        raise ValueError("transform pivot needs a non-empty group_by")
    cols = []
    for name, spec in group_by.items():
        (kind, body), = spec.items()
        if kind not in ("terms", "histogram", "date_histogram"):
            raise ValueError(
                f"unsupported transform group_by kind {kind!r} "
                "(terms/histogram/date_histogram)"
            )
        cols.append(_bucket_key(kind, body).alias(name))
    return cols


def compile_pivot(df: DataFrame, pivot: dict) -> DataFrame:
    """The pivot as a (batch) DataFrame: one groupBy over the bucket-key
    expressions, metric sub-aggs flattened like the aggs surface."""
    from tweets_elastic_spark.plans.aggs import _metric_cols

    keys = _group_cols(pivot["group_by"])
    out = df
    for k in keys:
        out = out.filter(k.isNotNull())
    return out.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("doc_count"),
        *_metric_cols(pivot.get("aggregations", {})),
    )


def transform_batch(
    spark: SparkSession, source: DataFrame, definition: dict
) -> int:
    """Run the transform once; returns the number of dest documents."""
    from tweets_elastic_spark.sinks import write_documents

    dest = definition["dest"]["index"]
    out = compile_pivot(source, definition["pivot"])
    key_cols = list(definition["pivot"]["group_by"])
    out = out.withColumn(
        "_id", F.concat_ws("|", *[F.col(c).cast("string")
                                  for c in key_cols])
    )
    write_documents(out, dest, id_col="_id", mode="overwrite")
    return spark.read.parquet(dest).count()


def transform_continuous(
    source_stream: DataFrame,
    definition: dict,
    *,
    checkpoint: str,
    time_field: str | None = None,
    delay: str = "10 minutes",
):
    """Start the continuous transform; returns the StreamingQuery.
    ``time_field`` + ``delay`` bound state via a watermark when given
    (required when a date_histogram group key is present — unbounded
    group state otherwise grows with time buckets)."""
    from tweets_elastic_spark.sinks import write_documents

    pivot = definition["pivot"]
    dest = definition["dest"]["index"]
    kinds = {next(iter(s)) for s in pivot["group_by"].values()}
    if "date_histogram" in kinds and time_field is None:
        raise ValueError(
            "continuous transform with a date_histogram group key needs "
            "time_field (the watermark bounds per-bucket state)"
        )
    stream = source_stream
    if time_field is not None:
        stream = stream.withWatermark(time_field, delay)
    pivoted = compile_pivot(stream, pivot)
    key_cols = list(pivot["group_by"])

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        updates = batch_df.withColumn(
            "_id", F.concat_ws("|", *[F.col(c).cast("string")
                                      for c in key_cols])
        )
        if os.path.exists(dest):
            current = spark.read.parquet(dest)
            kept = current.join(
                updates.select("_id").withColumnRenamed("_id", "__del"),
                current["_id"] == F.col("__del"),
                "left_anti",
            )
            merged = kept.unionByName(updates)
        else:
            merged = updates
        # swap protocol (same as increment_counters): the merged plan
        # READS dest lazily, so writing dest in place would delete the
        # files mid-scan; write beside it and rename in.
        import shutil

        tmp = f"{dest}__tx{batch_id}"
        write_documents(merged, tmp, id_col="_id", mode="overwrite")
        old = f"{dest}__old{batch_id}"
        if os.path.exists(dest):
            os.rename(dest, old)
        os.rename(tmp, dest)
        shutil.rmtree(old, ignore_errors=True)

    return (
        pivoted.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge)
        .start()
    )
