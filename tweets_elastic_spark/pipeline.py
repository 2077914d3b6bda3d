"""The reference's ``main()`` retold Spark-first (SURVEY §3.1).

The reference runs: connect → create index → keyset loop { page the
conversations spine → denormalize the page server-side → bulk-upsert the
documents, advancing ``last_id`` } (src/main.py:106-162). Here:

* ``etl_full`` — the one-shot form: a single distributed pipeline replaces
  the whole loop (partitioned scan ≙ pagination, per-partition writes ≙
  bulk batches).
* ``etl_increment`` — the re-runnable form for a GROWING source: document
  only the conversations past the durable watermark, but resolve every
  lookup (parent tweets/authors/hashtags, J6-J8) against the FULL tables —
  the same semantics as the reference's page query, whose subqueries run
  over the whole database. Child tables are semi-join-pruned to the page
  before their group-by so an increment's cost scales with the increment,
  not the corpus. Watermark stats ride the write job (observe()); each
  increment lands in a deterministic ``ingest_wm=<wm>`` partition so crash
  replays overwrite instead of duplicating (see sources/incremental.py).

Unioned increments are exactly ``etl_full``'s output as long as referenced
parents exist in the source when their child's page is processed — for a
static-snapshot source (the reference's case) that is always true.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_elastic_spark import schemas
from tweets_elastic_spark.operators.denormalize import build_tweet_documents
from tweets_elastic_spark.sources.incremental import WatermarkStore

CHILD_TABLES = [
    "context_annotations",
    "conversation_hashtags",
    "annotations",
    "links",
    "conversation_references",
]


def load_tweet_tables(spark: SparkSession, src_dir: str) -> dict[str, DataFrame]:
    """Strict-schema scan of a tweets-star parquet directory."""
    return {
        name: spark.read.schema(schema).parquet(os.path.join(src_dir, f"{name}.parquet"))
        for name, schema in schemas.TWEETS_TABLES.items()
    }


def etl_full(spark: SparkSession, src_dir: str, sink_path: str) -> int:
    """One-shot ETL: scan → denormalize → id-keyed overwrite. Returns docs
    written."""
    from tweets_elastic_spark.sinks import write_documents

    docs = build_tweet_documents(load_tweet_tables(spark, src_dir))
    write_documents(docs, sink_path, id_col="id", mode="overwrite")
    return spark.read.parquet(sink_path).count()


def etl_increment(
    spark: SparkSession,
    src_dir: str,
    sink_path: str,
    store: WatermarkStore,
) -> int:
    """One incremental ETL batch. Returns documents written (0 = caught up)."""
    from pyspark.sql import Observation

    t = load_tweet_tables(spark, src_dir)
    wm = store.get("conversations.id")
    spine = t["conversations"].filter(F.col("id") > F.lit(wm))

    # Prune children to the page BEFORE their group-bys: the left-semi join
    # keeps the per-increment work O(increment), and Catalyst can push the
    # id bound into the child scans when ids correlate with files.
    page_ids = spine.select(F.col("id").alias("conversation_id"))
    pruned = dict(t)
    for child in CHILD_TABLES:
        pruned[child] = t[child].join(page_ids, "conversation_id", "left_semi")

    docs = build_tweet_documents(pruned, spine=spine)

    obs = Observation()
    docs = docs.observe(
        obs, F.count(F.lit(1)).alias("n"), F.max("id").alias("mx")
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(sink_path, f"ingest_wm={wm}")
    )
    metrics = obs.get
    if metrics["n"] == 0:
        return 0
    store.set("conversations.id", int(metrics["mx"]))
    return int(metrics["n"])
