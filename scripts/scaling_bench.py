#!/usr/bin/env python
"""SCALING.md measurement harness (r6 verdict item 7).

Times the sixteen family-representative registry queries warm, best-of-2,
noop-sink materialized at sf0.001/sf0.01/sf0.1, and pushes the five
steepest rows ONE MORE DECADE to a locally-derived sf1 fixture — so the
"constants amortize, slopes flatten" claim is demonstrated across 1000×
rather than asserted.

The sf1 fixture (gitignored, ~10× sf0.1) is derived deterministically from
the driver-provided sf0.1 parquet: ten id-shifted copies of the tables the
measured queries read (documents, lineitem). Shape-preserving for the
measured work: term/bucket cardinalities stay fixture-sized while posting
counts, bucket populations, and scan bytes grow 10× — exactly the growth a
bigger corpus brings to these queries.

Usage: python scripts/scaling_bench.py  → one JSON line per query row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tweets_elastic_spark import registry
from tweets_elastic_spark.session import get_spark

ROWS = [
    "tweet_documents_flat", "pricing_summary", "search_bm25",
    "es_aggs_date_histogram", "dedup_exact_survivors",
    "minhash_lsh_near_dups", "ann_cosine_topk", "ann_ivfpq_topk",
    "dsir_sample", "quality_score", "chunk_documents", "dup_ngram_stats",
    "percolate_matches", "search_query_string", "tfidf_hashed_sparse",
    "es_aggs_multi_terms_mad",
]
# the r6 table's five steepest marginal slopes → measured at sf1 too
SF1_ROWS = [
    "es_aggs_multi_terms_mad", "quality_score", "pricing_summary",
    "dup_ngram_stats", "search_query_string",
]
SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scaling_sf1")


def ensure_sf1(spark) -> str:
    marker = os.path.join(SF1_DIR, "_READY")
    if os.path.exists(marker):
        return SF1_DIR
    src = "/root/testdata/sf0.1"
    for table, key in [("documents", "doc_id"), ("lineitem", "l_orderkey")]:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        span = df.agg(F.max(key)).head()[0] + 1
        copies = [
            df.withColumn(key, F.col(key) + F.lit(i * span))
            for i in range(10)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(SF1_DIR, f"{table}.parquet")))
    open(marker, "w").close()
    return SF1_DIR


def timed(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="scaling")
    spark.sparkContext.setLogLevel("ERROR")
    from tweets_elastic_spark.indexing import ensure_index
    ensure_index(spark, "/root/testdata/sf0.1")
    ensure_index(spark, "/root/testdata/sf0.01")
    ensure_index(spark, "/root/testdata/sf0.001")
    sf1 = ensure_sf1(spark)
    qs = registry.all_queries()
    for name in ROWS:
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite") \
            .format("noop").save()  # warm: codegen/broadcast constants
        row = {"query": name}
        for sf, d in [("sf0.001", "/root/testdata/sf0.001"),
                      ("sf0.01", "/root/testdata/sf0.01"),
                      ("sf0.1", "/root/testdata/sf0.1")]:
            row[sf] = timed(fn, spark, d)
        if name in SF1_ROWS:
            row["sf1"] = timed(fn, spark, sf1)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
