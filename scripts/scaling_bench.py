#!/usr/bin/env python
"""SCALING.md measurement harness (r6 verdict item 7; r8: thin wrapper).

One entry point owns the machinery now — bench.py (r7 verdict item 6):
the sf1 fixture builder (bench.ensure_sf1) and the sf1-capable query list
(bench.SF1_HEADLINE) live there, and ``python bench.py --sf 1`` runs the
full headline harness at sf1 with the same JSON output format. This
script remains for the per-decade TABLE: it times each family-
representative query at sf0.001/sf0.01/sf0.1 and pushes the sf1-capable
rows one more decade, printing one JSON row per query — the source of
SCALING.md's table.

Usage: python scripts/scaling_bench.py  → one JSON line per query row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_HEADLINE, ensure_sf1  # noqa: E402
from tweets_elastic_spark import registry  # noqa: E402
from tweets_elastic_spark.session import get_spark  # noqa: E402

ROWS = [
    "tweet_documents_flat", "pricing_summary", "search_bm25",
    "es_aggs_date_histogram", "dedup_exact_survivors",
    "minhash_lsh_near_dups", "ann_cosine_topk", "ann_ivfpq_topk",
    "dsir_sample", "quality_score", "chunk_documents", "dup_ngram_stats",
    "percolate_matches", "search_query_string", "tfidf_hashed_sparse",
    "es_aggs_multi_terms_mad",
    # r8: the near-dup family — the four slowest bench rows (r7 verdict
    # item 1) — joins the table, with sf1 rows via the v2 fixture
    "jaccard_near_dups", "dedup_near_survivors", "corpus_clean",
    "semdedup_survivors",
    # r8 late: the new multivariate-moments metric (one power-sum pass)
    "es_aggs_matrix_stats",
    # r11 (the r10 verdict's SCALING stragglers + the new EQL grammar row)
    "video_frame_dups", "es_terms_enum", "eql_sequence_disjunction",
    "eql_event_functions", "eql_sequence_by_stage",
    # r12 (the r11 verdict's stragglers + the new EQL sample kind)
    "es_request_highlight_fragments", "essql_string_functions",
    "eql_sequence_until", "eql_sample",
    # r12 second wave (IPv6 aggs, adjacency nested bucket, per-stage
    # sample, unordered intervals)
    "es_aggs_ip_prefix_v6", "es_aggs_ip_range_v6",
    "es_aggs_adjacency_nested_terms", "eql_sample_by_stage",
    "search_intervals_all_of_unordered", "search_span_not",
    "warc_extract_text",
    # r12 final session (new agg kinds + the crawl composition + the
    # retriever tree)
    "es_aggs_time_series", "es_aggs_inference", "crawl_corpus_pipeline",
    "es_request_retriever_rrf", "es_request_retriever_linear",
    "es_request_retriever_rerank",
    # r13 (span patterns, boilerplate removal + its pipeline, the IVF
    # contract row)
    "search_span_multi", "html_main_text", "crawl_main_text_pipeline",
    "ann_ivf_recall_profile", "script_profile", "robots_gate_survivors",
    "esql_mv_expand_stats",
]
# every ROW whose tables exist in the sf1 fixture gets the fourth decade
SF1_ROWS = [n for n in ROWS if n in SF1_HEADLINE]


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
    qs = {**registry.all_queries(), **registry.bench_variants()}
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
