#!/usr/bin/env python
"""r17 evidence: HONEST children-pruning plan pair (verdict item 6).

The r16 commit's es_aggs_reverse_nested "before" capture was taken from
the already-edited tree, so the committed pair showed no delta. This
script rebuilds the SAME request twice from the live code — once with
children=None (all five child streams, the unpruned r15 shape) and once
with children=["context_annotations"] (the shipped pruned call) — and
writes both formatted plans, so the scan-count delta is checkable.

Usage: python scripts/capture_r17_children_pruning.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_elastic_spark.operators.denormalize import build_tweet_documents
from tweets_elastic_spark.plans.aggs import es_request
from tweets_elastic_spark.queries.tweetdoc_q import tweet_star_from_tpch
from tweets_elastic_spark.session import get_spark

REQUEST = {
    "aggs": {
        "ca": {
            "nested": {"path": "context_annotations"},
            "aggs": {
                "by_domain": {
                    "terms": {
                        "field": "context_annotations.domain.name",
                        "size": 5,
                    },
                    "aggs": {"parents": {"reverse_nested": {}}},
                }
            },
        }
    }
}


def main() -> None:
    spark = get_spark(app_name="capture_children_pruning")
    spark.sparkContext.setLogLevel("ERROR")
    tables = tweet_star_from_tpch(spark, "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    for suffix, children in (
        ("unpruned", None),
        ("pruned", ["context_annotations"]),
    ):
        df = es_request(build_tweet_documents(tables, children=children),
                        REQUEST)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"es_aggs_reverse_nested_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        scans = plan.count("Scan parquet")
        print(f"wrote {path} (Scan parquet x{scans})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
