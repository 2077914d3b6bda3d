#!/usr/bin/env python
"""One-off decade measurement for the r15 SCALING.md rows (the r14
verdict's task 7): ``esql_match_score`` — the only new-command row with
a BM25 provider behind it and no decade row yet — across all four
decades, and ``esql_enrich`` (r15-new ENRICH compile) across the three
testdata decades (the derived sf1 fixture carries no supplier table;
supplier is the row's FACT stream, so the 3-decade span still shows the
growth shape). Same method as scripts/measure_r14_scaling.py: warm
once at the smallest scale, best-of-2 noop-materialized runs."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_DIR, ensure_sf1, materialize  # noqa: E402
from tweets_elastic_spark import registry  # noqa: E402
from tweets_elastic_spark.session import get_spark  # noqa: E402

ROWS = {
    "esql_match_score": ["sf0.001", "sf0.01", "sf0.1", "sf1"],
    "esql_enrich": ["sf0.001", "sf0.01", "sf0.1"],
    # late-session additions (events-based, sf1-capable)
    "esql_stats_where": ["sf0.001", "sf0.01", "sf0.1", "sf1"],
    "esql_fork": ["sf0.001", "sf0.01", "sf0.1", "sf1"],
}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="scaling-r15")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_sf1(spark)
    dirs = {
        "sf0.001": "/root/testdata/sf0.001",
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": SF1_DIR,
    }
    out: dict[str, dict[str, float]] = {n: {} for n in ROWS}
    for name, scales in ROWS.items():
        fn = registry.get(name).fn
        materialize(fn(spark, dirs[scales[0]]))  # warm plan + codegen
        for label in scales:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(fn(spark, dirs[label]))
                best = min(best, time.perf_counter() - t0)
            out[name][label] = round(best, 3)
            print(name, label, out[name][label], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
