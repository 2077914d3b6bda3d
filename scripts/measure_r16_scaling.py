#!/usr/bin/env python
"""One-off decade measurement for the r16 SCALING.md rows (the r15
verdict's task 4): ``esql_bucket_stats`` — the time+numeric two-key
BUCKET grid, which had no decade chain at all — across all four
decades, ``esql_fork`` re-measured at sf1 (a second fourth-decade
sample under this session's load), and the r16-new ``esql_sample_stats``
(deterministic-hash SAMPLE + hash agg, documents-based, sf1-capable).
Same method as scripts/measure_r15_scaling.py: warm once at the
smallest scale, best-of-2 noop-materialized runs, 32g JVM."""

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
    "esql_bucket_stats": ["sf0.001", "sf0.01", "sf0.1", "sf1"],
    "esql_fork": ["sf1"],
    "esql_sample_stats": ["sf0.001", "sf0.01", "sf0.1", "sf1"],
}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="scaling-r16")
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
