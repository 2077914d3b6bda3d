#!/usr/bin/env python
"""One-off decade measurement for the r14-new ES|QL rows (SCALING.md):
warm once at the smallest scale, then best-of-2 noop-materialized runs
at sf0.001/0.01/0.1 and the derived sf1 fixture — the same method as
scripts/scaling_bench.py, scoped to the new rows so a full re-run isn't
needed to extend the tables."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_DIR, ensure_sf1, materialize  # noqa: E402
from tweets_elastic_spark import registry  # noqa: E402
from tweets_elastic_spark.session import get_spark  # noqa: E402

ROWS = ["esql_lookup_join", "esql_inlinestats", "esql_grok",
        "esql_cidr_dates", "esql_change_point"]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="scaling-r14")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_sf1(spark)
    scales = [
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", SF1_DIR),
    ]
    out: dict[str, dict[str, float]] = {n: {} for n in ROWS}
    for name in ROWS:
        fn = registry.get(name).fn
        materialize(fn(spark, scales[0][1]))  # warm plan + codegen
        for label, d in scales:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(fn(spark, d))
                best = min(best, time.perf_counter() - t0)
            out[name][label] = round(best, 3)
            print(name, label, out[name][label], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
