#!/usr/bin/env python
"""Time individual registry queries the way bench.py does (noop sink,
sf0.001 warmup, best-of-N at the target sf), but split per query into
CONSTRUCTION time (the python call that builds the DataFrame — includes
any driver actions: .count()/.head() scalars, localCheckpoints, the
connected-components loop) and MATERIALIZATION time (the noop write of
the returned plan). bench.py times the sum; this split says where the
seconds actually are, which decides whether to attack driver actions or
the plan (guide §1).

Usage: python scripts/time_queries.py [--sf 0.1] [--n 3] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_elastic_spark import registry
from tweets_elastic_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**registry.all_queries(), **registry.bench_variants()}
    sf_dir = f"/root/testdata/sf{args.sf:g}"
    warm_dir = "/root/testdata/sf0.001"

    for name in args.names:
        fn = queries[name]
        # warm like bench.py (plan construction, codegen, UDF workers)
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()

    # bench.py's calibration anchor: the shared box drifts 6x+ intra-day;
    # bracketing every batch with this fixed JVM workload makes numbers
    # from different sessions comparable (divide by the calibration ratio).
    def calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 100_000_000, 1, 32).selectExpr(
                "sum(xxhash64(id) % 100000) AS h").collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {"_calibration_pre_sec": calibrate()}
    for name in args.names:
        fn = queries[name]
        cons, mats = [], []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}: construct")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: materialize")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            mats.append(t2 - t1)
        out[name] = {
            "construct_best": round(min(cons), 3),
            "materialize_best": round(min(mats), 3),
            "total_best": round(min(c + m for c, m in zip(cons, mats)), 3),
            "construct_all": [round(x, 3) for x in cons],
            "materialize_all": [round(x, 3) for x in mats],
        }
        print(name, json.dumps(out[name]), flush=True)
    out["_calibration_post_sec"] = calibrate()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
