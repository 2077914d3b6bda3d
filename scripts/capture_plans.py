#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<round>/.

Usage: python scripts/capture_plans.py --suffix before [--round r17] name [...]
Writes plans/<round>/<name>_<suffix>.txt. Query construction may run bounded
driver actions (counts/heads) — that's part of the query's real shape.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_elastic_spark import registry
from tweets_elastic_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--round", default="r17")
    args = ap.parse_args()

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**registry.all_queries(), **registry.bench_variants()}
    sf_dir = f"/root/testdata/sf{args.sf:g}"
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round)
    os.makedirs(outdir, exist_ok=True)

    for name in args.names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
