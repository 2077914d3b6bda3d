"""Pre-replay a list of registry entries against their DuckDB oracles at
sf0.01 under the driver-replica gate (17-significant-digit floats), at TWO
shuffle-partition settings so order-dependent float accumulation is caught
before the driver sees the row (the r14 es_aggs_parent lesson).

Usage:
    python scripts/replay_backlog.py [name ...]      # default: full backlog
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession

from oracle_harness import compare
from tweets_elastic_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def backlog_names() -> list[str]:
    green: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
                green.add(k)
    return [n for n in registry.all_queries() if n not in green]


def main() -> int:
    names = sys.argv[1:] or backlog_names()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("replay-backlog")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    failures = []
    for i, name in enumerate(names):
        if name not in qs:
            print(f"[{i+1}/{len(names)}] {name}: NOT REGISTERED")
            failures.append(name)
            continue
        t0 = time.time()
        verdicts = []
        for parts in ("32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            try:
                df = qs[name](spark, SF_DIR)
                ok, msg = compare(df, oracles[name], SF_DIR)
            except Exception as e:  # noqa: BLE001
                ok, msg = False, f"EXC {type(e).__name__}: {e}"
            verdicts.append((parts, ok, msg))
        all_ok = all(ok for _, ok, _ in verdicts)
        status = "GREEN" if all_ok else "RED"
        print(f"[{i+1}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)")
        if not all_ok:
            for parts, ok, msg in verdicts:
                if not ok:
                    print(f"    parts={parts}: {msg[:500]}")
            failures.append(name)
    print(f"\n{len(names)-len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
