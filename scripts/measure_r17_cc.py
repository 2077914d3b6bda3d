#!/usr/bin/env python
"""r17 evidence: connected-components pointer doubling (verdict item 5).

Compares the r16 one-hop min-label loop (inlined below, verbatim shape)
against the shipped r17 hop+pointer-double loop on
  * synthetic path graphs (diameter 8 / 32 / 64 — worst-case chains), and
  * the REAL sf0.1 near-dup pair graph (jaccard_pairs k=3 t=0.5),
recording loop rounds and wall seconds for each. Calibration-bracketed
like scripts/time_queries.py.

Usage: python scripts/measure_r17_cc.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tweets_elastic_spark.operators import dedup as D
from tweets_elastic_spark.session import get_spark
from tweets_elastic_spark.sources.catalog import load_table


def cc_one_hop_r16(pairs, max_iter=80):
    """The r16 implementation (one-hop min-label propagation), kept here
    verbatim-in-shape as the A/B reference. Returns (labels, rounds)."""
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        edges.groupBy(F.col("a").alias("id"))
        .agg(F.min("b").alias("_nbr"))
        .select("id", F.least(F.col("id"), F.col("_nbr")).alias("label"))
        .localCheckpoint()
    )
    for rounds in range(1, max_iter + 1):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy(edges["a"].alias("id"))
            .agg(F.min("label").alias("_nbr"))
        )
        joined = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least("label", F.coalesce("_nbr", "label")).alias("label"),
        )
        joined = joined.localCheckpoint()
        changed = joined.filter(F.col("label") < F.col("_old")).limit(1).count()
        labels = joined.drop("_old")
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id")), rounds
    raise RuntimeError("no convergence")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(app_name="measure_r17_cc")
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 100_000_000, 1, 32).selectExpr(
                "sum(xxhash64(id) % 100000) AS h").collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {"_calibration_pre_sec": calibrate()}

    def path_pairs(n):
        return spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], "id_a long, id_b long")

    cases = {
        "path_d8": path_pairs(9),
        "path_d32": path_pairs(33),
        "path_d64": path_pairs(65),
    }
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    cases["sf0.1_jaccard_graph"] = D.jaccard_pairs(
        docs, k=3, threshold=0.5).select("id_a", "id_b").localCheckpoint()

    for name, pairs in cases.items():
        t0 = time.perf_counter()
        old_labels, old_rounds = cc_one_hop_r16(pairs)
        old_rows = sorted((r["id"], r["cluster_id"])
                          for r in old_labels.collect())
        old_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        new_labels = D.connected_components(pairs, max_iter=80)
        new_rows = sorted((r["id"], r["cluster_id"])
                          for r in new_labels.collect())
        new_sec = round(time.perf_counter() - t0, 3)
        assert old_rows == new_rows, f"{name}: label mismatch"
        out[name] = {
            "r16_one_hop": {"rounds": old_rounds, "sec": old_sec},
            "r17_pointer_double": {"rounds": D.CC_LAST_ROUNDS, "sec": new_sec},
            "labels_identical": True,
            "n_nodes": len(new_rows),
        }
        print(name, out[name], flush=True)

    out["_calibration_post_sec"] = calibrate()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
