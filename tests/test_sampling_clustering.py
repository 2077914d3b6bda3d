"""Near-dup clustering (connected components) and deterministic corpus
splitting — the ship-stage training-data ops on top of pairwise dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.operators import dedup as D
from tweets_elastic_spark.operators.sampling import (
    deterministic_split,
    split_thresholds,
)
from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_connected_components_merges_transitively(spark):
    # a 6-node path (needs several propagation rounds) + an isolated pair
    path = [(i, i + 1) for i in range(1, 6)]
    comp = D.connected_components(_pairs(spark, path + [(10, 11)]))
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_connected_components_min_label_any_orientation(spark):
    # min id sits in the middle; labels must flow both directions
    comp = D.connected_components(_pairs(spark, [(5, 2), (2, 9), (9, 7)]))
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert got == {2: 2, 5: 2, 7: 2, 9: 2}


def test_dedup_near_survivors_transitive_drop(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 6)], "doc_id long, text string"
    )
    out = D.dedup_near_survivors(docs, _pairs(spark, [(1, 2), (2, 3)]))
    assert {r["doc_id"] for r in out.collect()} == {1, 4, 5}


def test_split_deterministic_and_partition_independent(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs.repartition(7), "doc_id").collect()}
    assert a == b  # no seed, no partition dependence
    # roughly the declared proportions on 500 ids (md5 is uniform)
    n = len(a)
    train = sum(1 for s in a.values() if s == "train") / n
    assert 0.72 <= train <= 0.88
    assert set(a.values()) == {"train", "val", "test"}


def test_split_salt_decorrelates(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id", salt="split").collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id", salt="other").collect()}
    assert a != b


def test_split_thresholds_validate():
    with pytest.raises(ValueError):
        split_thresholds({"train": 0.5, "val": 0.1})
    ths = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [n for n, _ in ths] == ["train", "val", "test"]
    assert ths[-1][1] == "gggggggg"  # catch-all sorts above any hex


def test_stable_under_corpus_growth(spark):
    """A doc's split never changes when new docs arrive — the property
    randomSplit lacks."""
    half = spark.range(0, 250).withColumnRenamed("id", "doc_id")
    full = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(half, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(full, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())
