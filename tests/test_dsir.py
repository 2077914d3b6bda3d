"""DSIR importance resampling (operators/dsir.py): enrichment toward the
target domain, Laplace handling of target-absent features, reproducible
Gumbel noise, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.operators.dsir import (
    dsir_log_weights,
    dsir_sample,
    gumbel_noise,
    hashed_ngram_features,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # two sharply distinct vocabularies: "science" vs "sports"
    sci = "quantum physics theory experiment measurement energy particle"
    spo = "football goal match team player season league score"
    rows = []
    for i in range(40):
        rows.append((i, f"{sci} doc number {i}", "sci"))
    for i in range(40, 80):
        rows.append((i, f"{spo} doc number {i}", "spo"))
    return spark.createDataFrame(rows, "doc_id long, text string, dom string")


def test_features_count_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    feats = hashed_ngram_features(df, n_buckets=1 << 20)
    # grams: u:a x2, u:b, b:a b, b:b a -> 4 distinct fids, total count 5
    rows = feats.collect()
    assert sum(r["cnt"] for r in rows) == 5
    assert len(rows) == 4
    # empty/one-token docs produce no bigrams and don't crash
    one = spark.createDataFrame([(1, "solo"), (2, "")],
                                "doc_id long, text string")
    got = hashed_ngram_features(one, n_buckets=64).collect()
    assert sum(r["cnt"] for r in got) == 1


def test_log_weights_rank_target_domain_first(spark, corpus):
    target = corpus.filter("dom = 'sci'").limit(10)
    lw = dsir_log_weights(corpus, target, n_buckets=256)
    ranked = [
        r["doc_id"]
        for r in lw.orderBy(F.col("logw").desc(), "doc_id").limit(40).collect()
    ]
    sci_in_top = sum(1 for d in ranked if d < 40)
    # with disjoint vocabularies, the top-40 should be essentially all sci
    assert sci_in_top >= 38


def test_target_absent_buckets_use_laplace_not_minus_inf(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha beta")],
                                   "doc_id long, text string")
    lw = {r["doc_id"]: r["logw"]
          for r in dsir_log_weights(raw, target, n_buckets=64).collect()}
    assert all(math.isfinite(v) for v in lw.values())
    assert lw[1] > lw[2]  # doc 2's features never appear in the target


def test_gumbel_noise_is_deterministic_and_seed_sensitive(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = df.select("doc_id", gumbel_noise(F.col("doc_id"), 42).alias("g"))
    b = df.select("doc_id", gumbel_noise(F.col("doc_id"), 42).alias("g"))
    c = df.select("doc_id", gumbel_noise(F.col("doc_id"), 7).alias("g"))
    ga = {r["doc_id"]: r["g"] for r in a.collect()}
    gb = {r["doc_id"]: r["g"] for r in b.collect()}
    gc = {r["doc_id"]: r["g"] for r in c.collect()}
    assert ga == gb
    assert ga != gc
    assert all(math.isfinite(v) for v in ga.values())


def test_sample_without_replacement_returns_k_rows(spark, corpus):
    target = corpus.filter("dom = 'sci'").limit(10)
    out = dsir_sample(corpus, target, k=20, n_buckets=256, seed=1)
    rows = out.collect()
    assert len(rows) == 20
    assert len({r["doc_id"] for r in rows}) == 20
    # sampling still skews hard toward the target domain
    assert sum(1 for r in rows if r["dom"] == "sci") >= 16


def test_plan_broadcasts_model_tables(spark, corpus):
    target = corpus.filter("dom = 'sci'").limit(10)
    plan = dsir_log_weights(corpus, target, n_buckets=256)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
