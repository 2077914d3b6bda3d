"""Bucketed co-located joins (SURVEY §4 / 100 TB notes).

At cluster scale the orders⋈lineitem family of joins repeats across every
document build; bucketing both tables by the join key at WRITE time makes
every subsequent join shuffle-free (bucket-to-bucket, no Exchange). This is
the Spark replacement for the reference's FK indexes (queries.sql:1-10) for
the big-fact case where broadcast doesn't apply.

Pinned here as executable evidence: the bucketed join plan contains NO
Exchange on either side, and its result equals the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketing_demo LOCATION '{warehouse}'")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bucketing_demo.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bucketing_demo.lineitem_b")
    )
    yield "bucketing_demo.orders_b", "bucketing_demo.lineitem_b"
    spark.sql("DROP DATABASE bucketing_demo CASCADE")


def test_bucketed_join_has_no_shuffle_exchange(spark, bucketed_tables):
    ob, lb = bucketed_tables
    # disable broadcast so the plan shows the big-fact × big-fact case
    # bucketing exists for (at sf0.001 orders would broadcast and hide it)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(ob)
            .join(spark.table(lb), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located: bucket layout satisfies the join AND the aggregation's
    # distribution — zero data shuffles end-to-end
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ob, lb = bucketed_tables
    bucketed = (
        spark.table(ob)
        .join(spark.table(lb), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["o_orderkey"], r["n"]) for r in bucketed.collect()}
    b = {(r["o_orderkey"], r["n"]) for r in plain.collect()}
    assert a == b and len(a) > 0
