"""ES transforms: batch pivot == direct aggregate; continuous transform
keeps the dest at the latest per-group value across micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.transforms import (
    compile_pivot,
    transform_batch,
    transform_continuous,
)

DEF = {
    "source": {"index": "events"},
    "pivot": {
        "group_by": {"etype": {"terms": {"field": "event_type"}}},
        "aggregations": {
            "total": {"sum": {"field": "value"}},
            "hi": {"max": {"field": "value"}},
        },
    },
    "dest": {"index": None},  # filled per test
}


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(1, "click", 10.0), (2, "click", 20.0), (3, "view", 5.0),
         (4, None, 7.0)],
        "event_id long, event_type string, value double",
    )


def test_batch_transform(spark, events, tmp_path):
    import copy

    d = copy.deepcopy(DEF)
    d["dest"]["index"] = str(tmp_path / "dest")
    n = transform_batch(spark, events, d)
    assert n == 2  # NULL group key drops, ES's contract
    got = {r["etype"]: (r["doc_count"], r["total"], r["hi"], r["_id"])
           for r in spark.read.parquet(d["dest"]["index"]).collect()}
    assert got == {"click": (2, 30.0, 20.0, "click"),
                   "view": (1, 5.0, 5.0, "view")}


def test_continuous_transform_merges(spark, tmp_path):
    import copy

    d = copy.deepcopy(DEF)
    dest = str(tmp_path / "cdest")
    d["dest"]["index"] = dest
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    schema = "event_id long, event_type string, value double"

    def drop(rows, name):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp, f),
                           os.path.join(src_dir, name))

    def run():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = transform_continuous(
            stream, d, checkpoint=str(tmp_path / "ckpt"))
        # availableNow isn't exposed by the helper; emulate with
        # processing-time stop-after-idle: process all available files
        q.processAllAvailable()
        q.stop()

    drop([(1, "click", 10.0), (2, "view", 5.0)], "p0.parquet")
    run()
    got = {r["etype"]: r["total"]
           for r in spark.read.parquet(dest).collect()}
    assert got == {"click": 10.0, "view": 5.0}

    # second drop updates one group, leaves the other untouched
    drop([(3, "click", 30.0)], "p1.parquet")
    run()
    got = {r["etype"]: (r["doc_count"], r["total"])
           for r in spark.read.parquet(dest).collect()}
    assert got == {"click": (2, 40.0), "view": (1, 5.0)}


def test_pivot_guards(spark, events):
    with pytest.raises(ValueError, match="group_by"):
        compile_pivot(events, {"group_by": {}})
    with pytest.raises(ValueError, match="unsupported transform group_by"):
        compile_pivot(events, {"group_by":
                               {"g": {"rare_terms": {"field": "x"}}}})


def test_rollup_merge_and_guards(spark):
    from tweets_elastic_spark.rollup import rollup_job, rollup_search

    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00", "a", 10.0),
         (2, "2024-01-20 11:00:00", "a", 30.0),
         (3, "2024-02-01 09:00:00", "a", 2.0),
         (4, "2024-01-07 08:00:00", "b", 5.0)],
        "id long, ts_s string, g string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    rolled = rollup_job(df, date_field="ts", interval="day",
                        terms=["g"], metrics=["v"])
    assert rolled.count() == 4  # one bucket per (day, g)
    out = {(r["bucket"], r["g"]): (r["doc_count"], r["v_avg"], r["v_max"])
           for r in rollup_search(
               rolled, job_interval="day", interval="month", terms=["g"],
               metrics={"v": ["avg", "max"]}).collect()}
    # month 2024-01 for g=a merges two day-partials: avg 20, max 30
    assert out[("2024-01", "a")] == (2, 20.0, 30.0)
    assert out[("2024-02", "a")] == (1, 2.0, 2.0)
    assert out[("2024-01", "b")] == (1, 5.0, 5.0)
    with pytest.raises(ValueError, match="finer"):
        rollup_search(rolled, job_interval="day", interval="hour",
                      metrics={"v": ["sum"]})
    with pytest.raises(ValueError, match="exactly"):
        rollup_search(rolled, job_interval="day", interval="month",
                      metrics={"v": ["percentiles"]})
    with pytest.raises(ValueError, match="calendar grains"):
        rollup_job(df, date_field="ts", interval="5m", metrics=["v"])
