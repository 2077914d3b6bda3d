"""Time-partitioned sorted layout: partition pruning reaches the plan,
data round-trips completely (incl. NULL timestamps), files are per-day,
and row groups are timestamp-sorted (min/max skipping is effective)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.operators.layout import (
    PARTITION_COL,
    read_time_partitioned,
    write_time_partitioned,
)
from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events_by_day")
    ev = load_table(spark, SF, "events")
    write_time_partitioned(ev, path, ts_col="ts")
    return path


def test_round_trip_complete(spark, layout_path):
    ev = load_table(spark, SF, "events")
    back = read_time_partitioned(spark, layout_path)
    assert back.count() == ev.count()
    a = sorted(map(tuple, ev.select("event_id", "ts").collect()))
    b = sorted(map(tuple, back.select("event_id", "ts").collect()))
    assert a == b


def test_day_query_plans_partition_pruning(spark, layout_path):
    q = read_time_partitioned(spark, layout_path).filter(
        (F.col(PARTITION_COL) == "2024-01-05") & (F.col("value") > 10)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert f"PartitionFilters: [isnotnull({PARTITION_COL}" in scan
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value" in scan
    # the pruned read returns exactly the day's rows
    ev = load_table(spark, SF, "events")
    want = ev.filter(
        (F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
        & (F.col("value") > 10)
    ).count()
    assert q.count() == want > 0


def test_one_file_per_day(spark, layout_path):
    days = [d for d in os.listdir(layout_path) if d.startswith(PARTITION_COL)]
    assert len(days) > 5
    for d in days[:5]:
        parts = [f for f in os.listdir(os.path.join(layout_path, d))
                 if f.endswith(".parquet")]
        assert len(parts) == 1, (d, parts)


def test_row_groups_sorted_by_ts(spark, layout_path):
    import pyarrow.parquet as pq

    days = sorted(d for d in os.listdir(layout_path)
                  if d.startswith(PARTITION_COL) and "HIVE" not in d)
    d = os.path.join(layout_path, days[0])
    f = next(x for x in os.listdir(d) if x.endswith(".parquet"))
    md = pq.ParquetFile(os.path.join(d, f))
    tbl = md.read(columns=["ts"])
    vals = tbl.column("ts").to_pylist()
    assert vals == sorted(vals)


def test_null_ts_rows_are_kept(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, None)], "id long, raw string"
    ).select("id", F.col("raw").cast("timestamp").alias("ts"))
    path = str(tmp_path / "nulls")
    write_time_partitioned(df, path, ts_col="ts")
    back = read_time_partitioned(spark, path)
    assert back.count() == 2
    assert {r["id"] for r in back.filter(F.col(PARTITION_COL).isNull())
            .collect()} == {2}


def test_guards(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="granularity"):
        write_time_partitioned(ev, "/tmp/x", granularity="fortnight")
    with pytest.raises(ValueError, match="already exists"):
        write_time_partitioned(
            ev.withColumn(PARTITION_COL, F.lit("x")), "/tmp/x")
