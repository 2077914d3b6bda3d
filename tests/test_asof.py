"""As-of join semantics: inclusive bounds, tie-breaks, NULL backfill, and
the single-exchange physical plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tweets_elastic_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(2)), (4, "v", _ts(9))],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u", _ts(3), 1.0),
            (101, "u", _ts(5), 2.0),   # equal-ts: join is inclusive
            (102, "u", _ts(7), 3.0),
            (103, "w", _ts(1), 9.0),   # other key, never matches
        ],
        "rid long, user string, ts timestamp, val double",
    )
    return left, right


def test_asof_inclusive_latest_and_null_backfill(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, on=["user"], payload_cols=["rid", "val"],
            right_order="rid",
        ).collect()
    }
    assert out[1] == (101, 2.0)   # equal ts matches (inclusive)
    assert out[2] == (102, 3.0)   # latest preceding, not just any
    assert out[3] == (None, None)  # nothing at or before ts=2
    assert out[4] == (None, None)  # key 'v' has no right rows


def test_asof_equal_ts_right_ties_take_max_order(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5))], "lid long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, "u", _ts(5), 1.0), (9, "u", _ts(5), 2.0), (8, "u", _ts(5), 3.0)],
        "rid long, user string, ts timestamp, val double",
    )
    rows = asof_join(
        left, right, on=["user"], payload_cols=["rid", "val"], right_order="rid"
    ).collect()
    assert (rows[0]["rid"], rows[0]["val"]) == (9, 2.0)


def test_asof_null_right_ts_never_matches(spark):
    """A NULL right timestamp means 'never happened' — it must not
    backfill anything (regression: nulls-first ordering used to sort it
    before every row and leak its payload everywhere)."""
    left = spark.createDataFrame(
        [(1, "u", _ts(5))], "lid long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, "u", None, 9.0)], "rid long, user string, ts timestamp, val double"
    )
    rows = asof_join(
        left, right, on=["user"], payload_cols=["rid", "val"]
    ).collect()
    assert (rows[0]["rid"], rows[0]["val"]) == (None, None)


def test_asof_plan_single_exchange(spark):
    """The sort-merge as-of costs ONE shuffle of the unioned streams — no
    nested-loop/range join, no per-key collect."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on=["user"], payload_cols=["rid", "val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_join_containment_and_guard(spark):
    """Bounded range join: inclusive bounds, per-key scoping, and the
    too-long-interval guard; plan stays a hash join (no nested loop)."""
    import pytest

    from tweets_elastic_spark.operators.rangejoin import interval_join

    points = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(30)), (3, "v", _ts(5))],
        "pid long, user string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, "u", _ts(5), _ts(10)), (11, "u", _ts(25), _ts(59))],
        "iid long, user string, s timestamp, e timestamp",
    )
    out = interval_join(
        points, iv, on=["user"], ts="ts", start="s", end="e", max_duration_s=60
    )
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    # pid 1 at the inclusive start bound; pid 3 is key 'v' (no intervals)
    assert got == {(1, 10), (2, 11)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    too_long = spark.createDataFrame(
        [(12, "u", datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 2, 0))],
        "iid long, user string, s timestamp, e timestamp",
    )
    with pytest.raises(Exception, match="max_duration_s"):
        interval_join(
            points, too_long, on=["user"], ts="ts", start="s", end="e",
            max_duration_s=60,
        ).collect()
