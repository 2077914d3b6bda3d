"""The local oracle gate must be as strict as the driver's type-sensitive
hash (VERDICT r5 item 2): a DuckDB oracle whose aggregate types diverge from
the Spark result (HUGEINT vs BIGINT) must FAIL locally even when every value
matches, so oracle-typing drift is caught before the driver sees it."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_harness import compare, dtype_report
from tweets_elastic_spark import registry
from tweets_elastic_spark.sources.catalog import load_table

# The exact oracle shape that produced round 5's only red driver row:
# bare sum(CASE...) is HUGEINT (int128) in DuckDB, Spark's pivot count is
# BIGINT; values identical, hash mismatched.
_R5_BUGGY_PIVOT_ORACLE = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
           sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error
    FROM events GROUP BY 1
"""


def test_hugeint_oracle_fails_dtype_gate(spark, sf_correct):
    """Reproduces the r5 events_daily_pivot failure: identical values, but
    the uncast oracle's HUGEINT columns must now fail compare() locally."""
    reg = registry.get("events_daily_pivot")
    df = reg.fn(spark, sf_correct)
    ok, msg = compare(df, _R5_BUGGY_PIVOT_ORACLE, sf_correct)
    assert not ok
    assert "dtype mismatch" in msg and "int128" in msg


def test_fixed_pivot_oracle_passes(spark, sf_correct):
    reg = registry.get("events_daily_pivot")
    df = reg.fn(spark, sf_correct)
    ok, msg = compare(df, reg.oracle, sf_correct)
    assert ok, msg


def test_float_vs_int_divergence_fails(spark, sf_correct):
    """An int Spark column against a DOUBLE oracle column is a dtype failure
    even though stringified values could coincide."""
    df = load_table(spark, sf_correct, "events").agg(
        F.count(F.lit(1)).alias("n")
    )
    ok, msg = compare(df, "SELECT CAST(count(*) AS DOUBLE) AS n FROM events", sf_correct)
    assert not ok and "dtype mismatch" in msg


def test_every_registered_oracle_is_dtype_clean(spark, sf_dir):
    """Sweep the whole registry at sf0.001: no oracle may declare a column
    type the Spark result doesn't produce (cheap — DESCRIBE only, no data)."""
    registry._ensure_loaded()
    bad = {}
    for name, reg in registry._REGISTRY.items():
        if reg.oracle is None:
            continue
        df = reg.fn(spark, sf_dir)
        mism = dtype_report(df, reg.oracle, sf_dir)
        if mism:
            bad[name] = mism
    assert not bad, f"dtype-divergent oracles: {bad}"


def test_pivot_utc_day_boundary(spark, tmp_path):
    """Guard the date_format-vs-date_trunc('day') equivalence against fixture
    regeneration (VERDICT r5 item 6): rows within 1 s of a UTC day boundary
    must land on the same day in Spark (session TZ pinned UTC) and DuckDB
    (naive timestamps). A sub-second drift in either bucketing shows up as a
    row-count or value mismatch here."""
    import datetime as dt

    from tweets_elastic_spark.schemas import TESTDATA_TABLES

    rows = [
        # 0.4 s before midnight -> Jan 1; exactly midnight and 0.4 s after -> Jan 2
        (1, dt.datetime(2026, 1, 1, 23, 59, 59, 600000), 10, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 2, 0, 0, 0, 0), 10, "click", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 2, 0, 0, 0, 400000), 11, "view", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 1, 0, 0, 0, 0), 12, "error", 1.0, "{}"),
    ]
    fixture_dir = tmp_path / "tzfix"
    fixture_dir.mkdir()
    spark.createDataFrame(rows, TESTDATA_TABLES["events"]).coalesce(1).write.parquet(
        str(fixture_dir / "events.parquet")
    )
    reg = registry.get("events_daily_pivot")
    df = reg.fn(spark, str(fixture_dir))
    ok, msg = compare(df, reg.oracle, str(fixture_dir))
    assert ok, msg
    got = {r["day"]: (r["view"], r["click"]) for r in df.collect()}
    assert got["2026-01-01"] == (1, 0)
    assert got["2026-01-02"] == (1, 1)
