"""Local replica of the driver's DuckDB-oracle gate.

Runs a registered Spark query and its ANSI-SQL oracle side-by-side on the
same parquet tables and compares row-count + order-insensitive values
(columns sorted by name, rows sorted by stringified value). Used by
tests/test_oracle_parity.py so oracle drift is caught before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    spark_pd = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pd = con.sql(oracle_sql).df()
    finally:
        con.close()
    if len(spark_pd) != len(duck_pd):
        return False, f"row count: spark={len(spark_pd)} duckdb={len(duck_pd)}"
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return False, f"columns: spark={sorted(spark_pd.columns)} duckdb={sorted(duck_pd.columns)}"
    a, b = normalize(spark_pd), normalize(duck_pd)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
