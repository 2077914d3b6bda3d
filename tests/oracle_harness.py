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
        # DuckDB binds views eagerly; skip absent tables so fixture-subset
        # directories (single-table test fixtures) still work.
        if os.path.isdir(path):
            # Spark-written table = a directory of part files
            path = os.path.join(path, "*.parquet")
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    # DIVERGENCE FROM THE DRIVER (r10 lesson): the driver's canonicalizer
    # sorts RAW pandas cells (plain sort_values) and ERRORS on list/dict
    # values ("unhashable type: 'list'"); this harness stringifies them
    # first so post-prefix array-output entries can still be compared.
    # That means a non-primitive DRIVER_PRIORITY entry passes here but
    # reds out at the driver — tests/test_plans.py::
    # test_driver_prefix_schemas_are_primitive_only makes that state
    # unrepresentable by forcing prefix entries to primitive schemas.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 17 significant digits = float64 round-trip (shortest-repr)
        # precision. The r14 driver reddened es_aggs_parent on a 1e-5
        # summation-order diff at 1e9 magnitude that this harness's old
        # ".10g" normalization masked (both sides printed "2754983250"),
        # so the replica passed twice while the driver failed. The
        # driver's hash is full-precision; the local gate must be too —
        # oracles are required to be order-robust (exact decimal sums,
        # or rounding with enough headroom over the noise floor), not
        # merely 10-digit-close.
        return f"{v:.17g}"
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


def _canon_spark_type(dt) -> str:
    """Spark DataType -> canonical family+width token (mirrors _canon_duck_type)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        # Signed-int widths collapse to one family: the driver's hash passed
        # int32-vs-int64 rows in r5 (tweet_documents_flat), so width is not
        # what it is sensitive to — int128/float/decimal divergence is.
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{_canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    return f"other:{dt.simpleString()}"


def _canon_duck_type(t: str) -> str:
    """DuckDB DESCRIBE column_type -> canonical token. HUGEINT maps to int128,
    which matches nothing Spark produces — exactly the r5 events_daily_pivot
    failure mode (bare sum(CASE...) is HUGEINT; the driver's value hash is
    type-sensitive, so identical values still mismatch)."""
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{_canon_duck_type(t[:-2])}>"
    u = t.upper()
    if u.startswith("DECIMAL"):
        return "decimal"
    if u.startswith("STRUCT"):
        return "struct"
    if u.startswith("MAP"):
        return "map"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    return {
        "BIGINT": "int", "INT8": "int", "LONG": "int",
        "INTEGER": "int", "INT4": "int", "INT": "int",
        "SMALLINT": "int", "INT2": "int",
        "TINYINT": "int", "INT1": "int",
        "HUGEINT": "int128", "INT128": "int128",
        "UBIGINT": "uint64", "UINTEGER": "uint32",
        "USMALLINT": "uint16", "UTINYINT": "uint8",
        "DOUBLE": "float64", "FLOAT8": "float64",
        "FLOAT": "float32", "FLOAT4": "float32", "REAL": "float32",
        "VARCHAR": "str", "TEXT": "str", "STRING": "str",
        "BOOLEAN": "bool", "BOOL": "bool",
        "DATE": "date",
        "BLOB": "binary", "BYTEA": "binary",
    }.get(u, f"other:{t}")


def dtype_report(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Per-column canonical-type mismatches between the Spark result and the
    DuckDB oracle's declared types. Empty list = dtype-compatible. The driver's
    value hash is type-sensitive, so any entry here is a future red driver row
    even when every value matches (seen in round 5)."""
    spark_types = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    con = duckdb_connection(sf_dir)
    try:
        desc = con.sql(f"DESCRIBE ({oracle_sql})").fetchall()
    finally:
        con.close()
    duck_types = {row[0]: _canon_duck_type(row[1]) for row in desc}
    mismatches = []
    for col in sorted(set(spark_types) & set(duck_types)):
        if spark_types[col] != duck_types[col]:
            mismatches.append(
                f"{col}: spark={spark_types[col]} duckdb={duck_types[col]}"
            )
    return mismatches


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    dtype_mismatches = dtype_report(spark_df, oracle_sql, sf_dir)
    if dtype_mismatches:
        return False, f"dtype mismatch (driver hash is type-sensitive): {dtype_mismatches}"
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
