"""Cross-engine deterministic hashing.

The production dedup operators hash with ``xxhash64`` — JVM-side, codegen,
the fastest option Spark has — but xxhash64 exists in no other engine, so
queries built on it can only be rows-only checked by the DuckDB oracle gate.

``hash60`` is the *portable* twin: the first 15 hex digits of md5 parsed as
a 60-bit non-negative integer. Both Spark (``conv(substring(md5(x),1,15),
16, 10)``) and DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``) compute
the identical value for identical input strings (verified across ASCII,
unicode and empty strings), which lets the MinHash and SimHash families run
bit-identically in both engines and carry REAL value-hash oracles.

60 bits (not 64) keeps the value non-negative in a signed BIGINT on both
sides, so ``%`` and ``>>`` semantics agree (negative-operand modulo and
shift are where engines diverge).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_BITS = 60


def hash60(c: Column) -> Column:
    """Portable 60-bit hash of a string column (md5-hex-prefix)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The DuckDB expression computing the identical value as ``hash60``."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
