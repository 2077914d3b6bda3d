"""Delimited (CSV/TSV) source with the same contract as sources/jsonl:
DECLARED schema (never inferred) and a raw-line QUARANTINE channel
instead of dropped-or-crash for malformed rows — completing the corpus
interchange trio (parquet = native, JSONL = LLM-corpus lingua franca,
CSV/TSV = the tabular-metadata sidecar format).

Same plan shape as read_jsonl and for the same reason: the TEXT source +
a ``from_csv`` expression, because the csv FILE source forbids
corrupt-column-only queries and would force materializing the parse to
split it. Both legs here are pure scan projections.

Contract difference from JSONL, deliberate: JSON fields are NAMED, so a
missing field is NULL (semi-structured null contract); CSV columns are
POSITIONAL, so a row with too few tokens is QUARANTINED, not null-filled
— silent null-fill would hide column drift across a 100 TB corpus. (An
empty trailing token still parses as NULL: ``"9\\t"`` is two tokens.)

Documented limitation: records with embedded newlines inside quoted
fields need the csv source's multiLine mode, which is neither
line-splittable (one task per file) nor compatible with the text-based
quarantine split — such corpora should be converted at the boundary.
This reader treats each LINE as one record, the layout every
line-splittable 100 TB CSV corpus uses anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from tweets_elastic_spark.sources.jsonl import CORRUPT_COL


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    sep: str = ",",
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited CSV/TSV with a declared schema. Returns
    ``(valid, quarantine)`` — quarantine rows carry the raw line verbatim
    in ``_corrupt_record``. With ``header=True``, lines equal to the
    schema's own header rendering are dropped (every shard may carry one
    — the distributed-read contract, where "first line" is per-file)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    raw = spark.read.text(path)
    if header:
        header_line = sep.join(schema.fieldNames())
        raw = raw.filter(F.col("value") != header_line)
    raw = raw.select(
        F.col("value"),
        F.from_csv(
            "value", with_corrupt.simpleString(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL,
             "sep": sep},
        ).alias("_parsed"),
    )
    # shared split: corrupt rows AND blank lines (NULL parse struct — the
    # 0-token ultimate short row) both quarantine
    from tweets_elastic_spark.sources.jsonl import split_parsed

    return split_parsed(raw)
