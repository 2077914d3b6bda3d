"""PII detection/redaction for training-data pipelines.

Pattern-based scrubbing of the three classic machine-readable identifiers
(emails, NANP-style phone numbers, IPv4 addresses) — the standard
pre-release step before text leaves a curation pipeline. Patterns are kept
inside the Java-regex ∩ RE2 common dialect (no lookarounds, no
backreferences) so the DuckDB oracle replicates the redaction
byte-for-byte; everything is a chained ``regexp_replace`` — scan-local,
whole-stage codegen, zero shuffle at any scale.

This is deliberately the *detectable* subset: free-text names/addresses
need an NER model, which is out of scope for a SQL-dialect-portable
operator (hook point: a mapInPandas stage like functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: emails first (their local part may contain digits/dots the
# later patterns could chew on), then phones, then IPv4.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
]


def redact_pii(c: Column) -> Column:
    """Replace every PII match with its typed placeholder token."""
    out = c
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-kind match counts (on the ORIGINAL text, before redaction)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")
        for kind, pattern, _ in PII_PATTERNS
    }


def redact_pii_sql(expr: str) -> str:
    """DuckDB expression mirroring ``redact_pii`` (same order, 'g' flag)."""
    out = expr
    for _, pattern, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        f"n_{kind}": f"len(regexp_extract_all({expr}, '{pattern}'))::BIGINT"
        for kind, pattern, _ in PII_PATTERNS
    }
