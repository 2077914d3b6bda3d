"""Small ES REST-API surface beyond `_search`: `_count`, `_msearch`,
`_field_caps` — the operational endpoints a reference user calls around
their queries. Each is a thin, declarative wrapper over the existing
query/aggs machinery (nothing new executes; these exist so the MIGRATION
map covers the whole client surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweets_elastic_spark.plans.search import _col_resolver, from_es_json


def es_count(
    df: DataFrame,
    request: dict | None = None,
    **compile_opts,
) -> DataFrame:
    """ES ``_count``: matching-document count for a query (match_all when
    absent). Returns a 1-row (count BIGINT) relation — an aggregate the
    scan feeds directly (count(*) over the pushed-down predicate), never
    a collect. ``compile_opts`` pass through to from_es_json
    (analyzers/tokens_cols/nested_paths)."""
    body = (request or {}).get("query")
    if body is not None:
        q = from_es_json({"query": body}, **compile_opts)
        df = df.filter(q.predicate(df.sparkSession, _col_resolver))
    return df.agg(F.count(F.lit(1)).alias("count"))


def es_msearch(
    df: DataFrame,
    requests: list[dict],
    *,
    tiebreak: str | None = None,
    **compile_opts,
) -> list[DataFrame]:
    """ES ``_msearch``: a batch of search requests over one index. Returns
    one result DataFrame per request, in order — each compiled through
    the full es_request envelope (query/sort/size/aggs/...). The batch is
    DECLARATIVE: nothing executes here; callers that want the answers
    concurrently simply trigger the returned frames' actions from
    concurrent driver threads (Spark's scheduler interleaves the jobs —
    the scatter half of ES's msearch fan-out)."""
    from tweets_elastic_spark.plans.aggs import es_request

    if not isinstance(requests, list) or not requests:
        raise ValueError("_msearch needs a non-empty list of requests")
    return [
        es_request(df, r, tiebreak=tiebreak, **compile_opts)
        for r in requests
    ]


def es_field_caps(df: DataFrame) -> DataFrame:
    """ES ``_field_caps``: per-field capability metadata. Here the index
    schema IS the DataFrame schema, so capabilities derive from the Spark
    type: every field is searchable+aggregatable (columnar storage has no
    unindexed fields — a strictly-stronger capability surface than ES,
    where only indexed/doc_values fields qualify). Nested struct/array
    fields are reported with dotted paths, like ES's response."""
    rows = []

    def walk(prefix: str, dtype) -> None:
        from pyspark.sql.types import ArrayType, StructType

        if isinstance(dtype, StructType):
            for f in dtype.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)
        elif isinstance(dtype, ArrayType):
            walk(prefix, dtype.elementType)
        else:
            rows.append((prefix, dtype.simpleString(), True, True))

    walk("", df.schema)
    return df.sparkSession.createDataFrame(
        rows, "field string, type string, searchable boolean, "
              "aggregatable boolean",
    )


def es_termvectors(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "standard",
    tokens_col: str | None = None,
    with_positions: bool = True,
) -> DataFrame:
    """ES ``_termvectors``: per-document term statistics — term frequency
    and (optionally) the positions list — the API behind keyword
    extraction and relevance debugging. One explode+groupBy over the
    analyzed tokens (or the MATERIALIZED token column when the index
    already carries it — then the analyzer never re-runs); positions
    aggregate as a sorted int list, ES's response shape flattened to one
    row per (doc, term)."""
    from tweets_elastic_spark.functions.analyzers import analyze

    toks = (
        F.col(tokens_col) if tokens_col is not None
        else analyze(F.col(text_col), analyzer)
    )
    pos = df.select(
        F.col(id_col),
        F.posexplode(toks).alias("position", "term"),
    )
    aggs = [F.count(F.lit(1)).alias("term_freq")]
    if with_positions:
        aggs.append(F.array_sort(F.collect_list("position")).alias("positions"))
    return pos.groupBy(id_col, "term").agg(*aggs)
