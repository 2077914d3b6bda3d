"""ES aggregations-DSL front-end (SURVEY §2.5 extension): the ``aggs`` half
of a search request compiled to one groupBy plan.

The reference exercises the query DSL (plans/search.py compiles its
artifact verbatim); a user of Elasticsearch runs *aggregation* requests
against the same index — terms buckets, date histograms, metric sub-aggs.
This module compiles that JSON shape to a single declarative
``groupBy(...).agg(...)`` so Catalyst plans it as one partial+final
aggregation over the (optionally query-filtered) scan.

Supported surface:

* bucket aggs: ``terms`` (keyword buckets, ``size`` top-N by doc_count
  desc / key asc), ``date_histogram`` (``calendar_interval``: minute,
  hour, day, month, year), ``histogram`` (numeric, fixed ``interval``),
  ``range`` (sorted non-overlapping [from, to) buckets, ES key labels);
  one bucket agg may nest ONE further bucket agg under ``aggs``. ES's
  null contract holds: documents missing the bucket field leave the
  aggregation unless ``missing`` supplies a substitute.
* metric sub-aggs: ``sum``, ``avg``, ``min``, ``max``, ``value_count``,
  ``cardinality``. ES's ``cardinality`` is an HLL approximation; this
  engine evaluates it EXACTLY (countDistinct) so results stay
  oracle-checkable — a documented, strictly-more-accurate divergence.
* ``top_hits`` (per-bucket top documents by an explicit sort — a window
  rank, must be the bucket's only sub-agg since its result shape is
  documents, not metrics).

Result shape: the flattened leaf-bucket relation — one row per innermost
bucket combination, carrying every level's key column plus ``doc_count``
and the metric columns (ES's nested JSON response is a tree rendering of
exactly this relation). Unknown agg types raise — never a silently
dropped aggregation.

At scale nothing here is new machinery: buckets are groupBy keys (hash
partial aggregation map-side), metrics are built-in JVM aggregates, and
``terms`` size is a TakeOrderedAndProject over bucket counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CALENDAR_FMT = {
    "minute": "yyyy-MM-dd HH:mm",
    "hour": "yyyy-MM-dd HH",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
}

_METRICS = {
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "value_count": lambda c: F.count(c),
    "cardinality": lambda c: F.countDistinct(c),
}


def _bucket_key(kind: str, body: dict) -> Column:
    """Bucket-key expression. ES's null contract: documents missing the
    field fall out of the aggregation unless ``missing`` supplies a
    substitute — modeled here as a key that stays NULL (dropped by
    es_aggregate) or coalesces to the ``missing`` value."""
    field = body["field"]
    src: Column = F.col(field)
    if "missing" in body:
        src = F.coalesce(src, F.lit(body["missing"]))
    if kind == "terms":
        return src
    if kind == "date_histogram":
        fixed = body.get("fixed_interval")
        if fixed is not None:
            # "30s" / "15m" / "6h" / "2d" → UTC-epoch-aligned buckets of
            # that exact width, keyed by the bucket-start timestamp string
            # (ES's fixed_interval semantics).
            import re

            m = re.fullmatch(r"(\d+)(s|m|h|d)", str(fixed))
            if not m:
                raise ValueError(
                    f"bad fixed_interval {fixed!r} (expected <n>[smhd])"
                )
            secs = int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2)]
            bucket_start = F.timestamp_seconds(
                F.floor(F.unix_timestamp(src) / F.lit(secs)) * F.lit(secs)
            )
            return F.date_format(bucket_start, "yyyy-MM-dd HH:mm:ss")
        interval = body.get("calendar_interval", body.get("interval"))
        if interval not in _CALENDAR_FMT:
            raise ValueError(
                f"unsupported date_histogram interval: {interval!r} "
                f"(supported: {sorted(_CALENDAR_FMT)}, or fixed_interval)"
            )
        return F.date_format(src, _CALENDAR_FMT[interval])
    if kind == "histogram":
        width = float(body["interval"])
        return (F.floor(src / F.lit(width)) * F.lit(width)).cast("double")
    if kind == "range":
        # ES range agg: [from, to) buckets, keyed "from-to" ("*" open end);
        # a doc lands in every bucket containing its value — but ranges in
        # practice partition, and overlapping ranges would need an explode;
        # refuse overlap instead of silently single-assigning.
        ranges = body["ranges"]
        for a, b in zip(ranges, ranges[1:]):
            lo_b = b.get("from")
            hi_a = a.get("to")
            if hi_a is None or (lo_b is not None and lo_b < hi_a):
                raise ValueError(
                    "range agg buckets must be sorted and non-overlapping "
                    f"(got {a} then {b})"
                )
        key: Column = F.lit(None).cast("string")
        for r in reversed(ranges):
            lo, hi = r.get("from"), r.get("to")
            label = r.get(
                "key",
                f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}",
            )
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (src >= F.lit(lo))
            if hi is not None:
                cond = cond & (src < F.lit(hi))
            key = F.when(src.isNotNull() & cond, F.lit(label)).otherwise(key)
        return key
    raise ValueError(f"unsupported bucket aggregation: {kind!r}")


def _metric_cols(aggs: dict) -> list[Column]:
    """Metric sub-aggs only (bucket sub-aggs are handled by recursion).
    ``stats`` expands to its five ES response keys as ``{name}_{stat}``
    columns — the flattened rendering of the stats object."""
    out = []
    for name, spec in aggs.items():
        spec = dict(spec)
        spec.pop("aggs", None)  # a sibling bucket agg carries its own subtree
        (kind, body), = spec.items()
        if kind in _METRICS:
            out.append(_METRICS[kind](F.col(body["field"])).alias(name))
        elif kind == "stats":
            c = F.col(body["field"])
            out += [
                F.count(c).alias(f"{name}_count"),
                F.min(c).alias(f"{name}_min"),
                F.max(c).alias(f"{name}_max"),
                F.avg(c).alias(f"{name}_avg"),
                F.sum(c).alias(f"{name}_sum"),
            ]
        elif kind in ("terms", "date_histogram", "histogram", "range"):
            continue  # nested bucket, handled by the caller
        else:
            raise ValueError(f"unsupported aggregation type: {kind!r}")
    return out


def _filters_agg(df: DataFrame, name: str, body: dict) -> DataFrame:
    """ES ``filters`` agg: one named bucket per predicate, each counting
    the documents its query matches (buckets may overlap — a doc can land
    in several). One conditional-aggregation scan (sum-of-CASE per
    bucket), stacked to (name, doc_count) rows with the native unpivot —
    no per-bucket pass, no join. Metric sub-aggs are not supported here;
    run one request per bucket for those."""
    from tweets_elastic_spark.plans.search import from_es_json

    named = body.get("filters")
    if not isinstance(named, dict) or not named:
        raise ValueError("filters agg needs {'filters': {name: query, ...}}")
    counts = [
        F.sum(
            F.when(
                from_es_json(q).predicate(df.sparkSession, F.col), 1
            ).otherwise(0)
        ).cast("long").alias(bucket)
        for bucket, q in named.items()
    ]
    wide = df.agg(*counts)
    return wide.unpivot([], list(named), name, "doc_count")


def _top_hits(
    df: DataFrame, bucket_key: Column, bucket_name: str, body: dict
) -> DataFrame:
    """``top_hits`` sub-agg: the top ``size`` documents per bucket by the
    given sort — a window rank over the bucket key, the per-group-top-k
    plan (one exchange on the bucket key, no self-join). Returns one row
    per (bucket, hit) with the bucket key + ``_source`` columns."""
    from pyspark.sql.window import Window

    size = int(body.get("size", 3))
    order = []
    for entry in body.get("sort", []):
        if isinstance(entry, str):
            order.append(F.col(entry).asc())
        else:
            (field, direction), = entry.items()
            if isinstance(direction, dict):
                direction = direction.get("order", "asc")
            col = F.col(field)
            order.append(col.desc() if direction == "desc" else col.asc())
    if not order:
        raise ValueError("top_hits needs an explicit sort (score is bucket-free here)")
    w = Window.partitionBy("_bucket").orderBy(*order)
    out = (
        df.withColumn("_bucket", bucket_key)
        .filter(F.col("_bucket").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= size)
        .drop("_rk")
        .withColumnRenamed("_bucket", bucket_name)
    )
    source = body.get("_source")
    if source is not None:
        out = out.select(bucket_name, *source)
    return out


def es_aggregate(df: DataFrame, aggs_dsl: dict) -> DataFrame:
    """Compile one top-level named agg (ES ``"aggs": {name: {...}}``) to a
    groupBy plan and return the flattened leaf-bucket relation."""
    if len(aggs_dsl) != 1:
        raise ValueError(
            f"expected exactly one top-level aggregation, got {sorted(aggs_dsl)}"
        )
    (name, spec), = aggs_dsl.items()
    spec = dict(spec)
    sub = spec.pop("aggs", {})
    (kind, body), = spec.items()

    if kind == "filters":
        if sub:
            raise ValueError("filters agg does not support sub-aggs here")
        return _filters_agg(df, name, body)

    # top_hits: a different result shape (documents, not metrics) — it
    # must be the bucket's only sub-agg.
    th = [(n, s["top_hits"]) for n, s in sub.items() if "top_hits" in s]
    if th:
        if len(sub) != 1:
            raise ValueError("top_hits must be the bucket's only sub-agg")
        (_, th_body), = th
        return _top_hits(df, _bucket_key(kind, body), name, th_body)

    keys = [(_bucket_key(kind, body), name)]
    size = body.get("size") if kind == "terms" else None

    # one optional nested bucket level
    nested_bucket = [
        (n, s) for n, s in sub.items()
        if next(iter(s)) in ("terms", "date_histogram", "histogram", "range")
    ]
    if len(nested_bucket) > 1:
        raise ValueError("at most one nested bucket aggregation is supported")
    metrics = _metric_cols(sub)
    if nested_bucket and metrics:
        # ES attaches same-level metrics to the PARENT bucket; this engine
        # returns the flattened leaf relation, where they would silently
        # change granularity — refuse instead of reinterpreting.
        raise ValueError(
            "metric sub-aggs next to a nested bucket agg are ambiguous in "
            "the flattened relation; put metrics under the innermost bucket"
        )
    if nested_bucket:
        (sub_name, sub_spec), = nested_bucket
        sub_spec = dict(sub_spec)
        sub_sub = sub_spec.pop("aggs", {})
        (sub_kind, sub_body), = sub_spec.items()
        if any(next(iter(s)) in ("terms", "date_histogram", "histogram", "range")
               for s in sub_sub.values()):
            raise ValueError("bucket nesting deeper than two levels is unsupported")
        keys.append((_bucket_key(sub_kind, sub_body), sub_name))
        metrics = metrics + _metric_cols(sub_sub)

    keyed = df
    for k, _ in keys:
        # ES null contract: a document with no value for the bucket field
        # (and no `missing` substitute) belongs to no bucket.
        keyed = keyed.filter(k.isNotNull())
    out = (
        keyed.groupBy(*[k.alias(n) for k, n in keys])
        .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
    )
    if nested_bucket and body.get("min_doc_count") is not None:
        raise ValueError(
            "min_doc_count on a parent bucket above a nested bucket is "
            "ambiguous in the flattened relation; apply it to the "
            "innermost bucket"
        )
    leaf_body = sub_body if nested_bucket else body
    mdc = leaf_body.get("min_doc_count")
    if mdc is not None:
        out = out.filter(F.col("doc_count") >= int(mdc))
    if size is not None:
        # ES terms-agg truncation: top-N buckets by doc_count desc, key asc.
        # With a nested level the bucket count is the SUM over its leaves.
        if nested_bucket:
            top = (
                out.groupBy(name)
                .agg(F.sum("doc_count").alias("_n"))
                .orderBy(F.col("_n").desc(), F.col(name).asc())
                .limit(int(size))
                .select(name)
            )
            out = out.join(F.broadcast(top), name, "inner")
        else:
            out = out.orderBy(
                F.col("doc_count").desc(), F.col(name).asc()
            ).limit(int(size))
    return out


def es_request(
    df: DataFrame,
    request: dict,
    *,
    analyzers: dict[str, str] | None = None,
    tokens_cols: dict[str, str] | None = None,
    nested_paths=frozenset(),
    tiebreak: str | None = None,
) -> DataFrame:
    """Execute a full ES search-request envelope: optional ``query``
    (compiled by plans.search.from_es_json) filters the scan; ``aggs``
    returns the bucket relation; otherwise hits are returned — sorted by
    ``sort`` (a list of field names or ``{field: "asc"|"desc"}`` entries,
    ES's explicit-sort shape) or by score when no sort is given, truncated
    to ``size``, projected to ``_source`` when present. Explicit sort +
    size compiles to TakeOrderedAndProject, the same per-partition-top-k /
    merge plan relevance queries get."""
    from tweets_elastic_spark.plans.search import from_es_json, search

    body = dict(request)
    q = body.get("query")
    aggs = body.get("aggs", body.get("aggregations"))
    if q is not None:
        tree = from_es_json(
            {"query": q}, analyzers=analyzers, tokens_cols=tokens_cols,
            nested_paths=nested_paths,
        )
    else:
        tree = None
    if aggs is not None:
        filtered = df if tree is None else df.filter(
            tree.predicate(df.sparkSession, F.col)
        )
        return es_aggregate(filtered, aggs)
    if tree is None:
        raise ValueError("request has neither 'query' nor 'aggs'")
    sort = body.get("sort")
    source = body.get("_source")
    if sort is not None:
        out = df.filter(tree.predicate(df.sparkSession, F.col))
        specs: list[tuple[str, bool]] = []  # (field, is_desc)
        for entry in sort if isinstance(sort, list) else [sort]:
            if isinstance(entry, str):
                specs.append((entry, False))
            else:
                (field, direction), = entry.items()
                if isinstance(direction, dict):  # {"field": {"order": "desc"}}
                    direction = direction.get("order", "asc")
                if direction not in ("asc", "desc"):
                    raise ValueError(f"bad sort direction {direction!r} for {field!r}")
                specs.append((field, direction == "desc"))
        if tiebreak is not None:
            specs.append((tiebreak, False))
        after = body.get("search_after")
        if after is not None:
            # ES deep pagination: rows STRICTLY after the cursor in the
            # total sort order — the keyset predicate, lexicographic over
            # the sort keys (direction-aware), which pushes down to the
            # scan instead of skipping `from` rows.
            if len(after) != len(specs):
                raise ValueError(
                    f"search_after needs one value per sort key "
                    f"(incl. tiebreak): got {len(after)}, sort has {len(specs)}"
                )
            pred = F.lit(False)
            for i in range(len(specs) - 1, -1, -1):
                field, is_desc = specs[i]
                col, val = F.col(field), F.lit(after[i])
                strict = col < val if is_desc else col > val
                pred = strict | ((col == val) & pred)
            out = out.filter(pred)
        order = [
            F.col(f).desc() if d else F.col(f).asc() for f, d in specs
        ]
        out = out.orderBy(*order).limit(int(body.get("size", 10)))
    else:
        if body.get("search_after") is not None:
            raise ValueError("search_after requires an explicit sort")
        out = search(df, tree, k=body.get("size", 10), tiebreak=tiebreak)
    if source is not None:
        out = out.select(*source)
    return out
