"""Id-keyed sinks with a quarantine channel (SURVEY §2.1 S7-S11).

The reference bulk-loads documents into Elasticsearch with an explicit
``_id`` per row (src/main.py:137-148) so re-imports are idempotent
(overwrite-by-id), recreates the index on demand (src/main.py:12-35), and
prints failed bulk items per batch (src/main.py:147-148). Spark-first
equivalents:

* id-keyed parquet dataset writer — ``mode('overwrite')`` replaces the
  delete-and-recreate DDL; per-partition parallel writes replace the
  single-threaded bulk loop (the ``parallel_bulk`` the reference imported
  but never used, src/main.py:4);
* a validation splitter that routes bad rows to a quarantine DataFrame with
  a reason column instead of printing them;
* an optional Elasticsearch connector writer (``org.elasticsearch.spark.sql``)
  for environments that ship the connector jar — the sandbox doesn't, so it
  fails with a clear message rather than an import error.

At 100 TB: ``partition_by`` + ``target_file_partitions`` control file sizing
(the 3-shard / 20-40 GB-per-shard guidance, docs/protokol.md:23, maps to
output-partition counts); dedup-before-write enforces id uniqueness the way
ES's overwrite-by-id would.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_documents(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_partitions: int | None = None,
    dedup_ids: bool = True,
) -> None:
    """Write an id-keyed document dataset (S7/S8 analogue).

    ``dedup_ids`` keeps the LAST row per id (ES bulk semantics: later ops
    overwrite earlier ones within a load)."""
    out = df
    if dedup_ids:
        # max_by over a monotonic tiebreak would need an order column; for
        # batch loads "last" is meaningless across a shuffle, so keep ONE
        # arbitrary-but-deterministic row per id via a sorted struct agg.
        # Unorderable payload types (maps) can't go through max(struct) —
        # fall back to dropDuplicates (still one row per id, but which row
        # wins is partition-order-dependent).
        other = [c for c in out.columns if c != id_col]
        orderable = not any("map<" in t for _, t in out.dtypes)
        if orderable:
            out = (
                out.groupBy(id_col)
                .agg(F.max(F.struct(*other)).alias("_row"))
                .select(id_col, "_row.*")
            )
        else:
            out = out.dropDuplicates([id_col])
    if target_file_partitions is not None:
        out = out.repartition(target_file_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def increment_counters(
    spark,
    path: str,
    deltas: DataFrame,
    id_col: str = "id",
    counter_col: str = "retweet_count",
    delta_col: str = "delta",
) -> int:
    """S11 analogue: batch update-in-place of a counter column.

    The reference applies ``ctx._source.retweet_count += params.n`` per
    document through ES's ``_update`` + Painless (docs/protokol.md:596-611).
    The Spark-first batch equivalent: read the id-keyed dataset, left-join
    the summed (id, delta) updates, add the delta, and swap the dataset
    directory (write-to-temp, rename old aside, rename new in — reading
    and overwriting the SAME parquet path in one job would race the file
    deletion, and deleting before writing could lose data on a crash).
    Documents without a delta pass through unchanged; deltas for unknown
    ids are ignored (ES would 404 them); several deltas for one id sum.
    Returns the number of documents updated.

    One scan + one broadcast-or-shuffle join at any scale; a transactional
    table format (Delta MERGE) is the upsert-grade version of the same
    logical plan.
    """
    docs = spark.read.parquet(path)
    # pre-aggregate: several delta batches for one id sum into one update
    # (ES would apply them sequentially to one doc) — without this, dup ids
    # in the join would duplicate whole document rows
    d = deltas.groupBy(F.col(id_col).alias("_upd_id")).agg(
        F.sum(delta_col).alias("_delta")
    )
    # no forced broadcast: delta sets are usually small (AQE broadcasts
    # them on its own) but can be corpus-sized after a recount job
    from pyspark.sql import Observation

    obs = Observation()
    updated = (
        docs.join(d, docs[id_col] == d["_upd_id"], "left")
        .withColumn(
            counter_col,
            (F.col(counter_col) + F.coalesce(F.col("_delta"), F.lit(0))).cast(
                dict(docs.dtypes)[counter_col]
            ),
        )
        # the updated-row count rides the write job (observe) — a separate
        # semi-join count would re-scan the whole dataset
        .observe(
            obs,
            F.sum(F.col("_upd_id").isNotNull().cast("long")).alias("n_updated"),
        )
        .drop("_upd_id", "_delta")
    )
    tmp = path.rstrip("/") + ".updating"
    updated.write.mode("overwrite").parquet(tmp)
    n_updated = int(obs.get["n_updated"] or 0)
    _swap_dataset_dir(path, tmp)
    return n_updated


def _swap_dataset_dir(path: str, tmp: str) -> None:
    """Replace the live dataset directory with ``tmp`` via two renames: the
    data is always recoverable (a crash between them leaves `.old` + the
    new directory intact — the only window is a momentarily missing live
    path, vs rmtree-first which could LOSE data). A transactional table
    format (Delta) removes even that window; documented trade-off for a
    filesystem sink."""
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def compact_sink(spark, path: str, id_col: str = "id") -> int:
    """Cross-increment overwrite-by-id for the ``ingest_wm=…`` sink layout
    (pipeline.py): keep the row from the LATEST increment per id and
    rewrite the dataset as a single ``ingest_wm=-1`` partition.

    The incremental writers are append-only across partitions — when a
    conversation is re-documented (watermark rewound for a backfill, or a
    one-shot build followed by increments), both versions exist in
    different ``ingest_wm`` directories. ES resolves that at write time by
    ``_id`` overwrite; a filesystem sink resolves it here: one shuffle by
    id, ``row_number`` over ``ingest_wm DESC`` (a later increment always
    wins), rewrite, swap. Compaction is idempotent and the compacted sink
    remains a valid target for further increments (``-1`` sorts below
    every real watermark, so the next re-document still wins).

    Recency is the watermark lineage, not wall-clock: a REWOUND backfill
    writes into a lower ``ingest_wm`` directory than later normal batches.
    That is still correct — every id the rewound run re-documents either
    has no newer coverage, or a newer batch documented it from the same
    source state — but it means a backfill refreshes exactly the ids
    at/after its rewind point; rewind to 0 to re-document everything (the
    reference's full re-import, ES overwriting by ``_id``).

    Returns the number of surviving documents."""
    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    docs = spark.read.parquet(path)
    w = Window.partitionBy(id_col).orderBy(F.col("ingest_wm").desc())
    obs = Observation()
    latest = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "ingest_wm")
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    tmp = path.rstrip("/") + ".compacting"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    latest.write.mode("overwrite").parquet(os.path.join(tmp, "ingest_wm=-1"))
    n = int(obs.get["n"])
    _swap_dataset_dir(path, tmp)
    return n


def document_json(df: DataFrame, id_col: str = "id") -> DataFrame:
    """P6: the document's JSON wire format (to_json at the sink boundary —
    ``to_json(a.*)`` queries.sql:20; bulk bodies src/main.py:140,146).

    Internally documents stay native nested structs (SURVEY §1.1); JSON
    exists only when rows cross to an external system. Returns
    (id, json) where ``json`` serializes every column EXCEPT the id — the
    id travels in the bulk-op header, not the body, exactly like the
    reference's ``{'index': {'_id': ...}}`` + document pairs
    (src/main.py:137-141). Timestamps render in ISO-8601; field order is
    schema order, so the bytes are stable run-to-run."""
    body = [c for c in df.columns if c != id_col]
    return df.select(
        F.col(id_col),
        F.to_json(
            F.struct(*[F.col(c) for c in body]),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ssXXX"},
        ).alias("json"),
    )


def write_documents_json(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> None:
    """JSON-lines sink variant of write_documents (S8 + P6): one
    ``{"id": ..., "json": "..."}`` line per document — the bulk-request
    body the reference ships over HTTP, materialized as files."""
    out = document_json(df, id_col)
    if target_file_partitions is not None:
        out = out.repartition(target_file_partitions)
    out.write.mode(mode).json(path)


def validate_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """S9 analogue: split into (good, quarantine). ``rules`` maps a reason
    string to a predicate that VALID rows satisfy; quarantined rows carry
    the array of failed-rule names in ``_errors``."""
    errors = F.array_compact(
        F.array(*[
            F.when(~cond, F.lit(name)).otherwise(F.lit(None))
            for name, cond in rules.items()
        ])
    )
    tagged = df.withColumn("_errors", errors)
    good = tagged.filter(F.size("_errors") == 0).drop("_errors")
    bad = tagged.filter(F.size("_errors") > 0)
    return good, bad


def write_elasticsearch(
    df: DataFrame,
    index: str,
    id_col: str = "id",
    nodes: str = "localhost:9200",
    batch_entries: int = 200,
) -> None:
    """Optional ES sink via the elasticsearch-spark connector (the
    production path the reference's bulk loop corresponds to; batch size
    mirrors src/main.py:109). Raises a clear error when the connector jar
    isn't on the classpath."""
    try:
        (
            df.write.format("org.elasticsearch.spark.sql")
            .option("es.nodes", nodes)
            .option("es.mapping.id", id_col)
            .option("es.batch.size.entries", str(batch_entries))
            .option("es.index.auto.create", "true")
            .mode("append")
            .save(index)
        )
    except Exception as e:
        # only translate the missing-connector case — a live-cluster write
        # failure (ES down, mapping rejection, task failure) must surface
        # as itself, not as classpath guidance
        msg = str(e)
        if (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
        ):
            raise RuntimeError(
                "elasticsearch-spark connector not available on the classpath; "
                "add org.elasticsearch:elasticsearch-spark-30_2.13 to "
                "spark.jars.packages or use write_documents (parquet sink)"
            ) from e
        raise


def _compile_dsl(query, id_field: str = "doc_id"):
    from tweets_elastic_spark.plans.search import Query, from_es_json

    if isinstance(query, Query):
        return query
    return from_es_json(query, id_field=id_field)


def delete_by_query(df: DataFrame, query) -> DataFrame:
    """ES ``_delete_by_query``: remove every document the query matches.

    The relational form is the SURVIVOR relation — one negated-predicate
    filter riding the scan (vs ES's scroll-then-bulk-delete round trips);
    write it back through ``write_documents(mode='overwrite')`` or a
    transactional DELETE at deploy scale. ``query`` is ES query-DSL JSON
    or a compiled Query node."""
    from tweets_elastic_spark.plans.search import _col_resolver

    q = _compile_dsl(query)
    spark = df.sparkSession
    return df.filter(~F.coalesce(
        q.predicate(spark, _col_resolver), F.lit(False)
    ))


_CTX_RE = None


def update_by_query(df: DataFrame, query, script: str,
                    params: dict | None = None) -> DataFrame:
    """ES ``_update_by_query``: apply a Painless assignment to every
    matching document. Supported script shape — the one virtually every
    production update_by_query takes:

        ctx._source.<target> = <arithmetic over ctx._source.* and params.*>

    The rhs goes through the same Painless-arithmetic compiler as
    script_score/scripted_metric, so the whole update is ONE conditional
    codegen'd projection over the scan (non-matching documents pass
    through bit-unchanged) — vs ES's per-document script interpreter +
    reindex. Anything outside that shape raises loudly."""
    import re

    from tweets_elastic_spark.plans.search import (
        _col_resolver,
        compile_painless,
    )

    m = re.match(
        r"^\s*ctx\._source\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*;?\s*$",
        script, flags=re.DOTALL,
    )
    if not m:
        raise ValueError(
            "update_by_query supports `ctx._source.<field> = <arithmetic>` "
            f"scripts only, got {script!r}"
        )
    target, rhs = m.group(1), m.group(2)
    if target not in df.columns:
        raise ValueError(
            f"update_by_query target {target!r} is not a column "
            f"(have {df.columns}) — ES would dynamically add it; a typed "
            "engine refuses"
        )
    # the rhs reads fields as ctx._source.X — rewrite to the compiler's
    # doc['X'].value form
    rhs_doc = re.sub(r"ctx\._source\.([A-Za-z_][A-Za-z0-9_]*)",
                     r"doc['\1'].value", rhs)
    expr = compile_painless(
        rhs_doc,
        resolve_doc=F.col,
        params={k: F.lit(v) for k, v in (params or {}).items()},
    )
    q = _compile_dsl(query)
    spark = df.sparkSession
    pred = F.coalesce(q.predicate(spark, _col_resolver), F.lit(False))
    old = F.col(target)
    return df.withColumn(
        target,
        F.when(pred, expr.cast(dict(df.dtypes)[target])).otherwise(old),
    )
