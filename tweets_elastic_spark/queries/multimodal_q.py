"""Multimodal plumbing queries: binary payloads derived deterministically
from the documents corpus, decoded via mapInPandas — metadata checked
against a pure-SQL oracle (the stub codec's formulas are SQL-expressible by
design, so the whole Arrow plumbing path gets a hard correctness gate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tweets_elastic_spark.functions.multimodal import attach_payload, decode_assets, sample_frames
from tweets_elastic_spark.registry import register
from tweets_elastic_spark.sources.catalog import load_table


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           ['image','audio','video'][(doc_id % 3) + 1] AS modality,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,  -- VARCHAR overload == sha256 of utf-8 bytes
           CAST(1 + octet_length(encode(text)) % 640 AS INT) AS width,
           CAST(1 + octet_length(encode(text)) % 480 AS INT) AS height
    FROM documents
    """,
    doc="Binary-column decode plumbing (mapInPandas, stub codec) with full "
        "metadata oracle.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_assets(attach_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(f AS INT) AS frame_idx,
           (octet_length(encode(text)) * f) // 4 AS byte_offset
    FROM documents, range(4) r(f)
    WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
    """,
    doc="1→N frame sampling for video assets (explode-shaped mapInPandas).",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), n_frames=4).select(
        "asset_id", "frame_idx", "byte_offset"
    )
