"""Dedup + similarity-search queries over documents/embeddings (the
north-star training-data-pipeline block). Exact variants carry full SQL
oracles; the sub-quadratic LSH variants register rows-only and are
recall-tested against the exact variants in tests/test_dedup_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_elastic_spark.operators import dedup as D
from tweets_elastic_spark.operators import similarity as S
from tweets_elastic_spark.registry import register
from tweets_elastic_spark.sources.catalog import load_table

# The documents corpus has no exact duplicates, so exact-dedup queries run
# on corpus ∪ re-keyed corpus (ids + 10000) — every doc duplicated once.
_DOUBLED = """
    WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents
    )
"""

_FP = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.unionAll(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )


@register(
    "dedup_exact_groups",
    oracle=_DOUBLED + f"""
    SELECT {_FP} AS fp, count(*) AS n_dups, min(doc_id) AS keeper_id
    FROM u GROUP BY 1 HAVING count(*) > 1
    """,
    doc="Exact duplicate groups by normalized-text fingerprint (hash groupBy).",
)
def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(_doubled_docs(spark, sf_dir))


@register(
    "dedup_exact_survivors",
    oracle=_DOUBLED + """
    SELECT min(doc_id) AS doc_id FROM u
    GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    """,
    doc="Exact dedup keeping the min-id row per fingerprint.",
)
def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(_doubled_docs(spark, sf_dir)).select("doc_id")


@register(
    "jaccard_near_dups",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_transform(
                 list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''),
                 x -> lower(x)) AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                 ELSE [] END)) AS sh
        FROM toks
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sz sa ON id_a = sa.doc_id
    JOIN sz sb ON id_b = sb.doc_id
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    """,
    doc="Exact 3-word-shingle Jaccard near-dup pairs via inverted-index join "
        "(sub-quadratic; the LSH variant approximates this).",
)
def q_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, k=3, threshold=0.5)


@register(
    "minhash_lsh_near_dups",
    oracle=None,  # probabilistic candidate generation; recall pinned in tests
    doc="MinHash(64)+LSH(16 bands) candidate pairs with estimated jaccard ≥ 0.4.",
)
def q_minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(docs).filter(F.col("est_jaccard") >= 0.4)


@register(
    "simhash_near_dups",
    oracle=None,  # 64-bit signature internals aren't SQL-expressible
    doc="SimHash-64 near-dup pairs (Hamming ≤ 3) via 16-bit-chunk banding.",
)
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(docs, max_distance=3)


@register(
    "embedding_near_dups",
    oracle="""
    -- ::DOUBLE[] casts force f64 math; bare FLOAT[] would make DuckDB
    -- compute the cosine in f32, which drifts from Spark at the 6th decimal
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
    """,
    doc="Embedding-cosine near-dup pairs (exact; LSH-bucketed at scale).",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_pairs(emb, threshold=0.45)


@register(
    "ann_cosine_topk",
    oracle="""
    SELECT vec_id,
           round(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS score
    FROM embeddings
    ORDER BY list_cosine_similarity(
        embedding::DOUBLE[],
        (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]) DESC,
        vec_id ASC
    LIMIT 10
    """,
    doc="Brute-force cosine top-k to a query vector (ANN exactness baseline).",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return S.cosine_topk(emb, qvec, k=10)


@register(
    "ann_lsh_topk",
    oracle=None,  # approximate; recall vs the exact baseline pinned in tests
    doc="LSH-bucketed ANN top-k (random hyperplanes + multiprobe + rerank).",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return S.ann_lsh_topk(emb, qvec, k=10)
