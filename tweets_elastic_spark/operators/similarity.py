"""Similarity search over embedding columns (north-star block).

Two tiers, same contract:

* **Brute-force cosine top-k** — the exactness baseline: one codegen'd
  pass computing dot/norm per row, then ``TakeOrderedAndProject`` (per-
  partition top-k + driver merge — no global sort, no full shuffle).
  At 100 TB this is a single scan: fine for one-off queries, wasteful for
  repeated ones.
* **Random-hyperplane LSH ANN** — the scale path for repeated queries:
  a deterministic signed-projection signature per vector (computed once,
  persisted alongside the embeddings), bucket lookup + multi-probe (flip
  each signature bit) to gather candidates, exact cosine rerank on the
  small candidate set. Probe cost scales with bucket occupancy, not corpus
  size; recall is tunable via ``n_bits`` (fewer bits → bigger buckets) and
  probe depth.

Hyperplanes are generated from a fixed NumPy seed and embedded as literal
arrays — every executor, run, and the test oracle agree on them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.vectors import cosine, dot, lit_vector


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    score = cosine(F.col(vec_col), lit_vector(query_vec))
    return (
        embeddings.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim)


def rh_signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Signed-projection LSH signature as a long: bit i = [v·h_i > 0]."""
    sig = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        bit = F.when(
            dot(vec_col, lit_vector([float(x) for x in h])) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: LSH bucket (+1-bit probes) then exact rerank.

    In production the signature column is materialized once at ingest
    (``withColumn('sig', rh_signature_col(...))`` + write); here it is
    computed inline so the operator is self-contained.
    """
    planes = _hyperplanes(len(query_vec), n_bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q_sig = 0
    for i, h in enumerate(planes):
        if float(np.dot(q, h)) > 0:
            q_sig |= 1 << i
    probes = [q_sig] + ([q_sig ^ (1 << i) for i in range(n_bits)] if multiprobe else [])

    sig = rh_signature_col(F.col(vec_col), planes)
    candidates = embeddings.withColumn("_sig", sig).filter(
        F.col("_sig").isin(probes)
    )
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)
