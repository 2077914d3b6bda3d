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
import pandas as pd
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


def cosine_topk_multi(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Batched top-k: many query vectors against the corpus in ONE job.

    The single-query variant fetches its vector with a driver ``.head()``
    per invocation — fine for one query, a driver round-trip per query for
    a workload. Here the query set is a DataFrame: broadcast it against the
    corpus (small × big nested-loop is the RIGHT plan — every (query, doc)
    pair must be scored), then per-query top-k via a ranking window over
    the query id. One tiny shuffle on query_id; corpus scanned once
    regardless of query count.

    Returns (q_id, {id_col}, score) with ≤ k rows per q_id.
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("q_id"),
            F.col(query_vec_col).alias("_qv"),
        )
    )
    scored = embeddings.select(F.col(id_col), F.col(vec_col)).crossJoin(q)
    scored = scored.withColumn("_cos", cosine(F.col(vec_col), F.col("_qv")))
    w = Window.partitionBy("q_id").orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", id_col, F.round("_cos", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probe nearest cells
# ---------------------------------------------------------------------------

def kmeans_centroids(
    mat: np.ndarray, k: int, seed: int = 7, iters: int = 20
) -> np.ndarray:
    """Deterministic Lloyd k-means on a (driver-side) training matrix.

    At corpus scale the trainer sees a SAMPLE (a few 100k vectors is ample
    for a coarse quantizer) — the full corpus never reaches the driver;
    only the k×d centroid matrix does, and it ships back as a broadcast-
    sized literal. Fixed seed + fixed iteration count ⇒ identical
    centroids every run."""
    rng = np.random.RandomState(seed)
    mat = np.asarray(mat, dtype=np.float64)
    centers = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        # GEMM distance form, O(n·k) memory (the (n,k,d) broadcast form is
        # tens of GB at a 100k-vector sample with √n cells):
        # argmin ‖x−c‖² = argmin ‖c‖² − 2·x·c  (‖x‖² constant per row)
        d2 = (centers * centers).sum(axis=1)[None, :] - 2.0 * (mat @ centers.T)
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(centers)).astype(np.float64)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centers


def ivf_cell_col(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid assignment as an Arrow-batched matrix op: one
    (batch × d)·(d × k) GEMM + argmin per batch — vectorized NumPy, never
    per-row Python. In production this column is materialized at ingest
    (like the LSH signatures)."""
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)  # ‖c‖² per centroid

    @F.pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=np.int32)
        if len(vecs):
            M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            # argmin ‖x-c‖² = argmin ‖c‖² - 2x·c  (‖x‖² constant per row)
            d2 = c_sq[None, :] - 2.0 * (M @ C.T)
            out = d2.argmin(axis=1).astype(np.int32)
        return pd.Series(out)

    return _assign(vec_col)


def ann_ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int | None = 4096,
) -> DataFrame:
    """IVF ANN: k-means cells + probe the ``nprobe`` cells nearest the
    query + exact rerank — the second classic ANN index family next to
    LSH (ann_lsh_topk). Probed fraction ≈ nprobe/n_cells of the corpus
    (cells are balanced on isotropic data); raise n_cells with corpus
    size (√n is the usual rule) to keep it small.

    The quantizer trains on a BOUNDED deterministic sample: rows ordered
    by ``xxhash64(id)`` (a seed-free pseudo-random shuffle every executor
    agrees on), capped at ``train_limit`` via ``TakeOrderedAndProject`` —
    so at most k·d + train_limit·d floats ever reach the driver no matter
    the corpus size. A few thousand vectors is ample for a coarse
    quantizer; ``train_limit=None`` (full-corpus training) is an explicit
    test-scale opt-in, never the default."""
    train_df = embeddings.select(F.col(id_col), F.col(vec_col))
    if train_limit is not None:
        train_df = (
            train_df.orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(train_limit)
        )
    train = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in train_df.collect()]
    )
    centroids = kmeans_centroids(train, n_cells, seed)

    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe_cells = [int(c) for c in d2.argsort()[:nprobe]]

    candidates = embeddings.withColumn(
        "_cell", ivf_cell_col(F.col(vec_col), centroids)
    ).filter(F.col("_cell").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


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
    probe_bits: int = 2,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: multi-table LSH + multiprobe, then exact rerank.

    The classic recall lever is L INDEPENDENT hash tables (different
    hyperplane seeds): a true neighbor is missed only if it misses in
    every table — recall = 1-(1-r)^L for per-table recall r. ``probe_bits``
    additionally probes every bucket within that Hamming distance of the
    query's signature in each table (0 → exact bucket; 1 → +n_bits flips;
    2 → +C(n_bits,2) double flips). Probed corpus fraction ≈
    L · Σ C(n,i)/2ⁿ (small-corpus regime; at production sizes raise
    n_bits with L so each table has far more buckets than docs and the
    fraction collapses). Measured on the fixture corpus (uniform random
    embeddings — the hardest case, neighbors barely closer than
    non-neighbors): min recall@10 = 0.9 across probed query points at the
    defaults, vs 0.1-0.5 for the single-table variant.

    The candidate filter is ONE scan with an OR over per-table
    ``isin(probes)`` — all JVM expressions. In production the L signature
    columns are materialized once at ingest
    (``withColumn(f'sig{t}', rh_signature_col(...))`` + write); here they
    are computed inline so the operator is self-contained.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    cond = None
    out = embeddings
    for t in range(n_tables):
        planes = _hyperplanes(len(query_vec), n_bits, seed + 101 * t)
        q_sig = 0
        for i, h in enumerate(planes):
            if float(np.dot(q, h)) > 0:
                q_sig |= 1 << i
        probes = [q_sig]
        if probe_bits >= 1:
            probes += [q_sig ^ (1 << i) for i in range(n_bits)]
        if probe_bits >= 2:
            probes += [
                q_sig ^ (1 << i) ^ (1 << j)
                for i in range(n_bits)
                for j in range(i + 1, n_bits)
            ]
        sig = rh_signature_col(F.col(vec_col), planes)
        c = sig.isin(probes)
        cond = c if cond is None else (cond | c)
    candidates = out.filter(cond)
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)
