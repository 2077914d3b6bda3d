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
    # project to (q_id, id, score) BEFORE the ranking window: the window
    # shuffle then moves 3 scalars per row instead of two d-dim vectors
    scored = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .select(
            "q_id", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
        )
    )
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


def train_quantizer(
    embeddings: DataFrame,
    n_cells: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int | None = 4096,
) -> np.ndarray:
    """Train the IVF coarse quantizer on a BOUNDED deterministic sample:
    rows ordered by ``xxhash64(id)`` (a seed-free pseudo-random shuffle
    every executor agrees on), capped at ``train_limit`` via
    ``TakeOrderedAndProject`` — so at most train_limit·d floats ever reach
    the driver no matter the corpus size. A few thousand vectors is ample
    for a coarse quantizer; ``train_limit=None`` (full-corpus training) is
    an explicit test-scale opt-in, never the default."""
    train_df = embeddings.select(F.col(id_col), F.col(vec_col))
    if train_limit is not None:
        train_df = (
            train_df.orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(train_limit)
        )
    train = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in train_df.collect()]
    )
    return kmeans_centroids(train, n_cells, seed)


def ivf_probe_cells(
    centroids: np.ndarray, query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cell ids nearest the query — k×d driver math.

    Distances use the translation-free form ‖c‖² − 2·q·c (NOT the expanded
    Σ(c−q)²): the portable-IVF oracles compute exactly this form in SQL,
    and the two expansions round differently — a near-tie at the nprobe
    boundary could otherwise order differently per engine and flip the
    probe set. Stable argsort breaks exact ties by cell id, matching the
    oracles' ORDER BY (d, sid)."""
    q = np.asarray(query_vec, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2 = (C * C).sum(axis=1) - 2.0 * (C @ q)
    return [int(c) for c in d2.argsort(kind="stable")[:nprobe]]


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

    Quantizer training is bounded (see ``train_quantizer``); the cell
    column is computed inline here so the operator is self-contained —
    ``ann_ivf_topk_indexed`` is the production shape over a cell column
    materialized at ingest (indexing.build_index)."""
    centroids = train_quantizer(
        embeddings, n_cells, seed, id_col, vec_col, train_limit
    )
    probe_cells = ivf_probe_cells(centroids, query_vec, nprobe)
    candidates = embeddings.withColumn(
        "_cell", ivf_cell_col(F.col(vec_col), centroids)
    ).filter(F.col("_cell").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_ivf_topk_indexed(
    emb_indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVF ANN over a MATERIALIZED cell column (indexing.build_index): the
    query-time plan is ``filter(cell IN probes)`` + exact rerank — pure JVM
    expressions over stored columns, no Python, no training job, and the
    isin filter pushes down to the parquet scan. This is the 100 TB shape:
    assignment cost was paid once at ingest."""
    probes = ivf_probe_cells(centroids, query_vec, nprobe)
    candidates = emb_indexed.filter(F.col(cell_col).isin(probes))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_ivf_topk_multi(
    emb_indexed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Batched IVF ANN through the index: a query workload in ONE corpus
    scan. Each query's probe set (its ``nprobe`` nearest cells) is computed
    INSIDE the plan on the broadcast query side — distance to every
    centroid as literal-vector expressions, ``array_sort`` over
    (distance, cell) structs, slice nprobe — so no per-query driver
    round-trip. The join condition is ``array_contains(probes, cell)``
    against the STORED cell column, evaluated in a broadcast nested-loop;
    candidates get exact-cosine scores and a per-query ranking window
    takes the top k. The IVF sibling of ``ann_lsh_topk_multi``."""
    from pyspark.sql.window import Window

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    qv = F.col("_qv")
    # argmin ‖x−c‖² over cells = argmin ‖c‖² − 2·x·c (‖x‖² constant/query)
    dist_structs = [
        F.struct(
            (F.lit(float(c_sq[j])) - 2.0 * dot(qv, lit_vector([float(x) for x in C[j]])))
            .alias("d"),
            F.lit(j).alias("i"),
        )
        for j in range(len(C))
    ]
    probes = F.transform(
        F.slice(F.array_sort(F.array(*dist_structs)), 1, nprobe), lambda s: s["i"]
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("q_id"), F.col(query_vec_col).alias("_qv")
        ).withColumn("_probes", probes)
    )
    scored = (
        emb_indexed.join(q, F.array_contains(F.col("_probes"), F.col(cell_col)))
        .select("q_id", id_col, cosine(F.col(vec_col), qv).alias("_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", id_col, F.round("_cos", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# Portable IVF: a seed-sampled coarse quantizer both engines can compute.
#
# The k-means quantizer above is the production path, but its centroids are
# driver-side NumPy state no static SQL oracle can see — which is why the
# ann_ivf_* entries register rows-only. This family swaps Lloyd iterations
# for the zero-iteration special case: centroids ARE the first `n_seeds`
# vectors in md5(id) order (a deterministic pseudo-random sample every
# engine agrees on — the same portable-hash move as the minhash/simhash
# twins). Cell assignment and probe selection are then pure argmin-distance
# expressions, fully reproducible in DuckDB, so this variant carries a REAL
# value-hash oracle. Recall is one Lloyd step behind k-means; the plan shape
# (cell filter → exact rerank) is identical.
# ---------------------------------------------------------------------------

def portable_seed_centroids(
    embeddings: DataFrame,
    n_seeds: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """The `n_seeds` vectors first in md5(id)-hex order (ties by id) — a
    bounded deterministic sample: at most n_seeds·d floats reach the driver
    via TakeOrderedAndProject, never the corpus."""
    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(
            F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
        )
        .limit(n_seeds)
        .collect()
    )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def portable_cell_col(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-seed cell id as a PURE JVM expression (no Python): per-seed
    (distance, index) structs, array_sort (lexicographic: distance, then
    index — the deterministic tiebreak), take slot 0. Distance uses the
    translation-free form ‖c‖² − 2·x·c so the oracle can mirror it
    term-for-term with list_dot_product."""
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    structs = [
        F.struct(
            (F.lit(float(c_sq[j])) - 2.0 * dot(vec_col, lit_vector([float(x) for x in C[j]])))
            .alias("d"),
            F.lit(j).alias("i"),
        )
        for j in range(len(C))
    ]
    return F.slice(F.array_sort(F.array(*structs)), 1, 1)[0]["i"]


def ann_ivf_portable_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_seeds: int = 16,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with the portable seed quantizer: assign every vector to its
    nearest seed cell (JVM argmin expressions), probe the `nprobe` cells
    nearest the query, exact-cosine rerank. Same scale shape as
    ann_ivf_topk (probed fraction ≈ nprobe/n_seeds, cell column
    materializable at ingest) but every step is SQL-expressible, so the
    registered query carries a full DuckDB oracle."""
    centroids = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    probes = ivf_probe_cells(centroids, query_vec, nprobe)
    candidates = embeddings.withColumn(
        "_cell", portable_cell_col(F.col(vec_col), centroids)
    ).filter(F.col("_cell").isin(probes))
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pq_code_col(vec_col: Column, codebook: np.ndarray, sub: int, dsub: int) -> Column:
    """Per-subspace PQ code: argmin over the codebook of the translation-
    free distance ‖c‖² − 2·x_s·c on the vector's slice [sub·dsub,
    (sub+1)·dsub) — same struct-array_sort argmin (d, then index) as
    portable_cell_col, so the oracle mirrors it term-for-term."""
    sl = F.slice(vec_col, sub * dsub + 1, dsub)
    c_sq = (codebook * codebook).sum(axis=1)
    structs = [
        F.struct(
            (F.lit(float(c_sq[j]))
             - 2.0 * dot(sl, lit_vector([float(x) for x in codebook[j]])))
            .alias("d"),
            F.lit(j).alias("i"),
        )
        for j in range(len(codebook))
    ]
    return F.slice(F.array_sort(F.array(*structs)), 1, 1)[0]["i"]


def pq_codes_batched(vec_col: Column, codebooks: np.ndarray) -> Column:
    """All m PQ codes in ONE Arrow-batched pandas UDF: per batch, one
    (n × dsub)·(dsub × k) GEMM + argmin per subspace — the production
    encoder (the expression form evaluates m·k interpreted array-aggregates
    per row; this is one vectorized NumPy pass). Same translation-free
    distance form and argmin tiebreak as pq_code_col; f64 GEMM vs the
    left-fold sum can differ only within ~1e-15, far below any real
    codeword gap, so codes agree (equivalence-pinned in pytest and by
    sharing the portable oracle)."""
    from pyspark.sql.types import ArrayType, IntegerType

    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = B.shape
    c_sq = (B * B).sum(axis=2)  # (m, k)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            X = M[:, s * dsub:(s + 1) * dsub]
            d2 = c_sq[s][None, :] - 2.0 * (X @ B[s].T)
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return _enc(vec_col)


def ann_pq_arrow_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    n_seeds: int = 16,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ann_pq_portable_topk's production encoder: codes from the Arrow-
    batched GEMM UDF instead of per-codeword expressions, ADC + rerank
    unchanged. Identical results (shares the portable oracle)."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} would "
            f"silently drop the trailing {dim % m} dimensions from "
            "encoding and ADC ranking"
        )
    dsub = dim // m
    seeds = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    books = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    q = np.asarray(query_vec, dtype=np.float64)
    codes = pq_codes_batched(F.col(vec_col), books)
    enc = embeddings.select(F.col(id_col), F.col(vec_col), codes.alias("_codes"))
    dist = None
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        qdtab = (books[s] * books[s]).sum(axis=1) - 2.0 * (books[s] @ qs)
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in qdtab]),
            F.element_at(F.col("_codes"), s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    cand = (
        enc.select(F.col(id_col), F.col(vec_col), dist.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_pq_portable_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    n_seeds: int = 16,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, TPAMI — the third
    classic ANN index family next to LSH and IVF): split vectors into
    ``m`` subspaces, encode each slice as its nearest codeword id, rank by
    asymmetric distance (per-subspace lookup of the query-to-codeword
    distance, summed), exact-cosine rerank of the top ``rerank``.

    Portable flavor: the codebook of subspace s is the s-slice of the SAME
    md5-ordered seed sample the portable IVF uses — deterministic and
    SQL-reproducible, so the whole pipeline (encoding, ADC ranking,
    rerank) carries a full DuckDB oracle. The ADC score drops the
    constant Σ‖q_s‖² term: score = Σ_s (‖c‖² − 2·q_s·c) at the doc's
    codewords, evaluated as a left-fold sum in subspace order on both
    engines.

    At scale: codes are m small ints per vector, materialized at ingest
    (the 64-dim float vector becomes m bytes of index data — PQ's whole
    point); query time is m table lookups per row riding the scan, no
    vector arithmetic until the rerank of ``rerank`` candidates."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} would "
            f"silently drop the trailing {dim % m} dimensions from "
            "encoding and ADC ranking"
        )
    dsub = dim // m
    seeds = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    dist = None
    for s in range(m):
        book = seeds[:, s * dsub:(s + 1) * dsub]
        code = pq_code_col(F.col(vec_col), book, s, dsub)
        qs = q[s * dsub:(s + 1) * dsub]
        qdtab = (book * book).sum(axis=1) - 2.0 * (book @ qs)
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in qdtab]), code + 1
        )
        dist = term if dist is None else dist + term
    cand = (
        embeddings.select(F.col(id_col), F.col(vec_col), dist.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_ivf_portable_multi(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_seeds: int = 16,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Batched ANN through the portable seed quantizer: the corpus gets its
    cell column (JVM argmin over seed literals), each broadcast query gets
    its probe set in-plan, one corpus scan serves the whole batch — the
    ann_ivf_topk_multi machinery with every step SQL-reproducible, so the
    batched IVF shape finally carries a full oracle too."""
    C = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    emb_cells = embeddings.withColumn(
        "_pcell", portable_cell_col(F.col(vec_col), C)
    )
    return ann_ivf_topk_multi(
        emb_cells,
        C,
        queries,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        cell_col="_pcell",
    )


def ann_pq_topk_indexed(
    embeddings: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """PQ ANN over the WRITTEN index: ranks stored m-byte codes with ADC
    lookup tables built driver-side from the sidecar codebooks — zero
    encoding work in the query plan (the Arrow-GEMM encoder ran once at
    ingest, indexing.enrich_embeddings). The corpus scan reads id + codes
    (+ vector only for the ``rerank`` survivors): per-query cost is m
    array lookups per row, the PQ deployment shape at any scale."""
    m, _, dsub = np.asarray(books).shape
    q = np.asarray(query_vec, dtype=np.float64)
    if len(q) != m * dsub:
        raise ValueError(
            f"query dim {len(q)} != m*dsub = {m}*{dsub} of the stored codebooks"
        )
    dist = None
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        qdtab = (books[s] * books[s]).sum(axis=1) - 2.0 * (books[s] @ qs)
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in qdtab]),
            F.element_at(F.col(codes_col), s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    cand = (
        embeddings.select(F.col(id_col), F.col(vec_col), dist.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    n_seeds: int = 16,
    nprobe: int = 6,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the composition production ANN systems actually deploy
    (FAISS's IVFPQ index; Jégou et al. 2011 §V): coarse cells prune the
    corpus to ≈ nprobe/n_seeds of its rows, PQ asymmetric distance ranks
    ONLY the survivors from their m-byte codes, and the exact-cosine
    rerank touches just ``rerank`` full vectors.

    Both pruning structures are ingest-materializable columns (cell id +
    code array — exactly what indexing.build_index stores for IVF), so at
    100 TB a query reads nprobe/n_seeds of the rows × m bytes each, plus
    ``rerank`` full vectors: the only entry point where BOTH the row count
    AND the bytes-per-row shrink. Same portable seed quantizer for cells
    and codebooks (cells from whole seed vectors, codebook s = the s-th
    subspace slice of the same seeds), so the full pipeline carries a
    DuckDB oracle like its two parents."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} would "
            f"silently drop the trailing {dim % m} dimensions from "
            "encoding and ADC ranking"
        )
    dsub = dim // m
    seeds = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    probes = ivf_probe_cells(seeds, query_vec, nprobe)
    books = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    q = np.asarray(query_vec, dtype=np.float64)
    survivors = embeddings.withColumn(
        "_cell", portable_cell_col(F.col(vec_col), seeds)
    ).filter(F.col("_cell").isin(probes))
    enc = survivors.select(
        F.col(id_col), F.col(vec_col),
        pq_codes_batched(F.col(vec_col), books).alias("_codes"),
    )
    dist = None
    for s in range(m):
        qs = q[s * dsub:(s + 1) * dsub]
        qdtab = (books[s] * books[s]).sum(axis=1) - 2.0 * (books[s] @ qs)
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in qdtab]),
            F.element_at(F.col("_codes"), s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    cand = (
        enc.select(F.col(id_col), F.col(vec_col), dist.alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def derived_n_seeds(n_rows: int, target_cell: int = 1024, floor: int = 16) -> int:
    """Quantizer cell count ∝ corpus size: ``max(floor, n // target_cell)``
    keeps the expected cell population ≈ target_cell as data grows, so the
    within-cell pairing cost Σn_c² ≈ n·target_cell stays LINEAR in n instead
    of quadratic at a fixed cell count (the r5 'weak default')."""
    return max(floor, n_rows // target_cell)


def semdedup_survivors(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_seeds: int | None = None,
    max_cell_size: int | None = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    partition the corpus into quantizer cells, compare pairs only WITHIN a
    cell, and drop every vector that has a smaller-id neighbor with cosine
    ≥ threshold in its cell (min-id representative survives). Cross-cell
    duplicates are missed by design — that is the approximation that makes
    semantic dedup tractable: within-cell pairing costs Σ(n_c²) ≈ n²/k for
    balanced cells. One equi-shuffle on the cell id; the portable seed
    quantizer keeps every step (sampling, assignment, pairing, anti-join)
    oracle-reproducible.

    Two scale guards (both enforced, not advisory):

    * ``n_seeds=None`` (the default) derives the cell count from the corpus:
      ``max(16, n // target_cell)``, so Σn_c² ≈ n·target_cell grows linearly
      with the corpus instead of quadratically at a fixed k. One bounded
      driver-side ``count()`` — the same justified-scalar pattern as
      corpus_clean's max_df cap. The oracle-backed registry query mirrors
      the derivation with a scalar-subquery LIMIT, so the SQL stays
      mechanical without pinning the quantizer.
    * ``max_cell_size`` caps the members any one cell contributes to
      pairing (rank by id within cell — deterministic and
      oracle-expressible). A pathological cell — every vector identical,
      a degenerate quantizer — now costs at most cap² pairs instead of
      n_c². Vectors beyond the cap are kept as survivors (bounded
      under-dedup on the tail of a skewed cell, never unbounded work);
      ``None`` disables the cap."""
    from pyspark.sql.window import Window

    from tweets_elastic_spark.functions.vectors import norm

    if n_seeds is None:
        n_seeds = derived_n_seeds(embeddings.count(), target_cell)
    centroids = portable_seed_centroids(embeddings, n_seeds, id_col, vec_col)
    # Cell assignment: the pure-JVM per-seed expression is oracle-exact
    # (term-for-term mirrorable in SQL) but its size grows with n_seeds —
    # at a corpus-derived seed count the expression tree (k structs × d-dim
    # dot products) outgrows what codegen evaluates efficiently. Above 32
    # seeds switch to the Arrow-GEMM assignment (one (batch×d)·(d×k) matmul
    # per Arrow batch, same ‖c‖²−2x·c distance and first-min-index
    # tiebreak); f64 GEMM vs the expression's left-fold sum differ only
    # ~1e-15, far below any real centroid gap (the same argument — and
    # pytest pinning — as pq_codes_batched vs pq_code_col). Gate/oracle
    # scales stay on the exact expression path: 16 seeds at every test sf.
    if n_seeds > 32:
        assign_col = ivf_cell_col(F.col(vec_col), centroids)
    else:
        assign_col = portable_cell_col(F.col(vec_col), centroids)
    # Precompute each vector's norm ON ITS SIDE of the join: the pair
    # predicate then evaluates ONE array-aggregate (the dot product) per
    # pair instead of three — n norm computations instead of n²/k. The
    # value is bit-identical to cosine(): dot / (sqrt(dot(a,a)) ·
    # sqrt(dot(b,b))), same operand order.
    # Materialize (id, vec, cell, norm) ONCE: both join sides would
    # otherwise re-evaluate the 16-way argmin-distance expression per row.
    # localCheckpoint (eager, lineage-truncating) is the test-scale stand-in
    # for the production move — the cell column written at ingest next to
    # the embeddings (indexing.build_index materializes exactly this for
    # the k-means quantizer). The checkpoint blocks live until the returned
    # DataFrame is garbage-collected (ContextCleaner frees them with the
    # RDD); callers that invoke this repeatedly in one session drop their
    # reference between calls, which is the lifecycle bench and the
    # oracle sweep follow.
    cells = embeddings.select(
        F.col(id_col), F.col(vec_col),
        assign_col.alias("_cell"),
        norm(F.col(vec_col)).alias("_nrm"),
    )
    if max_cell_size is not None:
        # Rank within cell by id and pair only the first `cap` members: the
        # window rides the same cell-key shuffle the join needs, so the cap
        # costs a sort, not an extra exchange.
        w = Window.partitionBy("_cell").orderBy(F.col(id_col))
        cells = (
            cells.withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= max_cell_size)
            .drop("_crk")
        )
    # Checkpoint AFTER the cap so the 16-way argmin projection AND the rank
    # window each execute exactly once — both join sides then read the
    # materialized blocks instead of replaying the lineage per side.
    cells = cells.localCheckpoint()
    a = cells.alias("a")
    b = cells.alias("b")
    pair_cos = dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a._nrm") * F.col("b._nrm")
    )
    dropped = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(pair_cos >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return embeddings.select(id_col).join(dropped, id_col, "left_anti")


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim)


def lsh_tables(
    dim: int, n_bits: int = 6, n_tables: int = 4, seed: int = 7
) -> list[np.ndarray]:
    """The L independent hyperplane sets shared by every LSH ANN entry
    point (inline, indexed, batched) AND the DuckDB oracles — one seed
    schedule so signatures agree everywhere."""
    return [_hyperplanes(dim, n_bits, seed + 101 * t) for t in range(n_tables)]


def query_lsh_signatures(
    query_vec: list[float], n_bits: int = 6, n_tables: int = 4, seed: int = 7
) -> list[int]:
    """Per-table signature of one query vector — driver-side NumPy over the
    same planes the corpus columns use."""
    q = np.asarray(query_vec, dtype=np.float64)
    sigs = []
    for planes in lsh_tables(len(query_vec), n_bits, n_tables, seed):
        sig = 0
        for i, h in enumerate(planes):
            if float(np.dot(q, h)) > 0:
                sig |= 1 << i
        sigs.append(sig)
    return sigs


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
    if probe_bits > 2:
        raise ValueError(
            "ann_lsh_topk enumerates probes only up to 2-bit flips; for "
            "deeper probing use ann_lsh_topk_indexed, whose bit_count "
            "filter supports any probe_bits"
        )
    tables = lsh_tables(len(query_vec), n_bits, n_tables, seed)
    q_sigs = query_lsh_signatures(query_vec, n_bits, n_tables, seed)
    cond = None
    for planes, q_sig in zip(tables, q_sigs):
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
    candidates = embeddings.filter(cond)
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_lsh_topk_indexed(
    emb_indexed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 2,
    sig_cols: tuple[str, ...] = ("sig0", "sig1", "sig2", "sig3"),
) -> DataFrame:
    """LSH ANN over MATERIALIZED signature columns (indexing.build_index):
    no per-row signature computation at query time — the candidate filter
    is ``bit_count(sig_t XOR q_sig_t) <= probe_bits`` over stored longs
    (identical set to the probe union: Hamming ≤ probe_bits), then exact
    rerank. Query-side signatures are k·d driver math. This is the ingest-
    time-analysis story the inline variant's docstring promises."""
    q_sigs = query_lsh_signatures(query_vec, n_bits, len(sig_cols), seed)
    cond = None
    for sc, qs in zip(sig_cols, q_sigs):
        c = F.bit_count(F.col(sc).bitwiseXOR(F.lit(qs))) <= probe_bits
        cond = c if cond is None else (cond | c)
    candidates = emb_indexed.filter(cond)
    return cosine_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_lsh_topk_multi(
    emb_indexed: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    probe_bits: int = 2,
    sig_cols: tuple[str, ...] | None = ("sig0", "sig1", "sig2", "sig3"),
    dim: int | None = None,
    query_sig_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Batched ANN THROUGH the LSH index: a query workload served in one
    corpus scan. The query set (small) gets its per-table signatures and is
    broadcast; the join condition is the same Hamming-≤-probe_bits filter
    as the single-query indexed variant, evaluated per (doc, query) inside
    a broadcast nested-loop join — so the corpus is scanned ONCE for the
    whole batch, candidates are exact-cosine scored, and a per-query
    ranking window takes the top k. Compare ``cosine_topk_multi``: same
    broadcast-batch shape, but the index filter drops the non-candidate
    (doc, query) pairs before any cosine is computed.

    ``sig_cols=None`` computes the corpus signatures inline (self-contained
    test shape); the registered query passes the stored index columns.
    ``query_sig_cols`` names signature columns already present on the
    query set (e.g. queries drawn from the indexed corpus itself) — then
    NO signature is computed anywhere in the plan; without it the query
    side gets the hyperplane expressions inline (a per-batch cost
    proportional to the small query set, not the corpus)."""
    from pyspark.sql.window import Window

    n_tables_eff = len(sig_cols) if sig_cols else 4

    def planes_for_data() -> list[np.ndarray]:
        # dim derived from the data unless given — a wrong default would
        # silently truncate/extend the hyperplanes and corrupt signatures
        d = dim or len(queries.select(query_vec_col).head()[0])
        return lsh_tables(d, n_bits, n_tables_eff, seed)

    corpus = emb_indexed
    if sig_cols is None:
        tables = planes_for_data()
        sig_cols = tuple(f"_sig{t}" for t in range(len(tables)))
        for sc, planes in zip(sig_cols, tables):
            corpus = corpus.withColumn(sc, rh_signature_col(F.col(vec_col), planes))

    if query_sig_cols is not None:
        q = queries.select(
            F.col(query_id_col).alias("q_id"),
            F.col(query_vec_col).alias("_qv"),
            *[
                F.col(qs).alias(f"_qsig{t}")
                for t, qs in enumerate(query_sig_cols)
            ],
        )
    else:
        q = queries.select(
            F.col(query_id_col).alias("q_id"), F.col(query_vec_col).alias("_qv")
        )
        for t, planes in enumerate(planes_for_data()[: len(sig_cols)]):
            q = q.withColumn(f"_qsig{t}", rh_signature_col(F.col("_qv"), planes))
    q = F.broadcast(q)

    cond = None
    for t, sc in enumerate(sig_cols):
        c = F.bit_count(F.col(sc).bitwiseXOR(F.col(f"_qsig{t}"))) <= probe_bits
        cond = c if cond is None else (cond | c)

    # project to scalars before the ranking window (see cosine_topk_multi)
    scored = corpus.join(q, cond).select(
        "q_id", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", id_col, F.round("_cos", 6).alias("score"))
    )
