"""Dedup + similarity operators: exact variants vs hand-built expectations,
approximate variants (MinHash-LSH, SimHash, ANN) vs their exact baselines
(recall/precision pinned on the deterministic corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.operators import dedup as D
from tweets_elastic_spark.operators import similarity as S
from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"  # 500 docs with planted near-dup pairs


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def true_pairs(spark, docs):
    """Exact jaccard≥0.5 pairs — ground truth for the approximate variants."""
    rows = D.jaccard_pairs(docs, k=3, threshold=0.5).collect()
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}


def test_exact_dedup_on_synthetic_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),      # same after normalization
            (3, "different text"),
            (4, "Hello World "),     # same after normalization
        ],
        "doc_id long, text string",
    )
    groups = D.exact_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3 and groups[0]["keeper_id"] == 1
    survivors = {r["doc_id"] for r in D.dedup_exact(df).collect()}
    assert survivors == {1, 3}


def test_jaccard_pairs_finds_planted_near_dups(true_pairs):
    # the corpus plants ~25 pairs with jaccard ≥ 0.9 (calibrated offline)
    high = {p for p, j in true_pairs.items() if j >= 0.9}
    assert len(high) >= 20
    assert all(j >= 0.5 for j in true_pairs.values())


def test_jaccard_identical_docs_is_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    rows = D.jaccard_pairs(df, k=3, threshold=0.1).collect()
    assert {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows} == {(1, 2): 1.0}


def test_jaccard_max_df_prunes_hot_shingles(spark):
    # a shingle present in every doc is dropped by the skew guard
    df = spark.createDataFrame(
        [(i, f"common shingle here unique{i} tail{i} words{i}") for i in range(10)],
        "doc_id long, text string",
    )
    without_guard = D.jaccard_pairs(df, k=3, threshold=0.01).count()
    with_guard = D.jaccard_pairs(df, k=3, threshold=0.01, max_df=5).count()
    assert without_guard > 0 and with_guard == 0


def test_minhash_lsh_recall_and_estimates(spark, docs, true_pairs):
    cands = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_candidates(docs).collect()
    }
    high = {p: j for p, j in true_pairs.items() if j >= 0.8}
    missed = set(high) - set(cands)
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    # signature agreement estimates true jaccard within ±0.25 on 64 hashes
    for p, j in high.items():
        assert abs(cands[p] - j) <= 0.25, (p, cands[p], j)


def test_simhash_near_pairs_cover_extreme_dups(spark, docs, true_pairs):
    got = {
        (r["id_a"], r["id_b"]) for r in D.simhash_near_pairs(docs, max_distance=3).collect()
    }
    # near-identical token multisets → near-identical simhash. The banding
    # guarantee is distance ≤ 3; measured on this corpus, every pair with
    # jaccard ≥ 0.985 sits at Hamming ≤ 3 (0.976 pairs reach distance 4).
    extreme = {p for p, j in true_pairs.items() if j >= 0.985}
    assert extreme, "corpus should contain extreme near-dups"
    covered = len(got & extreme) / len(extreme)
    assert covered >= 0.85, f"simhash covered only {covered:.0%} of extreme pairs"


def test_simhash_identical_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "the same exact words"), (2, "the same exact words")],
        "doc_id long, text string",
    )
    rows = D.simhash_near_pairs(df, max_distance=0).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in rows] == [(1, 2, 0)]


def test_embedding_near_pairs_symmetric_threshold(spark):
    emb = load_table(spark, SF, "embeddings")
    pairs = D.embedding_near_pairs(emb, threshold=0.45).collect()
    assert all(r["id_a"] < r["id_b"] and r["cos"] >= 0.45 for r in pairs)
    assert len(pairs) > 0


@pytest.mark.parametrize("qid", [7, 42, 400])
def test_ann_lsh_recall_vs_bruteforce(spark, qid):
    # multi-table LSH (4 tables × 6 bits, 2-bit multiprobe): min measured
    # recall 0.9 on this corpus of UNIFORM random embeddings — the hardest
    # regime for LSH; the bar leaves one-result slack for seed drift
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in S.ann_lsh_topk(emb, qvec, k=10).collect()]
    assert exact[0] == qid and approx[0] == qid  # self is the nearest neighbor
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, f"ANN recall@10 = {recall} for query {qid}"


def test_cosine_topk_scores_sorted_and_bounded(spark):
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    rows = S.cosine_topk(emb, qvec, k=10).collect()
    scores = [r["score"] for r in rows]
    assert rows[0]["vec_id"] == 0 and abs(scores[0] - 1.0) < 1e-6
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


@pytest.mark.parametrize("qid", [7, 123, 250])
def test_ann_ivf_recall_vs_bruteforce(spark, qid):
    """IVF (16 cells, 6 probes): self always found; recall@10 >= 0.4 on the
    UNIFORM fixture embeddings — the no-cluster-structure worst case for a
    coarse quantizer (measured 0.5-0.9 here; multi-table LSH reaches 0.9 on
    the same data at a similar probed fraction). On clustered real-world
    embeddings IVF's per-recall probe cost drops sharply."""
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in S.ann_ivf_topk(emb, qvec, k=10, n_cells=16, nprobe=6).collect()]
    assert approx[0] == qid
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"IVF recall@10 = {recall} for query {qid}"


def test_ann_ivf_recall_on_clustered_corpus(spark):
    """IVF on its home turf: a deterministic mixture of Gaussians (the
    structure real embedding corpora have — tight clusters around topic
    directions). The uniform-fixture tests above pin the worst case at
    0.4; here the quantizer's cells align with the true clusters and
    nprobe/n_cells = 1/4 of the data yields recall ≥ 0.8 (measured 1.0)."""
    import numpy as np

    rng = np.random.RandomState(42)
    n_clusters, per_cluster, dim = 8, 250, 64
    centers = rng.randn(n_clusters, dim) * 5.0
    rows = []
    for c in range(n_clusters):
        pts = centers[c][None, :] + rng.randn(per_cluster, dim)
        rows += [
            (c * per_cluster + i, [float(x) for x in p])
            for i, p in enumerate(pts)
        ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for qid in (0, 500, 1500):  # one query point in each of three clusters
        qvec = rows[qid][1]
        exact = [r["vec_id"] for r in S.cosine_topk(df, qvec, k=10).collect()]
        approx = [
            r["vec_id"]
            for r in S.ann_ivf_topk(
                df, qvec, k=10, n_cells=16, nprobe=4, train_limit=1024
            ).collect()
        ]
        assert approx[0] == qid
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.8, f"clustered IVF recall@10 = {recall} for {qid}"


def test_ivf_train_limit_bounds_driver_rows(spark):
    """The training collect is capped: the plan is TakeOrderedAndProject
    (per-partition top-n + driver merge), never a full-corpus collect."""
    emb = load_table(spark, SF, "embeddings")
    train_df = (
        emb.select(F.col("vec_id"), F.col("embedding"))
        .orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(64)
    )
    plan = train_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert train_df.count() == 64


def test_ivf_cell_assignment_partitions_corpus(spark):
    """Every vector lands in exactly one of the k cells and cells are
    reasonably balanced on isotropic data."""
    import numpy as np
    from tweets_elastic_spark.operators.similarity import ivf_cell_col, kmeans_centroids

    emb = load_table(spark, SF, "embeddings")
    train = np.stack([
        np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()
    ])
    C = kmeans_centroids(train, 16, seed=7)
    cells = emb.select(ivf_cell_col(F.col("embedding"), C).alias("c"))
    counts = {r["c"]: r["n"] for r in cells.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == emb.count()
    assert set(counts) <= set(range(16))
    assert max(counts.values()) < emb.count() * 0.5  # no degenerate mega-cell


# ---------------------------------------------------------------------------
# Portable seed-quantizer family (ann_ivf_portable_topk / semdedup_survivors)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qid", [7, 123, 250])
def test_ann_ivf_portable_recall_vs_bruteforce(spark, qid):
    """The zero-iteration seed quantizer is one Lloyd step behind k-means;
    on the uniform fixture it still clears the same worst-case bar."""
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in S.ann_ivf_portable_topk(emb, qvec, k=10, n_seeds=16, nprobe=6).collect()
    ]
    assert approx[0] == qid
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"portable IVF recall@10 = {recall} for query {qid}"


def test_portable_cell_matches_numpy_argmin(spark):
    """The JVM argmin-distance expression (struct array_sort) agrees with
    NumPy's argmin over the same centroids for every fixture vector —
    including the (d, index) tiebreak order."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    C = S.portable_seed_centroids(emb, n_seeds=16)
    got = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", S.portable_cell_col(F.col("embedding"), C).alias("c")
        ).collect()
    }
    M = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()}
    c_sq = (C * C).sum(axis=1)
    for vid, v in M.items():
        d = c_sq - 2.0 * (C @ v)
        assert got[vid] == int(d.argmin()), vid


def test_portable_seed_centroids_deterministic_and_bounded(spark):
    emb = load_table(spark, SF, "embeddings")
    a = S.portable_seed_centroids(emb, n_seeds=8)
    b = S.portable_seed_centroids(emb, n_seeds=8)
    assert a.shape == (8, len(a[0])) and (a == b).all()


def test_semdedup_drops_planted_in_cell_duplicates(spark):
    """Construct a corpus where vec 100 and 101 are near-identical (same
    cell by construction — identical directions) and everything else is
    far: SemDeDup must drop exactly the higher id of the planted pair."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    dup = base[20] + rng.randn(16) * 1e-3  # cosine ≈ 1 with row 20
    rows.append((100, [float(x) for x in base[20]]))
    rows.append((101, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    survivors = {
        r["vec_id"]
        for r in S.semdedup_survivors(df, threshold=0.95, n_seeds=4).collect()
    }
    # 20, 100, 101 are mutually near-identical: only the min id (20) survives
    assert 20 in survivors
    assert 100 not in survivors and 101 not in survivors
    assert survivors | {100, 101} == {r[0] for r in rows}


def test_semdedup_plan_has_no_cartesian(spark):
    """Pairing is an equi-join on the cell id — never a cartesian product."""
    emb = load_table(spark, SF, "embeddings")
    df = S.semdedup_survivors(emb, threshold=0.4, n_seeds=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_semdedup_derived_n_seeds_scales_with_corpus():
    """n_seeds=None derives the cell count from the corpus: n/1024 with a
    floor of 16, so Σn_c² stays ≈ n·1024 (linear) instead of n²/16 — the r5
    'weak default' fixed at the API level."""
    assert S.derived_n_seeds(1_000) == 16
    assert S.derived_n_seeds(16_384) == 16
    assert S.derived_n_seeds(1_048_576) == 1024
    assert S.derived_n_seeds(104_857_600) == 102_400  # 100M vectors → 100k cells


def test_semdedup_gemm_assignment_matches_expression(spark):
    """Above 32 seeds semdedup switches cell assignment to the Arrow-GEMM
    path (r8) — the only point where the scale path could diverge from the
    oracle-exact expression. Pin: ivf_cell_col == portable_cell_col at the
    same 40-seed quantizer on a random corpus (everything downstream of
    the assignment is shared code, so equal cells ⇒ equal survivors),
    plus an end-to-end run through the GEMM branch."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = S.portable_seed_centroids(df, n_seeds=40)
    got = df.select(
        "vec_id",
        S.ivf_cell_col(F.col("embedding"), C).alias("g"),
        S.portable_cell_col(F.col("embedding"), C).alias("e"),
    ).collect()
    assert all(r["g"] == r["e"] for r in got)
    # end-to-end through the GEMM branch: deterministic, runs green
    s1 = {r["vec_id"]
          for r in S.semdedup_survivors(df, threshold=0.9, n_seeds=40).collect()}
    s2 = {r["vec_id"]
          for r in S.semdedup_survivors(df, threshold=0.9, n_seeds=40).collect()}
    assert s1 == s2 and s1  # non-empty, reproducible


def test_semdedup_cell_cap_bounds_degenerate_cell(spark):
    """Worst-case quantizer input — EVERY vector identical, so one cell
    holds the whole corpus. With max_cell_size=8 only the 8 smallest ids
    enter pairing (≤ 28 pairs, not 50·49/2): ids 1..7 are dropped as dups
    of id 0, and ids 8..49 — beyond the cap — are all kept (bounded
    under-dedup, never unbounded work). Uncapped, only id 0 survives."""
    vec = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(i, vec) for i in range(50)], "vec_id long, embedding array<double>"
    )
    capped = {
        r["vec_id"]
        for r in S.semdedup_survivors(
            df, threshold=0.95, n_seeds=4, max_cell_size=8
        ).collect()
    }
    assert capped == {0} | set(range(8, 50))
    uncapped = {
        r["vec_id"]
        for r in S.semdedup_survivors(
            df, threshold=0.95, n_seeds=4, max_cell_size=None
        ).collect()
    }
    assert uncapped == {0}


def test_ann_ivf_portable_multi_matches_single(spark):
    """Each query's batched result == the single-query portable variant."""
    emb = load_table(spark, SF, "embeddings")
    multi = S.ann_ivf_portable_multi(
        emb, emb.filter(F.col("vec_id") < 3), k=5, n_seeds=16, nprobe=6
    ).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    for qid in (0, 1, 2):
        qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
        single = [
            r["vec_id"]
            for r in S.ann_ivf_portable_topk(
                emb, qvec, k=5, n_seeds=16, nprobe=6
            ).collect()
        ]
        assert by_q[qid] == single, qid


@pytest.mark.parametrize("qid", [7, 123, 250])
def test_ann_pq_portable_recall_vs_bruteforce(spark, qid):
    """PQ (8 subspaces × 16 codewords, ADC + rerank-50) on the uniform
    worst-case corpus: measured recall@10 = 0.5-0.7; bar at 0.4 matches
    the IVF uniform-fixture bar. Self is always the nearest neighbor."""
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in S.ann_pq_portable_topk(emb, qvec, k=10).collect()]
    assert approx[0] == qid
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"PQ recall@10 = {recall} for query {qid}"


def test_pq_arrow_encoder_matches_expression_encoder(spark):
    """The Arrow-batched GEMM encoder and the expression encoder assign the
    same code in every subspace for every fixture vector (their f64
    rounding differs only ~1e-15, far below real codeword gaps)."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    seeds = S.portable_seed_centroids(emb, n_seeds=16)
    m, dsub = 8, 8
    books = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    arrow = {
        r["vec_id"]: list(r["c"])
        for r in emb.select(
            "vec_id", S.pq_codes_batched(F.col("embedding"), books).alias("c")
        ).collect()
    }
    expr_cols = [
        S.pq_code_col(F.col("embedding"), books[s], s, dsub).alias(f"c{s}")
        for s in range(m)
    ]
    exprs = {
        r["vec_id"]: [r[f"c{s}"] for s in range(m)]
        for r in emb.select("vec_id", *expr_cols).collect()
    }
    assert arrow == exprs


@pytest.mark.parametrize("fn", [S.ann_pq_portable_topk, S.ann_pq_arrow_topk])
def test_pq_rejects_indivisible_dim(spark, fn):
    """dim % m != 0 must raise, not silently drop trailing dimensions from
    encoding and ADC ranking (latent on the 64-dim/m=8 fixtures)."""
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="divisible"):
        fn(emb, [1.0] * 63, k=5, m=8)


@pytest.mark.parametrize("qid", [7, 123, 250])
def test_ann_ivfpq_recall_and_pruning(spark, qid):
    """IVF-PQ composes both approximations on the uniform worst-case corpus
    (measured recall@10 = 0.5-0.7 at these qids; bar 0.4 = the family's
    uniform-fixture bar). Self is always found, and every result must come
    from a probed cell — the IVF pruning is real, not decorative."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(f"vec_id = {qid}").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in S.ann_ivfpq_topk(emb, qvec, k=10).collect()]
    assert approx[0] == qid
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"IVFPQ recall@10 = {recall} for query {qid}"

    seeds = S.portable_seed_centroids(emb, 16)
    probes = set(S.ivf_probe_cells(seeds, qvec, 6))
    from pyspark.sql import functions as F
    cells = {
        r["c"]
        for r in emb.filter(F.col("vec_id").isin(approx))
        .select(S.portable_cell_col(F.col("embedding"), seeds).alias("c"))
        .collect()
    }
    assert cells <= probes


# --------------------------------------------------- incremental dedup


def test_fingerprint_store_roundtrip_and_append(spark, tmp_path):
    from tweets_elastic_spark.operators.dedup import (
        dedup_increment_exact, write_fingerprints,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha  text"), (2, "beta text")], "doc_id long, text string")
    path = str(tmp_path / "fps")
    write_fingerprints(corpus, path)
    inc = spark.createDataFrame(
        [
            (10, "ALPHA TEXT"),      # whitespace/case dup of corpus 1
            (11, "gamma text"),      # fresh
            (12, "gamma  text"),     # within-increment dup of 11
            (13, "delta text"),      # fresh
        ],
        "doc_id long, text string")
    fps = spark.read.parquet(path)
    got = sorted(r["doc_id"]
                 for r in dedup_increment_exact(inc, fps).collect())
    assert got == [11, 13]
    # accept the batch: append its fingerprints; a replay now drops all
    write_fingerprints(inc, path, mode="append")
    fps2 = spark.read.parquet(path)
    assert dedup_increment_exact(inc, fps2).count() == 0


def test_dedup_increment_near_drops_corpus_neighbors(spark):
    from tweets_elastic_spark.operators.dedup import dedup_increment_near

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark "
                        "streaming joins and watermarks at scale")],
        "doc_id long, text string")
    inc = spark.createDataFrame(
        [
            (10, base.replace("tonight", "today")),   # near-dup of 1
            (11, "entirely novel increment document about parquet row "
                 "group statistics pruning and layouts"),
        ],
        "doc_id long, text string")
    got = sorted(r["doc_id"] for r in
                 dedup_increment_near(inc, corpus,
                                      est_threshold=0.35).collect())
    assert got == [11]
