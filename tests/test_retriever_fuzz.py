"""Generative check for the es_retriever compiler: random bounded-depth
retriever trees (standard / knn leaves; rrf / linear /
text_similarity_reranker compounds) must produce EXACTLY the ranking an
independent pure-Python model computes on the same rows — fusion math,
normalization, window truncation, rounding and id tiebreaks included.
The Python model shares no code with the Spark implementation, so an
error in either side's rank window, minmax edge case or reciprocal-rank
arithmetic surfaces as a mismatch here."""

from __future__ import annotations

import math
import random

import pytest

from tweets_elastic_spark.plans.search import es_retriever

ROWS = [
    # (doc_id, pop, emb, text)
    (1, 10.0, [1.0, 0.0, 0.0], "spark streaming jobs"),
    (2, 35.0, [0.0, 1.0, 0.0], "data lake table merge"),
    (3, 22.0, [0.6, 0.8, 0.0], "spark data pipelines"),
    (4, 50.0, [0.0, 0.0, 1.0], "unrelated words entirely"),
    (5, 41.0, [0.8, 0.0, 0.6], "streaming data compaction"),
    (6, 18.0, [0.5, 0.5, math.sqrt(0.5)], "merge policies"),
    (7, 29.0, [1.0, 1.0, 1.0], "spark merge streaming data"),
    (8, 47.0, [0.2, 0.9, 0.0], "catalog of tables"),
]
QUERY_VEC = [0.6, 0.8, 0.0]
QUERY_TEXT = "spark streaming data"
QTOKS = {"spark", "streaming", "data"}


def _r6(x: float) -> float:
    # Spark F.round is HALF_UP; scores here are non-negative
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_leg(spec: dict, size: int) -> list[tuple[int, float]]:
    """The reference model: (doc_id, rounded score) ranked desc, id asc,
    truncated — mirroring the CONTRACT, not the implementation."""
    (kind, body), = spec.items()
    if kind == "standard":
        gte = body["query"]["function_score"]["query"]["range"]["pop"]["gte"]
        factor = body["query"]["function_score"]["functions"][0][
            "field_value_factor"].get("factor", 1.0)
        scored = [(d, _r6(p * factor)) for d, p, _, _ in ROWS if p >= gte]
    elif kind == "knn":
        qv = body["query_vector"]

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return dot / (na * nb)

        scored = [(d, _r6(cos(e, qv))) for d, _, e, _ in ROWS]
        size = min(int(body["k"]), size)
    elif kind == "rrf":
        window = int(body.get("rank_window_size", size))
        kconst = int(body.get("rank_constant", 60))
        acc: dict[int, float] = {}
        for child in body["retrievers"]:
            for r, (d, _) in enumerate(_py_leg(child, window), start=1):
                acc[d] = acc.get(d, 0.0) + 1.0 / (kconst + r)
        scored = [(d, _r6(s)) for d, s in acc.items()]
    elif kind == "linear":
        window = int(body.get("rank_window_size", size))
        acc = {}
        for child in body["retrievers"]:
            leg = _py_leg(child["retriever"], window)
            w = float(child.get("weight", 1.0))
            if child.get("normalizer") == "minmax":
                lo = min(s for _, s in leg)
                hi = max(s for _, s in leg)
                leg = [(d, 1.0 if hi == lo else (s - lo) / (hi - lo))
                       for d, s in leg]
            for d, s in leg:
                acc[d] = acc.get(d, 0.0) + w * s
        scored = [(d, _r6(s)) for d, s in acc.items()]
    elif kind == "text_similarity_reranker":
        window = int(body.get("rank_window_size", size))
        ids = {d for d, _ in _py_leg(body["retriever"], window)}
        texts = {d: t for d, _, _, t in ROWS}
        scored = []
        for d in ids:
            toks = set(texts[d].lower().split())
            inter = len(toks & QTOKS)
            union = len(toks) + len(QTOKS) - inter
            scored.append((d, _r6(inter / union if union else 0.0)))
    else:  # pragma: no cover
        raise AssertionError(kind)
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored[:size]


def _leaf(rng: random.Random) -> dict:
    if rng.random() < 0.5:
        return {"standard": {"query": {"function_score": {
            "query": {"range": {"pop": {"gte": rng.choice([5, 20, 30])}}},
            "functions": [{"field_value_factor": {
                "field": "pop", "factor": rng.choice([1.0, 0.1])}}],
        }}}}
    return {"knn": {"field": "emb", "query_vector": QUERY_VEC,
                    "k": rng.randint(3, 8)}}


def _tree(rng: random.Random, depth: int) -> dict:
    if depth <= 0 or rng.random() < 0.35:
        return _leaf(rng)
    kind = rng.choice(["rrf", "linear", "text_similarity_reranker"])
    if kind == "rrf":
        return {"rrf": {
            "retrievers": [_tree(rng, depth - 1) for _ in range(2)],
            "rank_window_size": rng.choice([4, 6, 8]),
            "rank_constant": rng.choice([10, 60]),
        }}
    if kind == "linear":
        return {"linear": {
            "retrievers": [
                {"retriever": _tree(rng, depth - 1),
                 "weight": rng.choice([0.3, 1.0, 2.0]),
                 "normalizer": rng.choice(["none", "minmax"])}
                for _ in range(rng.randint(1, 2))
            ],
            "rank_window_size": rng.choice([4, 6, 8]),
        }}
    return {"text_similarity_reranker": {
        "retriever": _tree(rng, depth - 1),
        "field": "text",
        "inference_text": QUERY_TEXT,
        "rank_window_size": rng.choice([4, 6, 8]),
    }}


@pytest.mark.parametrize("seed", range(10))
def test_random_retriever_trees_match_python_model(spark, seed):
    rng = random.Random(seed)
    df = spark.createDataFrame(
        ROWS, "doc_id long, pop double, emb array<double>, text string")
    tree = _tree(rng, 2)
    size = rng.choice([3, 5, 8])
    got = [(r["doc_id"], r["score"])
           for r in es_retriever(df, tree, size=size).collect()]
    want = _py_leg(tree, size)
    assert [d for d, _ in got] == [d for d, _ in want], (tree, got, want)
    for (_, gs), (_, ws) in zip(got, want):
        # fusion sums may associate differently across engines; ranks
        # above are exact, scores agree to addition-reorder tolerance
        assert abs(gs - ws) < 1e-9, (tree, got, want)
