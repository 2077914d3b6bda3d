"""Parent-join queries (has_child / has_parent / parent_id): fold modes,
children-count window, score copying, and the semi-join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.plans.joinfield import has_child, has_parent, parent_id
from tweets_elastic_spark.plans.search import Bool, Range, Term


@pytest.fixture(scope="module")
def rel(spark):
    parents = spark.createDataFrame(
        [(1, "F"), (2, "O"), (3, "F"), (4, "P")], "pk long, status string"
    )
    children = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0),
         (2, 5.0), (2, 50.0),
         (3, 60.0)],
        "fk long, qty double",
    )
    return parents, children


def test_has_child_count_window(rel):
    parents, children = rel
    got = sorted(r["pk"] for r in has_child(
        parents, children, parent_key="pk", child_key="fk",
        query={"range": {"qty": {"gte": 10}}}, min_children=2,
    ).collect())
    assert got == [1]  # parent 1 has 3 matching, 2 has 1, 3 has 1
    got = sorted(r["pk"] for r in has_child(
        parents, children, parent_key="pk", child_key="fk",
        min_children=1, max_children=2,
    ).collect())
    assert got == [2, 3]  # parent 1 exceeds max_children


def test_has_child_score_modes(rel):
    parents, children = rel
    # constant-score child query: sum == matching count, max == 1.0
    out = {r["pk"]: r["score"] for r in has_child(
        parents, children, parent_key="pk", child_key="fk",
        query=Range("qty", gte=10), score_mode="sum",
    ).collect()}
    assert out == {1: 3.0, 2: 1.0, 3: 1.0}
    out = {r["pk"]: r["score"] for r in has_child(
        parents, children, parent_key="pk", child_key="fk",
        query=Range("qty", gte=10), score_mode="avg",
    ).collect()}
    assert out == {1: 1.0, 2: 1.0, 3: 1.0}
    # score_mode=none adds no score column
    cols = has_child(parents, children, parent_key="pk", child_key="fk").columns
    assert "score" not in cols
    with pytest.raises(ValueError, match="score_mode"):
        has_child(parents, children, parent_key="pk", child_key="fk",
                  score_mode="median")


def test_has_parent_semi_and_score(rel):
    parents, children = rel
    q = Term("status", "F")
    got = sorted((r["fk"], r["qty"]) for r in has_parent(
        children, parents, parent_key="pk", child_key="fk", query=q,
    ).collect())
    assert got == [(1, 10.0), (1, 20.0), (1, 30.0), (3, 60.0)]
    # score=True copies the parent score onto every child (constant 1.0
    # for a term query; Bool-with-boost scores propagate the same way)
    scored = has_parent(children, parents, parent_key="pk", child_key="fk",
                        query=q, score=True)
    assert {r["score"] for r in scored.collect()} == {1.0}
    # semi join keeps child schema only
    plan = has_parent(
        children, parents, parent_key="pk", child_key="fk", query=q
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_has_parent_dsl_and_parent_id(rel):
    parents, children = rel
    got = sorted(r["fk"] for r in has_parent(
        children, parents, parent_key="pk", child_key="fk",
        query={"bool": {"filter": [{"term": {"status": "O"}}]}},
    ).collect())
    assert got == [2, 2]
    got = sorted(r["qty"] for r in parent_id(
        children, child_key="fk", parent=2).collect())
    assert got == [5.0, 50.0]


def test_has_child_aggregates_before_join(rel):
    parents, children = rel
    plan = has_child(
        parents, children, parent_key="pk", child_key="fk",
        query=Range("qty", gte=10), score_mode="sum",
    )._jdf.queryExecution().executedPlan().toString()
    # partial aggregation on the child side feeds the join: the child
    # fan-out never crosses it (Range must check qty IS the only child
    # predicate, so the aggregate keys on fk alone)
    assert "HashAggregate" in plan
    assert "Join" in plan or "join" in plan.lower()


def test_parent_agg_counts_each_parent_once(spark):
    """ES parent agg: a parent with many children in the same bucket
    counts ONCE (doc_count counts parents; metrics see the deduped
    parent rows)."""
    from tweets_elastic_spark.plans.joinfield import parent_agg

    parents = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 10.0)], "pid long, price double"
    )
    children = spark.createDataFrame(
        [  # parent 1 has THREE 'x' children; parent 2 one 'x', one 'y'
            (10, 1, "x"), (11, 1, "x"), (12, 1, "x"),
            (20, 2, "x"), (21, 2, "y"), (30, 3, "y"), (31, 4, "x"),
        ],
        "cid long, pfk long, tag string",
    )
    got = {
        r["tag"]: (r["doc_count"], r["total"])
        for r in parent_agg(
            parents, children, parent_key="pid", child_key="pfk",
            group_by="tag",
            aggs={"total": {"sum": {"field": "price"}}},
        ).collect()
    }
    # x: parents {1, 2} (child 31's parent 4 doesn't exist -> inner join
    # drops it); y: parents {2, 3}
    assert got == {"x": (2, 150.0), "y": (2, 60.0)}
