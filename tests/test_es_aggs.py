"""ES aggregations-DSL front-end (plans/aggs.py): bucket/metric semantics,
terms-size truncation, the envelope path, and refusal of ambiguous shapes."""

from __future__ import annotations

import pytest

from tweets_elastic_spark.plans.aggs import es_aggregate, es_request


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        # (id, region, product, amount)
        (1, "eu", "a", 10.0), (2, "eu", "a", 20.0), (3, "eu", "b", 5.0),
        (4, "us", "a", 7.0), (5, "us", "b", 9.0), (6, "us", "b", 11.0),
        (7, "us", "b", 13.0), (8, "ap", "a", 1.0),
    ]
    return spark.createDataFrame(rows, "id long, region string, product string, amount double")


def test_terms_with_metrics(spark, sales):
    got = {
        r["by_region"]: (r["doc_count"], r["total"], r["biggest"])
        for r in es_aggregate(sales, {
            "by_region": {
                "terms": {"field": "region"},
                "aggs": {
                    "total": {"sum": {"field": "amount"}},
                    "biggest": {"max": {"field": "amount"}},
                },
            }
        }).collect()
    }
    assert got == {"eu": (3, 35.0, 20.0), "us": (4, 40.0, 13.0), "ap": (1, 1.0, 1.0)}


def test_terms_size_truncates_by_count_then_key(spark, sales):
    got = [
        r["by_region"]
        for r in es_aggregate(sales, {
            "by_region": {"terms": {"field": "region", "size": 2}}
        }).orderBy("doc_count", ascending=False).collect()
    ]
    assert got == ["us", "eu"]


def test_nested_bucket_flattened_relation(spark, sales):
    rows = {
        (r["by_region"], r["by_product"]): (r["doc_count"], r["n_ids"])
        for r in es_aggregate(sales, {
            "by_region": {
                "terms": {"field": "region"},
                "aggs": {
                    "by_product": {
                        "terms": {"field": "product"},
                        "aggs": {"n_ids": {"cardinality": {"field": "id"}}},
                    }
                },
            }
        }).collect()
    }
    assert rows[("us", "b")] == (3, 3) and rows[("eu", "a")] == (2, 2)
    assert len(rows) == 5


def test_terms_size_with_nested_bucket_counts_parent_level(spark, sales):
    """size applies to PARENT buckets by their total doc_count (sum over
    leaves), not to leaf rows."""
    rows = {
        (r["by_region"], r["by_product"])
        for r in es_aggregate(sales, {
            "by_region": {
                "terms": {"field": "region", "size": 1},
                "aggs": {"by_product": {"terms": {"field": "product"}}},
            }
        }).collect()
    }
    assert rows == {("us", "a"), ("us", "b")}


def test_histogram_buckets(spark, sales):
    got = {
        r["by_amt"]: r["doc_count"]
        for r in es_aggregate(sales, {
            "by_amt": {"histogram": {"field": "amount", "interval": 10}}
        }).collect()
    }
    # 1,5,7,9 -> bucket 0; 10,11,13 -> 10; 20 -> 20
    assert got == {0.0: 4, 10.0: 3, 20.0: 1}


def test_envelope_query_filters_before_aggregating(spark, sales):
    got = {
        r["by_region"]: r["doc_count"]
        for r in es_request(sales, {
            "query": {"range": {"amount": {"gte": 9}}},
            "aggs": {"by_region": {"terms": {"field": "region"}}},
        }).collect()
    }
    assert got == {"eu": 2, "us": 3}


def test_ambiguous_and_unknown_shapes_raise(spark, sales):
    with pytest.raises(ValueError, match="ambiguous"):
        es_aggregate(sales, {
            "b": {
                "terms": {"field": "region"},
                "aggs": {
                    "m": {"sum": {"field": "amount"}},
                    "nested": {"terms": {"field": "product"}},
                },
            }
        })
    with pytest.raises(ValueError, match="unsupported bucket aggregation"):
        es_aggregate(sales, {"b": {"percentiles": {"field": "amount"}}})
    with pytest.raises(ValueError, match="unsupported aggregation type"):
        es_aggregate(sales, {
            "b": {
                "terms": {"field": "region"},
                "aggs": {"m": {"percentiles": {"field": "amount"}}},
            }
        })
    with pytest.raises(ValueError, match="unsupported date_histogram interval"):
        es_aggregate(sales, {"b": {"date_histogram": {"field": "id", "calendar_interval": "fortnight"}}})
    with pytest.raises(ValueError, match="neither 'query' nor 'aggs'"):
        es_request(sales, {"size": 5})


def test_envelope_sorted_hits_with_source(spark, sales):
    got = [
        tuple(r) for r in es_request(sales, {
            "query": {"term": {"region": "us"}},
            "sort": [{"amount": {"order": "desc"}}],
            "size": 2,
            "_source": ["id", "amount"],
        }, tiebreak="id").collect()
    ]
    assert got == [(7, 13.0), (6, 11.0)]


def test_envelope_sort_shapes_and_errors(spark, sales):
    # bare string field = asc; list of mixed shapes allowed
    got = [
        r["id"] for r in es_request(sales, {
            "query": {"match_all": {}},
            "sort": ["region", {"amount": "desc"}],
            "size": 3,
            "_source": ["id"],
        }, tiebreak="id").collect()
    ]
    assert got == [8, 2, 1]  # ap first, then eu by amount desc
    with pytest.raises(ValueError, match="bad sort direction"):
        es_request(sales, {
            "query": {"match_all": {}}, "sort": [{"amount": "down"}],
        })


def test_search_after_paginates_exactly(spark, sales):
    """Walking pages with search_after reproduces the full sorted stream
    with no overlap and no gap — ES deep pagination as a keyset predicate."""
    base = {
        "query": {"match_all": {}},
        "sort": [{"amount": "desc"}],
        "size": 3,
        "_source": ["id", "amount"],
    }
    page1 = [tuple(r) for r in es_request(sales, base, tiebreak="id").collect()]
    assert [i for i, _ in page1] == [2, 7, 6]
    cursor = [page1[-1][1], page1[-1][0]]  # (amount, id) of the last hit
    page2 = [
        tuple(r) for r in es_request(
            sales, {**base, "search_after": cursor}, tiebreak="id"
        ).collect()
    ]
    assert [i for i, _ in page2] == [1, 5, 4]
    cursor2 = [page2[-1][1], page2[-1][0]]
    page3 = [
        tuple(r) for r in es_request(
            sales, {**base, "search_after": cursor2}, tiebreak="id"
        ).collect()
    ]
    assert [i for i, _ in page3] == [3, 8]


def test_search_after_tie_handling_and_errors(spark, sales):
    # equal sort values: the tiebreak key must disambiguate, not duplicate
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "id long, amount double"
    )
    req = {"query": {"match_all": {}}, "sort": [{"amount": "desc"}],
           "size": 2, "_source": ["id"]}
    p1 = [r["id"] for r in es_request(df, req, tiebreak="id").collect()]
    assert p1 == [1, 2]
    p2 = [
        r["id"] for r in es_request(
            df, {**req, "search_after": [5.0, 2]}, tiebreak="id"
        ).collect()
    ]
    assert p2 == [3]
    with pytest.raises(ValueError, match="one value per sort key"):
        es_request(sales, {**req, "search_after": [5.0]}, tiebreak="id")
    with pytest.raises(ValueError, match="requires an explicit sort"):
        es_request(sales, {"query": {"match_all": {}}, "search_after": [1]})


def test_top_hits_per_bucket(spark, sales):
    got = {
        (r["by_region"], r["id"])
        for r in es_aggregate(sales, {
            "by_region": {
                "terms": {"field": "region"},
                "aggs": {
                    "best": {
                        "top_hits": {
                            "size": 2,
                            "sort": [{"amount": "desc"}, "id"],
                            "_source": ["id", "amount"],
                        }
                    }
                },
            }
        }).collect()
    }
    # eu: 20, 10; us: 13, 11; ap: 1
    assert got == {("eu", 2), ("eu", 1), ("us", 7), ("us", 6), ("ap", 8)}


def test_top_hits_requires_sort_and_exclusivity(spark, sales):
    with pytest.raises(ValueError, match="explicit sort"):
        es_aggregate(sales, {
            "b": {"terms": {"field": "region"},
                  "aggs": {"h": {"top_hits": {"size": 1}}}}
        })
    with pytest.raises(ValueError, match="only sub-agg"):
        es_aggregate(sales, {
            "b": {"terms": {"field": "region"},
                  "aggs": {"h": {"top_hits": {"size": 1, "sort": ["id"]}},
                           "m": {"sum": {"field": "amount"}}}}
        })


def test_null_keys_dropped_unless_missing_param(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de"), (4, None)], "id long, lang string"
    )
    got = {
        r["by_lang"]: r["doc_count"]
        for r in es_aggregate(df, {"by_lang": {"terms": {"field": "lang"}}}).collect()
    }
    assert got == {"en": 1, "de": 1}  # ES: missing-field docs leave the agg
    with_missing = {
        r["by_lang"]: r["doc_count"]
        for r in es_aggregate(df, {
            "by_lang": {"terms": {"field": "lang", "missing": "unknown"}}
        }).collect()
    }
    assert with_missing == {"en": 1, "de": 1, "unknown": 2}


def test_range_agg_buckets_and_labels(spark, sales):
    got = {
        r["by_amt"]: r["doc_count"]
        for r in es_aggregate(sales, {
            "by_amt": {"range": {"field": "amount", "ranges": [
                {"to": 8},
                {"from": 8, "to": 12, "key": "mid"},
                {"from": 12},
            ]}}
        }).collect()
    }
    # <8: 1,5,7 | [8,12): 9,10,11 | >=12: 13,20
    assert got == {"*-8": 3, "mid": 3, "12-*": 2}
    with pytest.raises(ValueError, match="non-overlapping"):
        es_aggregate(sales, {
            "b": {"range": {"field": "amount", "ranges": [
                {"to": 10}, {"from": 5, "to": 12},
            ]}}
        })


def test_es_request_on_tweet_documents(spark):
    """The ES surface against the reference's own document shape: a
    query+aggs request over the denormalized tweet documents — language
    buckets restricted to authors with real reach (the reference query's
    filter), with exact author cardinality; and a top_hits request for the
    most-liked tweets per language."""
    from tweets_elastic_spark.operators.denormalize import build_tweet_documents
    from tweets_elastic_spark.sources.fixtures import make_tweets_tables

    docs = build_tweet_documents(make_tweets_tables(spark, n_conversations=60))
    buckets = {
        r["by_lang"]: (r["doc_count"], r["n_authors"])
        for r in es_request(docs, {
            "query": {"range": {"author.followers_count": {"gt": 100}}},
            "aggs": {
                "by_lang": {
                    "terms": {"field": "language"},
                    "aggs": {"n_authors": {"cardinality": {"field": "author.id"}}},
                }
            },
        }).collect()
    }
    rows = docs.filter("author.followers_count > 100").collect()
    expected = {}
    for r in rows:
        lang = r["language"]
        c, s = expected.get(lang, (0, set()))
        s = s | {r["author"]["id"]}
        expected[lang] = (c + 1, s)
    assert buckets == {k: (c, len(s)) for k, (c, s) in expected.items()}
    assert len(buckets) > 1

    top = es_request(docs, {
        "aggs": {
            "by_lang": {
                "terms": {"field": "language"},
                "aggs": {
                    "hot": {
                        "top_hits": {
                            "size": 1,
                            "sort": [{"like_count": "desc"}, "id"],
                            "_source": ["id", "like_count"],
                        }
                    }
                },
            }
        }
    }).collect()
    best = {}
    for r in docs.collect():
        cur = best.get(r["language"])
        key = (-r["like_count"], r["id"])
        if cur is None or key < cur[0]:
            best[r["language"]] = (key, r["id"])
    assert {r["by_lang"]: r["id"] for r in top} == {k: v for k, (_, v) in best.items()}


def test_filters_agg_overlapping_buckets_one_scan(spark, sales):
    got = {
        (r["which"], r["doc_count"])
        for r in es_aggregate(sales, {
            "which": {"filters": {"filters": {
                "big": {"range": {"amount": {"gte": 10}}},
                "us_side": {"term": {"region": "us"}},
                "both": {"bool": {"filter": [
                    {"range": {"amount": {"gte": 10}}},
                    {"term": {"region": "us"}},
                ]}},
            }}}
        }).collect()
    }
    # big: 10,20,11,13 | us: 7,9,11,13 | both: 11,13 — overlap is fine
    assert got == {("big", 4), ("us_side", 4), ("both", 2)}
    with pytest.raises(ValueError, match="does not support sub-aggs"):
        es_aggregate(sales, {
            "w": {"filters": {"filters": {"a": {"match_all": {}}}},
                  "aggs": {"m": {"sum": {"field": "amount"}}}}
        })


def test_stats_metric_expands_five_columns(spark, sales):
    row = es_aggregate(sales, {
        "by_region": {
            "terms": {"field": "region"},
            "aggs": {"amt": {"stats": {"field": "amount"}}},
        }
    }).filter("by_region = 'eu'").head()
    assert (row["amt_count"], row["amt_min"], row["amt_max"]) == (3, 5.0, 20.0)
    assert abs(row["amt_sum"] - 35.0) < 1e-12
    assert abs(row["amt_avg"] - 35.0 / 3) < 1e-12


def test_fixed_interval_date_histogram(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2026, 1, 1, 0, 10)), (2, dt.datetime(2026, 1, 1, 0, 40)),
        (3, dt.datetime(2026, 1, 1, 0, 50)), (4, dt.datetime(2026, 1, 1, 1, 5)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r["b"]: r["doc_count"]
        for r in es_aggregate(df, {
            "b": {"date_histogram": {"field": "ts", "fixed_interval": "30m"}}
        }).collect()
    }
    assert got == {
        "2026-01-01 00:00:00": 1, "2026-01-01 00:30:00": 2, "2026-01-01 01:00:00": 1,
    }
    with pytest.raises(ValueError, match="bad fixed_interval"):
        es_aggregate(df, {"b": {"date_histogram": {"field": "ts", "fixed_interval": "1w"}}})


def test_min_doc_count_filters_buckets(spark, sales):
    got = {
        r["by_region"]
        for r in es_aggregate(sales, {
            "by_region": {"terms": {"field": "region", "min_doc_count": 2}}
        }).collect()
    }
    assert got == {"eu", "us"}  # ap has 1 doc
    with pytest.raises(ValueError, match="innermost bucket"):
        es_aggregate(sales, {
            "b": {"terms": {"field": "region", "min_doc_count": 2},
                  "aggs": {"p": {"terms": {"field": "product"}}}}
        })
