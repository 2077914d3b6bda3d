"""Ingest pipelines: per-processor semantics, grok compilation, guards."""

from __future__ import annotations

import pytest

from tweets_elastic_spark.plans.ingest import (
    apply_ingest_pipeline,
    grok_to_regex,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "  Hello World  ", "3.5", ["a"]),
         (2, "ERR code", "x", ["b"])],
        "id long, msg string, num string, tags array<string>",
    )


def _one(df, id_):
    return [r for r in df.collect() if r["id"] == id_][0]


def test_basic_processors(spark, docs):
    out = apply_ingest_pipeline(docs, {"processors": [
        {"trim": {"field": "msg"}},
        {"lowercase": {"field": "msg", "target_field": "msg_lc"}},
        {"set": {"field": "src", "value": "batch"}},
        {"set": {"field": "msg_copy", "copy_from": "msg"}},
        {"convert": {"field": "num", "type": "double",
                     "target_field": "num_d"}},
        {"gsub": {"field": "msg", "pattern": "o", "replacement": "0"}},
        {"split": {"field": "msg", "separator": "\\s+",
                   "target_field": "words"}},
        {"append": {"field": "tags", "value": "etl"}},
        {"rename": {"field": "num", "target_field": "num_raw"}},
    ]})
    r = _one(out, 1)
    assert r["msg"] == "Hell0 W0rld"
    assert r["msg_lc"] == "hello world"
    assert r["msg_copy"] == "Hello World"  # copy taken before gsub
    assert r["src"] == "batch" and r["num_d"] == 3.5
    assert r["words"] == ["Hell0", "W0rld"] and r["tags"] == ["a", "etl"]
    assert "num" not in out.columns and r["num_raw"] == "3.5"
    # unparseable convert -> NULL (documented divergence from ES failure)
    assert _one(out, 2)["num_d"] is None


def test_grok_and_script_and_date(spark):
    df = spark.createDataFrame(
        [(1, "INFO 42 at 10.1.2.3", "2024-03-05 10:00:00", 2.0),
         (2, "garbage line", "2024-03-06 11:30:00", 3.0)],
        "id long, line string, when string, v double",
    )
    out = apply_ingest_pipeline(df, {"processors": [
        {"grok": {"field": "line", "patterns": [
            "%{LOGLEVEL:lvl} %{INT:code:int} at %{IP:ip}"]}},
        {"script": {"source": "ctx.v2 = ctx.v * params.k",
                    "params": {"k": 10}}},
        {"date": {"field": "when", "formats": ["yyyy-MM-dd HH:mm:ss"],
                  "target_field": "ts"}},
    ]})
    r1, r2 = _one(out, 1), _one(out, 2)
    assert (r1["lvl"], r1["code"], r1["ip"]) == ("INFO", 42, "10.1.2.3")
    # no grok match -> fields NULL, not ''
    assert r2["lvl"] is None and r2["code"] is None
    assert r1["v2"] == 20.0 and r1["ts"].month == 3

    rx, fields = grok_to_regex("%{WORD:w} (x) %{NUMBER}")
    assert fields == [("w", None)]
    assert rx == r"^(\w+)" + "\\ \\(x\\)\\ " + r"(?:-?\d+(?:\.\d+)?)$"
    with pytest.raises(ValueError, match="grok syntax"):
        grok_to_regex("%{NOPE:x}")


def test_guards(spark, docs):
    for pipe, msg in [
        ({"processors": []}, "non-empty"),
        ({"processors": [{"geoip": {"field": "msg"}}]}, "unsupported ingest"),
        ({"processors": [{"remove": {"field": "nope"}}]}, "no such field"),
        ({"processors": [{"convert": {"field": "num", "type": "ip"}}]},
         "unsupported type"),
        ({"processors": [{"grok": {"field": "msg",
                                   "patterns": ["a", "b"]}}]},
         "exactly one pattern"),
        ({"processors": [{"script": {"source": "ctx.x.add(1)"}}]},
         "arithmetic"),
        ({"processors": [{"date": {"field": "msg", "formats": []}}]},
         "exactly one format"),
    ]:
        with pytest.raises(ValueError, match=msg):
            apply_ingest_pipeline(docs, pipe)


def test_enrich_processor(spark):
    docs = spark.createDataFrame(
        [(1, "u7"), (2, "u9"), (3, None)], "id long, uid string"
    )
    users = spark.createDataFrame(
        [("u7", "Sam", "fr"), ("u8", "Kim", "de")],
        "uid string, name string, country string",
    )
    out = apply_ingest_pipeline(
        docs,
        {"processors": [{"enrich": {
            "policy_name": "users", "field": "uid",
            "target_field": "user"}}]},
        enrich_policies={"users": (users, "uid", ["name", "country"])},
    )
    got = {r["id"]: r["user"] for r in out.collect()}
    assert got[1]["name"] == "Sam" and got[1]["country"] == "fr"
    assert got[2] is None and got[3] is None  # no match / NULL key unset
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dimension-sized policy broadcasts
    with pytest.raises(ValueError, match="not bound"):
        apply_ingest_pipeline(docs, {"processors": [{"enrich": {
            "policy_name": "nope", "field": "uid",
            "target_field": "u"}}]})
