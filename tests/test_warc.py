"""WARC record walk (sources/warc.py): framing, gzip members, HTTP
parsing, refusals, and the Spark mapInPandas extraction operator.
Reference scope: beyond-reference LLM-pipeline ingestion (CommonCrawl
layout); the oracle-gated end-to-end row is `warc_extract_text`."""

import gzip

import pytest

from tweets_elastic_spark.sources.warc import (
    build_warc,
    parse_warc,
    warc_records,
)

PAGES = [
    ("https://a.example/0", 200, "text/html", "hello world " * 3),
    ("https://a.example/1", 404, "text/html", "nope"),
    ("https://a.example/2", 200, "text/plain", "plain text"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip_plain_and_gzip_members(gz):
    recs = parse_warc(build_warc(PAGES, gzip_members=gz))
    assert [r.rec_type for r in recs] == ["warcinfo"] + ["response"] * 3
    info = recs[0]
    assert info.http_status is None and b"software:" in info.body
    for (uri, status, ctype, text), r in zip(PAGES, recs[1:]):
        assert (r.uri, r.http_status, r.http_content_type) == \
            (uri, status, ctype)
        assert r.body.decode() == text
        assert r.date == "2024-01-01T00:00:00Z"


def test_gzip_member_boundaries_are_exact():
    """Each record is its own member; the splitter must stop exactly at
    member ends (zlib unused_data), not swallow the next member."""
    payload = build_warc(PAGES, gzip_members=True)
    # member count == record count
    n = payload.count(b"\x1f\x8b\x08")  # deflate members, mtime=0 header
    assert n == len(PAGES) + 1
    assert len(parse_warc(payload)) == len(PAGES) + 1


def test_framing_refusals():
    good = build_warc(PAGES)
    with pytest.raises(ValueError, match="bad WARC version"):
        parse_warc(b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(good[:-3])
    with pytest.raises(
        ValueError,
        match="truncated WARC block|unterminated WARC header",
    ):
        parse_warc(good[:len(good) // 2])
    with pytest.raises(ValueError, match="missing Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="folded"):
        parse_warc(b"WARC/1.0\r\nA: b\r\n  cont\r\n"
                   b"Content-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="garbage between gzip"):
        parse_warc(gzip.compress(good, mtime=0) + b"JUNK")
    with pytest.raises(ValueError, match="no WARC records"):
        parse_warc(b"")


def test_chunked_http_refuses():
    body = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\n0\r\n\r\n")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(body)
           + body + b"\r\n\r\n")
    with pytest.raises(ValueError, match="chunked"):
        parse_warc(rec)


def test_warc_records_operator(spark):
    """The Spark extraction: one row per record, extracted fields only,
    multiple archives per batch, both layouts in one relation."""
    rows = [
        (0, bytearray(build_warc(PAGES, gzip_members=True))),
        (1, bytearray(build_warc(PAGES[:1]))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = warc_records(df).collect()
    by_asset = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert len(by_asset[0]) == 4 and len(by_asset[1]) == 2
    resp = sorted((r["uri"], r["http_status"], r["mime"], r["n_bytes"],
                   r["text"])
                  for r in by_asset[0] if r["warc_type"] == "response")
    assert resp == sorted(
        (u, s, c, len(t.encode()), t) for u, s, c, t in PAGES
    )
    # warcinfo rows carry NULL text and NULL status
    info = [r for r in by_asset[0] if r["warc_type"] == "warcinfo"][0]
    assert info["text"] is None and info["http_status"] is None


def test_warc_records_streaming_matches_batch(spark, tmp_path):
    """The ingestion stage works under Structured Streaming: archives
    arrive as binary files (readStream binaryFile — the shape a
    continuously-crawled bucket has), warc_records maps the stream, and
    availableNow == batch row-for-row. mapInPandas is stateless, so no
    watermark is involved."""
    import pyspark.sql.functions as F

    d = tmp_path / "archives"
    d.mkdir()
    for aid in range(4):
        pages = [(f"https://s.example/{aid}/{j}", 200, "text/html",
                  f"stream body {aid}:{j}") for j in range(3)]
        (d / f"{aid}.warc.gz").write_bytes(
            build_warc(pages, gzip_members=(aid % 2 == 0)))

    def extract(df):
        assets = df.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.warc", 1)
            .cast("long").alias("asset_id"),
            F.col("content").alias("payload"),
        )
        return warc_records(assets).filter(
            F.col("warc_type") == "response"
        ).select("asset_id", "uri", "text")

    bin_schema = ("path string, modificationTime timestamp, "
                  "length long, content binary")
    stream = extract(
        spark.readStream.format("binaryFile").schema(bin_schema)
        .load(str(d))
    )
    q = (stream.writeStream.format("memory").queryName("warc_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["asset_id"], r["uri"], r["text"])
           for r in spark.sql("SELECT * FROM warc_stream").collect()}
    batch = extract(
        spark.read.format("binaryFile").load(str(d))
    )
    want = {(r["asset_id"], r["uri"], r["text"]) for r in batch.collect()}
    assert got == want and len(got) == 12
