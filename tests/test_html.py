"""HTML main-content extraction (functions/html.py): hand vectors for
block splitting, link density, entity unescaping, script/style/comment
removal, and the keep rule's boundaries."""

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.html import html_blocks, html_main_text


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    m = html_main_text(F.col("html"), **kw)
    return df.select(
        m["main_text"].alias("t"), m["n_blocks"].alias("nb"),
        m["n_kept"].alias("nk"),
    ).head()


def _blocks(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_blocks(F.col("html")).alias("b")).head()["b"]


def test_block_split_and_strip(spark):
    bs = _blocks(
        spark,
        "<div>alpha beta</div><p>gamma <b>delta</b></p><br>tail words",
    )
    assert [b["text"] for b in bs] == [
        "alpha beta", "gamma delta", "tail words"]
    assert [b["link_chars"] for b in bs] == [0, 0, 0]


def test_script_style_comments_vanish(spark):
    r = _extract(
        spark,
        "<p>the real content block has plenty of characters</p>"
        "<script>var kill = 'me';</script>"
        "<style>p { display: none }</style>"
        "<!-- a comment with enough text to pass any length gate -->",
        min_chars=10,
    )
    assert r["t"] == "the real content block has plenty of characters"
    assert r["nk"] == 1


def test_link_density_cuts_nav(spark):
    html = (
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<p>body text long enough to stay in the extracted output</p>"
        '<footer>(c) <a href="/t">Terms of service page</a></footer>'
    )
    r = _extract(spark, html, min_chars=10, max_link_density=0.33)
    assert r["t"] == "body text long enough to stay in the extracted output"
    assert r["nb"] == 3 and r["nk"] == 1
    # raising the density threshold admits the footer and the nav too
    # ('Home About' is exactly 10 chars, density 0.9)
    r2 = _extract(spark, html, min_chars=10, max_link_density=0.95)
    assert r2["nk"] == 3


def test_entities_unescape_after_tag_strip(spark):
    r = _extract(
        spark,
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"
        " padding padding</p>",
        min_chars=5,
    )
    assert "a & b <tag> \"q\" 's' end" in r["t"]
    # the unescaped '<tag>' must NOT have been stripped as markup
    assert "tag" in r["t"]


def test_min_chars_boundary(spark):
    html = "<p>0123456789</p><p>0123456789x</p>"
    r = _extract(spark, html, min_chars=11)
    assert r["t"] == "0123456789x" and r["nb"] == 2 and r["nk"] == 1


def test_anchor_text_counts_not_attributes(spark):
    # href attribute chars must not count as link text
    html = '<p>word word word <a href="/very/long/path/here">x</a></p>'
    r = _extract(spark, html, min_chars=5, max_link_density=0.33)
    assert r["nk"] == 1  # 1 link char over 16 text chars


def test_empty_and_tagless(spark):
    r = _extract(spark, "no tags at all but quite enough text here",
                 min_chars=10)
    assert r["t"] == "no tags at all but quite enough text here"
    assert r["nb"] == 1 and r["nk"] == 1
    r2 = _extract(spark, "<div></div><p> </p>", min_chars=1)
    assert r2["t"] == "" and r2["nb"] == 0 and r2["nk"] == 0
