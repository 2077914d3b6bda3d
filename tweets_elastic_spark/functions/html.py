"""HTML main-content extraction (boilerplate removal) — the canonical
stage between WARC ingestion and text curation in an LLM training-data
pipeline (trafilatura / jusText / readability are the usual tools; C4 and
RefinedWeb both start from an extracted-main-text corpus).

This is the deterministic jusText-lite variant, chosen because every step
is a built-in string expression that rides the scan (zero shuffle, zero
UDF) and replays verbatim in the DuckDB oracles:

1. drop <script>/<style> elements and HTML comments;
2. split the page into BLOCKS on block-level tags (p, div, h1-h6, li,
   table cells, nav/header/footer/aside/section/article, br);
3. per block, measure text length and LINK DENSITY (chars inside
   <a>...</a> anchors / total chars — the single most discriminative
   boilerplate feature in the jusText/boilerpipe literature: nav bars,
   sidebars and footers are link-dominated);
4. keep blocks with >= min_chars of text and link density <=
   max_link_density; the kept blocks joined in document order are the
   main text.

Documented divergence from full jusText: no stopword-density feature and
no short-block context revision — the stopword gate composes downstream
(gopher_quality_filter / c4_line_filter run on the extracted text), and
context revision needs a sequential pass that would serialize the
otherwise embarrassingly-parallel scan. Reference behavior anchor:
kuko6/tweets-elastic has no crawl stage (its corpus arrives as JSON);
this operator extends the engine's WARC->corpus pipeline
(sources/warc.py, operators/curation.py url gates) one stage further.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Block-level boundary tags: opening or closing, with any attributes.
BLOCK_TAG_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|section"
    r"|article|header|footer|nav|aside|br)\b[^>]*>"
)

# script/style elements (with their content) and comments vanish first.
DROP_ELEMENTS = (
    r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>|<!--.*?-->"
)

ANCHOR_TEXT = r"(?is)<a\b[^>]*>(.*?)</a>"

# The five entities worth unescaping without an entity table; applied
# AFTER tag stripping so '&lt;p&gt;' can never re-enter as markup.
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def _strip_tags(c: Column) -> Column:
    out = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_blocks(html: Column) -> Column:
    """The page as an array of per-block structs:
    ``text`` (tag-stripped, entity-unescaped, whitespace-normalized),
    ``n_chars``, ``link_chars`` (anchor-text chars), in document order.
    One scan-local expression chain — no UDF, no shuffle."""
    cleaned = F.regexp_replace(html, DROP_ELEMENTS, " ")
    blocks = F.split(cleaned, BLOCK_TAG_SPLIT)

    def block_struct(b: Column) -> Column:
        text = _strip_tags(b)
        link_chars = F.aggregate(
            F.transform(
                F.regexp_extract_all(b, F.lit(ANCHOR_TEXT), F.lit(1)),
                lambda a: F.length(_strip_tags(a)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return F.struct(
            text.alias("text"),
            F.length(text).alias("n_chars"),
            link_chars.alias("link_chars"),
        )

    return F.filter(
        F.transform(blocks, block_struct), lambda s: s["n_chars"] > 0
    )


def html_main_text(
    html: Column,
    min_chars: int = 25,
    max_link_density: float = 0.33,
) -> Column:
    """Struct column: ``main_text`` (kept blocks joined with a single
    space, document order), ``n_blocks`` (non-empty blocks seen),
    ``n_kept``. A block is kept when it carries >= ``min_chars`` of text
    AND its link density (anchor chars / total chars) is <=
    ``max_link_density`` — the jusText-lite rule (module docstring)."""

    def keep(s: Column) -> Column:
        return (s["n_chars"] >= F.lit(int(min_chars))) & (
            s["link_chars"]
            <= F.lit(float(max_link_density)) * s["n_chars"]
        )

    def of_blocks(bs: Column) -> Column:
        kept = F.filter(bs, keep)
        return F.struct(
            F.array_join(
                F.transform(kept, lambda s: s["text"]), " "
            ).alias("main_text"),
            F.size(bs).cast("bigint").alias("n_blocks"),
            F.size(kept).cast("bigint").alias("n_kept"),
        )

    # bind the block array once (Catalyst does not CSE repeated subtrees)
    return F.element_at(
        F.transform(F.array(html_blocks(html)), of_blocks), 1
    )
