"""North-star content extraction: block segmentation + density rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.functions.blocks import segment_blocks
from web_content_extractor_spark.operators.content import (
    content_stats,
    extract_content,
)
from web_content_extractor_spark.schemas import DOCS

PROSE = ("The quick brown fox jumps over the lazy dog and keeps on "
         "running through the quiet forest until dusk settles")  # 20 words


def test_segment_blocks_features():
    html = (
        "<body><h1>My Title</h1>"
        f"<p>{PROSE}</p>"
        '<ul><li><a href="/a">nav one</a></li><li><a href="/b">nav two</a></li></ul>'
        "</body>"
    )
    blocks = segment_blocks(html)
    assert blocks[0] == ("h1", "My Title", 2, 0)
    assert blocks[1][0] == "p" and blocks[1][2] == 20 and blocks[1][3] == 0
    assert blocks[2] == ("li", "nav one", 2, 2)
    assert blocks[3] == ("li", "nav two", 2, 2)


def test_script_style_and_head_skipped():
    html = (
        "<head><title>T</title><style>p{color:red}</style></head>"
        "<body><script>var x = 'not content';</script>"
        f"<p>{PROSE}</p></body>"
    )
    blocks = segment_blocks(html)
    assert len(blocks) == 1 and blocks[0][1] == PROSE


def test_mixed_anchor_prose_density():
    # prose with an inline link: low density, kept
    html = f'<p>{PROSE} see <a href="/x">this link</a> for details</p>'
    (b,) = segment_blocks(html)
    assert b[2] == 25 and b[3] == 2  # 25 words, 2 anchor words


def test_extract_content_rules(spark):
    html = (
        "<body><h1>Title</h1>"
        f"<p>{PROSE}</p>"
        "<p>too short</p>"
        '<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>'
        "<h2>Linked heading <a href='/x'>all link text here</a></h2>"
        "</body>"
    )
    docs = spark.createDataFrame(
        [("https://d.org", [{"kind": "html", "text": html,
                            "media_ref": None, "offset": 0}])],
        schema=DOCS,
    )
    row = extract_content(docs).collect()[0]
    got = [(s.kind, s.text, s.offset) for s in row.spans]
    # kept: title heading + long prose; dropped: short prose,
    # link-only div (density 1.0), link-dominated heading (4/6 > 0.5)
    assert got == [("heading", "Title", 0), ("paragraph", PROSE, 1)]

    stats = content_stats(docs).collect()[0]
    assert (stats.blocks_total, stats.blocks_kept, stats.blocks_dropped) == (5, 2, 3)


def test_content_does_not_touch_link_parity(spark):
    """Content spans are additive: the link pipeline output is unchanged."""
    from web_content_extractor_spark.datagen import fixture_docs, expected_spans
    from web_content_extractor_spark.plans.pipeline import extract

    docs = fixture_docs(spark)
    extract_content(docs).collect()  # runs fine on fixture docs
    row = extract(docs).where(
        F.col("doc_id") == "https://fixture09.example.org"
    ).collect()[0]
    assert [
        (s.kind, s.text, s.media_ref, s.offset) for s in row.spans
    ] == expected_spans("F09")
