"""Line-level dedup, chunking, and PII-scrub semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.functions import text_quality as tq
from web_content_extractor_spark.operators.lines import (
    chunk_documents,
    dedup_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------


def test_boilerplate_lines_removed_order_preserved(spark):
    docs = _docs(
        spark,
        [
            (1, "COOKIE BANNER\nalpha one\nbeta two\nfooter"),
            (2, "cookie banner\ngamma three\nfooter"),
            (3, "Cookie Banner\ndelta four\nFOOTER"),
        ],
    )
    out = {
        r.doc_id: r
        for r in dedup_lines(docs, min_df=2).collect()
    }
    # banner + footer hit df>=2 under lower(trim); content lines survive
    assert out[1].text == "alpha one\nbeta two"
    assert out[1].n_lines_kept == 2 and out[1].n_lines_dropped == 2
    assert out[2].text == "gamma three"
    assert out[3].text == "delta four"


def test_all_boilerplate_doc_survives_empty(spark):
    docs = _docs(spark, [(1, "same\nsame2"), (2, "same\nsame2")])
    out = {r.doc_id: r for r in dedup_lines(docs, min_df=2).collect()}
    assert out[1].text == "" and out[1].n_lines_kept == 0
    assert out[2].n_lines_dropped == 2


def test_blank_lines_never_boilerplate(spark):
    # the empty normalized line occurs in every doc but must be kept
    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n\nf")])
    out = {r.doc_id: r for r in dedup_lines(docs, min_df=2).collect()}
    assert out[1].text == "a\n\nb"
    assert out[1].n_lines_dropped == 0


def test_repeat_within_one_doc_not_boilerplate(spark):
    # df counts DISTINCT docs: a line repeated inside a single doc stays
    docs = _docs(spark, [(1, "x\nx\nx"), (2, "y")])
    out = {r.doc_id: r for r in dedup_lines(docs, min_df=2).collect()}
    assert out[1].text == "x\nx\nx"


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_boundaries_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))
    docs = _docs(spark, [(1, words)])
    rows = sorted(
        chunk_documents(docs, chunk_size=4, overlap=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # step=2: starts 0,2,4,6 -> ceil((10-4)/2)=3 extra chunks
    assert [r.chunk_text for r in rows] == [
        "w0 w1 w2 w3",
        "w2 w3 w4 w5",
        "w4 w5 w6 w7",
        "w6 w7 w8 w9",
    ]
    assert all(r.n_tokens == 4 for r in rows)


def test_chunk_short_tail_and_min_one_chunk(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, ""), (3, "solo")])
    got = {}
    for r in chunk_documents(docs, chunk_size=4, overlap=2).collect():
        got.setdefault(r.doc_id, []).append(r)
    # 5 tokens, step 2: chunks at 0 (4 toks) and 2 (3 toks)
    texts = [r.chunk_text for r in sorted(got[1], key=lambda r: r.chunk_id)]
    assert texts == ["a b c d", "c d e"]
    # empty + single-token docs still emit exactly one chunk
    assert len(got[2]) == 1 and got[2][0].chunk_text == ""
    assert got[2][0].n_tokens == 0
    assert len(got[3]) == 1 and got[3][0].chunk_text == "solo"


def test_chunk_rejects_bad_overlap(spark):
    docs = _docs(spark, [(1, "a")])
    try:
        chunk_documents(docs, chunk_size=4, overlap=4)
    except ValueError:
        pass
    else:
        raise AssertionError("overlap >= chunk_size must raise")


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_redaction_and_counts(spark):
    docs = _docs(
        spark,
        [
            (
                1,
                "mail a.b+c@test.org and x@y.io call +4915112345678 "
                "host 192.168.0.1 done",
            ),
            (2, "clean text no pii"),
        ],
    )
    c = tq.pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            tq.redact_pii(F.col("text")).alias("red"),
            c["email"].alias("ne"),
            c["phone"].alias("np"),
            c["ipv4"].alias("ni"),
        ).collect()
    }
    assert out[1].red == (
        "mail <EMAIL> and <EMAIL> call <PHONE> host <IPV4> done"
    )
    assert (out[1].ne, out[1].np, out[1].ni) == (2, 1, 1)
    assert out[2].red == "clean text no pii"
    assert (out[2].ne, out[2].np, out[2].ni) == (0, 0, 0)


def test_pii_email_scrubbed_before_phone_and_ip(spark):
    # '+1234567' inside an email local part and dots in its domain must
    # disappear with the email, not leak as phone/ip masks
    docs = _docs(spark, [(1, "reach +1234567x@a1.b2.org ok")])
    row = docs.select(tq.redact_pii(F.col("text")).alias("red")).first()
    assert row.red == "reach <EMAIL> ok"
