"""Text normalization + snapshot-diff semantics."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from web_content_extractor_spark.functions.text_quality import clean_text
from web_content_extractor_spark.operators.diff import (
    changed_docs,
    snapshot_diff,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# clean_text
# ---------------------------------------------------------------------------


def test_nfc_compose_control_strip_whitespace_collapse(spark):
    dirty = "  Café  du\tmonde\x07x \x00 end  "
    out = (
        _docs(spark, [(1, dirty)])
        .select(clean_text(F.col("text")).alias("c"))
        .collect()[0]
        .c
    )
    assert out == "Café du mondex end"
    assert unicodedata.is_normalized("NFC", out)


def test_clean_text_matches_python_reference_on_varied_inputs(spark):
    import re

    cases = [
        "plain ascii text",
        "åb ç already-é",  # ring, cedilla, composed
        "tabs\tand\nnewlines\r\nand  runs",
        "\x01\x02ctrl\x1fsoup\x7f",
        "",
        "   ",
    ]

    def ref(s: str) -> str:
        s = unicodedata.normalize("NFC", s)
        s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", s)
        return re.sub(r"\s+", " ", s).strip()

    rows = _docs(spark, list(enumerate(cases))).select(
        "doc_id", clean_text(F.col("text")).alias("c")
    ).collect()
    for r in rows:
        assert r.c == ref(cases[r.doc_id]), cases[r.doc_id]


def test_clean_text_null_passthrough(spark):
    out = _docs(spark, [(1, None)]).select(
        clean_text(F.col("text")).alias("c")
    ).collect()[0].c
    assert out is None


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_diff_statuses(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _docs(spark, [(2, "b"), (3, "C2"), (4, "x"), (5, "new")])
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",  # NULL -> 'x' is an edit, not an add
        5: "added",
    }


def test_changed_docs_carries_new_rows_only(spark):
    old = _docs(spark, [(1, "a"), (2, "b")])
    new = _docs(spark, [(1, "a"), (2, "B!"), (3, "c")])
    rows = {r.doc_id: r.text for r in changed_docs(old, new).collect()}
    assert rows == {2: "B!", 3: "c"}


def test_diff_of_identical_snapshots_is_all_unchanged(spark):
    old = _docs(spark, [(i, f"t{i}") for i in range(50)])
    st = snapshot_diff(old, old).groupBy("status").count().collect()
    assert {(r.status, r["count"]) for r in st} == {("unchanged", 50)}


def test_clean_text_is_idempotent(spark):
    cases = [
        "  Café  du\tmonde\x07x ",
        "plain",
        "å  b́  ",
        "",
    ]
    df = _docs(spark, list(enumerate(cases)))
    once = df.select("doc_id", clean_text(F.col("text")).alias("c"))
    twice = once.select("doc_id", clean_text(F.col("c")).alias("c"))
    a = {r.doc_id: r.c for r in once.collect()}
    b = {r.doc_id: r.c for r in twice.collect()}
    assert a == b
