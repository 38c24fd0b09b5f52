"""Classifier-variant tests: golden (ContextAware) vs Regex semantics.

Differential cases follow SURVEY.md §2.4: the two reference
classifiers genuinely differ (text-based PDF detection, iframe.ly
handling) and the engine must provide both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_content_extractor_spark.functions.classify import classify_kind

CASES_CONTEXT = [
    # (url, text, expected) — golden decision order (FIXTURES.md §2)
    ("https://e.com/document.pdf", "x", "pdf"),
    ("https://e.com/report.PDF", "x", "pdf"),
    ("https://e.com/doc.pdf?v=1", "x", "pdf"),
    ("https://e.com/doc.pdf#page=2", "x", "pdf"),
    ("https://e.com/pdf/get?download=1", "x", "pdf"),
    ("https://youtube.com/watch?v=1", "x", "youtube"),
    ("https://youtu.be/xyz", "x", "youtube"),
    ("https://www.youtube.com/embed/a", "x", "youtube"),
    ("https://www.youtube-nocookie.com/embed/a", "x", "youtube"),
    ("https://cdn.iframe.ly/abc", "x", "youtube"),
    # size-hint text rule
    ("https://e.com/file", "Report 3 MB pdf", "pdf"),
    ("https://e.com/file", "3MB pdf download", "pdf"),
    # iframe.ly proxy unwrap via url= query param
    (
        "https://iframe.ly/api/iframe?url=https%3A%2F%2Fwww.youtube.com%2Fwatch%3Fv%3D1",
        "x",
        "youtube",
    ),
    ("https://iframe.ly/api/iframe?url=https%3A%2F%2Fother.com", "x", "other"),
    # text "watch" heuristic
    ("https://e.com/page", "Watch the demo", "youtube"),
    # plain
    ("https://e.com/page", "Visit", "other"),
    # ContextAware does NOT classify PDFs by bare text (SURVEY §2.4)
    ("https://e.com/page", "PDF Document", "other"),
    ("https://e.com/page", "read this pdf", "other"),
]

CASES_REGEX = [
    ("https://e.com/document.pdf", "x", "pdf"),
    ("https://e.com/a.pdf.bak", "x", "pdf"),  # [^/]*\.pdf[^/]*$ rule
    ("https://e.com/page", "PDF Document", "pdf"),  # text 'PDF'
    ("https://e.com/page", "see file.pdf here", "pdf"),  # text \.pdf\b
    ("https://cdn.iframe.ly/abc", "x", "other"),  # no iframe.ly rule
    ("https://e.com/page", "my youtube channel", "youtube"),
    ("https://e.com/page", "Watch now", "youtube"),
    ("https://youtu.be/xyz", "x", "youtube"),
    ("https://e.com/page", "Visit", "other"),
    # PDF precedence over YouTube (link_classifier.py:41-46)
    ("https://e.com/watch.pdf", "watch", "pdf"),
]


def _run(spark, cases, variant):
    df = spark.createDataFrame(
        [(u, t) for u, t, _ in cases], schema="url string, text string"
    )
    rows = df.select(
        "url", "text", classify_kind(F.col("url"), F.col("text"), variant).alias("k")
    ).collect()
    want = {(u, t): e for u, t, e in cases}
    return [(r.url, r.text, r.k, want[(r.url, r.text)]) for r in rows]


@pytest.mark.parametrize("variant,cases", [("context", CASES_CONTEXT), ("regex", CASES_REGEX)])
def test_classifier_variants(spark, variant, cases):
    bad = [(u, t, got, exp) for u, t, got, exp in _run(spark, cases, variant) if got != exp]
    assert bad == []


def test_unknown_variant_rejected():
    with pytest.raises(ValueError):
        classify_kind(F.col("a"), F.col("b"), "nope")
