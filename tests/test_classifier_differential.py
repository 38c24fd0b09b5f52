"""Fuzz differential: Spark rlike classifier vs an independent Python
re-implementation of the golden decision order (FIXTURES.md §2 /
context_classifier.py:42-76).  Two code paths, one spec — structured
random URLs/texts hunt for rule-order or regex-translation bugs the
fixed oracles can't reach."""

from __future__ import annotations

import random
import re
from urllib.parse import parse_qs, unquote, urlsplit

from pyspark.sql import functions as F

from web_content_extractor_spark.functions.classify import classify_kind

_PDF_URL = re.compile(r"(\.pdf$|\.pdf[?#]|pdf.*download)", re.I)
_YT_URL = re.compile(
    r"(youtube\.com/watch|youtu\.be/|youtube\.com/embed/"
    r"|youtube-nocookie\.com|cdn\.iframe\.ly/)",
    re.I,
)
_PDF_TEXT = re.compile(r"\d+\s*MB.*pdf", re.I)


def golden_context(url: str, text: str) -> str:
    """Independent Python rendering of the golden ContextAware rules."""
    if _PDF_URL.search(url):
        return "pdf"
    if _YT_URL.search(url):
        return "youtube"
    if _PDF_TEXT.search(text):
        return "pdf"
    if "iframe.ly" in url.lower():
        try:
            qs = parse_qs(urlsplit(url).query)
            proxied = unquote(qs.get("url", [""])[0])
        except ValueError:
            proxied = ""
        if proxied and _YT_URL.search(proxied):
            return "youtube"
    if "watch" in text.lower():
        return "youtube"
    return "other"


def _random_cases(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    hosts = ["example.com", "youtube.com", "youtu.be", "cdn.iframe.ly",
             "iframe.ly", "files.gitbook.io", "youtube-nocookie.com", "a.b"]
    paths = ["/watch", "/watch?v=abc123", "/embed/xyz", "/doc.pdf",
             "/doc.PDF", "/doc.pdf?dl=1", "/doc.pdf#p2", "/pdfXdownload",
             "/download/pdf", "/p", "/", "/api?url=https%3A%2F%2Fyoutu.be%2Fq1",
             "/api?url=https%3A%2F%2Fexample.com%2Fx", "/api?url=", "/x.pdfy"]
    texts = ["click", "watch now", "WATCH", "3 MB pdf file", "12MB  PDF",
             "a pdf", "PDF", "", "youtube", "mb pdf", "2 MB zip", "pdf 3 MB"]
    cases = []
    for _ in range(n):
        url = f"https://{rng.choice(hosts)}{rng.choice(paths)}"
        cases.append((url, rng.choice(texts)))
    return cases


def test_classifier_differential_fuzz(spark):
    cases = _random_cases(600, seed=20260817)
    df = spark.createDataFrame(cases, ["url", "text"])
    got = {
        (r.url, r.text): r.kind
        for r in df.select(
            "url", "text",
            classify_kind(F.col("url"), F.col("text"), "context").alias("kind"),
        ).collect()
    }
    mismatches = [
        (u, t, got[(u, t)], golden_context(u, t))
        for (u, t) in set(cases)
        if got[(u, t)] != golden_context(u, t)
    ]
    assert not mismatches, mismatches[:10]
