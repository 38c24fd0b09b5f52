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


def test_rank_context_py_matches_native_chain(spark):
    """The tokenizer's precomputed rank (classify.rank_context_py) must
    EXACTLY match the native Column chain — it replaces it inside the
    assembly.  Randomized soup targets the Java/Python regex seams:
    strict %-escapes (java.net.URI rejects them anywhere), '+' decode,
    truncated UTF-8, unicode digits, key case, fragments."""
    from web_content_extractor_spark.functions import classify

    rng = random.Random(20260819)
    url_parts = [
        "https://", "http://", "iframe.ly", "youtube.com", "youtu.be",
        "a.com", "/watch", "/embed/", "/x.pdf", "/p", "?", "&", "url=",
        "v=1", "%2F", "%3A", "%zz", "%e2%82", "%E2%82%AC", "+", "#frag",
        "download", "pdf", ".PDF", "youtube-nocookie.com",
        "cdn.iframe.ly/", "q=", "URL=", "xurl=", "=", "%", "%4",
        "watch", "~",
        # review-found parity seams: fragment-before-query, literal
        # space/CR/controls, URI-rejected punct, brackets, unicode
        # folding (KELVIN SIGN, dotless i), NEL/LS separators
        "#a?url=youtube.com%2Fwatch", " ", "\r", "\x07", "[", "]",
        "{", "|", "\u212a", "\u0131", "\x85", "\u2028", "\xa0",
        ".pdf\r", "x.pdf\u2028",
        # opaque/absolute-URI seams: scheme with NO slashes (opaque ->
        # java.net.URI has no query), single-slash hierarchical,
        # invalid schemes (colon in first segment -> URI rejects)
        "mailto:", "http:", "http:/", "a+b:", "1a:", ":", "a.b-c:",
        "mailto:iframe.ly?url=youtube.com%2Fwatch",
        "http:iframe.ly?url=youtube.com%2Fwatch",
    ]
    text_parts = [
        "", "watch", "WATCH this", "5 MB pdf", "12MB", "pdf", "MB",
        "3 MB pdf", "7\tMB .pdf", "٠ MB pdf", "9 mb PDF", "0MBpdf",
        "text", "5 MB\nx pdf", "5 MB\rpdf", "6 MB\x85pdf",
        "8 MB\u2028pdf", "watc\u212a", "2 MB x pdf\r",
    ]
    rows = []
    for _ in range(1500):
        u = "".join(rng.choice(url_parts) for _ in range(rng.randint(1, 10)))
        t = rng.choice(text_parts) + rng.choice(["", " tail"])
        rows.append((u, t))
    df = spark.createDataFrame(rows, "url string, text string")
    native = df.select(
        "url", "text",
        classify.type_rank(
            classify.classify_context(F.col("url"), F.col("text"))
        ).alias("r"),
    ).collect()
    bad = [
        (r.url, r.text, r.r, classify.rank_context_py(r.url, r.text))
        for r in native
        if classify.rank_context_py(r.url, r.text) != r.r
    ]
    assert not bad, bad[:5]


def test_assemble_with_ranks_equals_native_assembly(spark):
    """extract() (ranks path) must emit byte-identical spans to the
    native classify path on the fixture corpus."""
    from web_content_extractor_spark.datagen import fixture_docs
    from web_content_extractor_spark.operators.assemble import assemble_spans
    from web_content_extractor_spark.plans.pipeline import tokenize

    tok = tokenize(fixture_docs(spark))
    with_ranks = tok.select(
        "doc_id",
        assemble_spans(
            F.col("cand_urls"), F.col("cand_texts"), F.col("cand_tags"),
            "context", ranks=F.col("cand_ranks"),
        ).alias("spans"),
    )
    native = tok.select(
        "doc_id",
        assemble_spans(
            F.col("cand_urls"), F.col("cand_texts"), F.col("cand_tags"),
            "context",
        ).alias("spans"),
    )
    assert with_ranks.exceptAll(native).count() == 0
    assert native.exceptAll(with_ranks).count() == 0
