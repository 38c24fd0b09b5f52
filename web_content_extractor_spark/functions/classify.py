"""Link classification as native Catalyst Column expressions.

The reference ships two interchangeable classifiers behind one
protocol (src/core/interfaces.py:33-39):

- ``ContextAwareClassifier`` (src/infrastructure/context_classifier.py:9-76)
  — used by the CLI; URL patterns first (incl. cdn.iframe.ly), then a
  "N MB ... pdf" text hint, then iframe.ly ``url=`` query-param
  unwrapping, then "watch" in text.
- ``RegexLinkClassifier`` (src/infrastructure/link_classifier.py:15-72)
  — used by the API/functions; broader PDF URL/text patterns,
  youtube/watch text heuristics.

The *golden* semantics (what the reference's own tests pin down —
see FIXTURES.md §2) are the ContextAware rule set plus the
drop-invalid-URL behavior; the Regex variant stays available behind a
flag for API-parity.

Both are pure ``when``/``rlike`` chains: JVM-side, codegen-friendly,
usable either on exploded columns or inside ``transform()`` lambdas
over the nested candidates array — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pattern constants (Java regex, embedded (?i) for case-insens.) ----

# ContextAware PDF URL patterns (context_classifier.py:13-17)
CTX_PDF_URL_RE = r"(?i)(\.pdf$|\.pdf[?#]|pdf.*download)"
# ContextAware YouTube URL patterns incl. iframe.ly CDN
# (context_classifier.py:19-28)
CTX_YT_URL_RE = (
    r"(?i)(youtube\.com/watch|youtu\.be/|youtube\.com/embed/"
    r"|youtube-nocookie\.com|cdn\.iframe\.ly/)"
)
# size-hint text rule (context_classifier.py:50-51)
CTX_PDF_TEXT_RE = r"(?i)\d+\s*MB.*pdf"

# Regex-variant PDF URL patterns (link_classifier.py:18-23)
RGX_PDF_URL_RE = r"(?i)(\.pdf$|\.pdf[?#]|\.pdf.*download|[^/]*\.pdf[^/]*$)"
# Regex-variant PDF text patterns (link_classifier.py:61-62)
RGX_PDF_TEXT_RE = r"(?i)\.pdf(\b|$)"
# Regex-variant YouTube URL patterns (link_classifier.py:26-31)
RGX_YT_URL_RE = (
    r"(?i)(youtube\.com/watch|youtu\.be/|youtube\.com/embed/|youtube-nocookie\.com)"
)

PDF, YOUTUBE, OTHER = "pdf", "youtube", "other"

# output ordering: type rank pdf -> youtube -> other mirrors the
# ExtractionResult assembly (service.py:80-88 + models.py:171-173)
TYPE_RANK = {PDF: 0, YOUTUBE: 1, OTHER: 2}


def _iframely_proxied_is_youtube(url: Column) -> Column:
    """iframe.ly proxy unwrap (context_classifier.py:56-63).

    Extract the ``url=`` query parameter and re-test the YouTube
    patterns against its decoded value.  ``try_url_decode`` keeps the
    drop-not-fail contract for malformed percent-encoding.
    """
    param = F.parse_url(url, F.lit("QUERY"), F.lit("url"))
    return (
        F.lower(url).contains("iframe.ly")
        & param.isNotNull()
        & F.coalesce(_try_decode(param), param).rlike(CTX_YT_URL_RE)
    )


def _try_decode(c: Column) -> Column:
    return F.call_function("try_url_decode", c)


def classify_context(url: Column, text: Column) -> Column:
    """Golden classifier (ContextAware decision order, FIXTURES.md §2)."""
    return (
        F.when(url.rlike(CTX_PDF_URL_RE), F.lit(PDF))
        .when(url.rlike(CTX_YT_URL_RE), F.lit(YOUTUBE))
        .when(text.rlike(CTX_PDF_TEXT_RE), F.lit(PDF))
        .when(_iframely_proxied_is_youtube(url), F.lit(YOUTUBE))
        .when(F.lower(text).contains("watch"), F.lit(YOUTUBE))
        .otherwise(F.lit(OTHER))
    )


def classify_regex(url: Column, text: Column) -> Column:
    """Regex-variant classifier (link_classifier.py:41-72), PDF first."""
    is_pdf = (
        url.rlike(RGX_PDF_URL_RE)
        | text.rlike(RGX_PDF_TEXT_RE)
        | F.upper(text).contains("PDF")
    )
    is_yt = (
        url.rlike(RGX_YT_URL_RE)
        | F.lower(text).contains("youtube")
        | F.lower(text).contains("watch")
    )
    return (
        F.when(is_pdf, F.lit(PDF))
        .when(is_yt, F.lit(YOUTUBE))
        .otherwise(F.lit(OTHER))
    )


def classify_kind(url: Column, text: Column, variant: str = "context") -> Column:
    if variant == "context":
        return classify_context(url, text)
    if variant == "regex":
        return classify_regex(url, text)
    raise ValueError(f"unknown classifier variant: {variant!r}")


def type_rank(kind: Column) -> Column:
    """pdf=0, youtube=1, other=2 (ExtractionResult list order)."""
    return (
        F.when(kind == PDF, F.lit(0)).when(kind == YOUTUBE, F.lit(1)).otherwise(2)
    )


def rank_kind(rank: Column) -> Column:
    """Inverse of :func:`type_rank` — lets the assembly carry a cheap
    int through the sort and classify each candidate exactly once."""
    return (
        F.when(rank == 0, F.lit(PDF))
        .when(rank == 1, F.lit(YOUTUBE))
        .otherwise(F.lit(OTHER))
    )
