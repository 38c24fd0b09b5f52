"""From-scratch HTML link tokenizer (stdlib ``html.parser``).

This is the engine's single Python stage.  It re-implements, from the
observable behavior only, the candidate-link extraction of the
reference parser (src/infrastructure/html_parser.py:47-148) as an
event-driven tokenizer — no DOM materialization, one pass per
document:

- anchors with an ``href`` (skip javascript:/#/mailto:/tel: prefixes,
  html_parser.py:84), then iframes (``src``), then objects (``data``),
  then embeds (``src``) — concatenated in that order
  (html_parser.py:56-62);
- anchor text priority: non-empty ``download`` attr → stripped inner
  text → raw href → url, then collapse a trailing run of ``.pdf``
  suffixes to a single ``.pdf`` (html_parser.py:125-148);
- iframe text uses the *test-pinned* golden rule ``_get_iframe_text``
  (html_parser.py:150-166; pinned by
  tests/unit/test_enhanced_parsing.py:35-38 over the live code path):
  URL containing youtube/youtu.be/embed/iframe.ly → "Embedded Video
  Content", else the title attr, else "Embedded Content: {url}";
- object text = title or "Embedded Object"; embed text = title or
  "Embedded Content" (html_parser.py:103-123);
- every candidate URL is urljoin-resolved and HttpUrl-normalized;
  invalid URLs are dropped and counted (drop-not-fail semantics,
  link_classifier.py:50-53).

Interleaved input: a document is an array of spans ordered by
``offset``.  ``kind='html'`` spans are tokenized; ``kind='media'``
spans pass through as candidates with ``is_media=True`` (their
media_ref is preserved verbatim — opaque payload, no validation);
``kind='text'`` spans yield no link candidates.  A single monotonically
increasing ``pos`` preserves document parse order across spans.
"""

from __future__ import annotations

import re
import time
from collections.abc import Iterable, Iterator
from html.parser import HTMLParser
from typing import Any

import pandas as pd

from web_content_extractor_spark.functions import urlnorm

_PDF_SUFFIX_RUN = re.compile(r"(\.pdf)+$", re.IGNORECASE)
_VIDEO_HINTS = ("youtube", "youtu.be", "embed", "iframe.ly")


class _LinkTokenizer(HTMLParser):
    """One-pass event tokenizer collecting the four candidate classes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str | None, str]] = []  # (href, download, text)
        self.iframes: list[tuple[str, str | None]] = []  # (src, title)
        self.objects: list[tuple[str, str | None]] = []  # (data, title)
        self.embeds: list[tuple[str, str | None]] = []  # (src, title)
        self.title: str | None = None
        self._open_anchor: tuple[str, str | None, list[str]] | None = None
        self._in_title = False

    # -- tag events ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        a = dict(attrs)
        if tag == "a":
            self._close_anchor()  # nested <a> implicitly closes the open one
            href = a.get("href")
            if href is not None:
                self._open_anchor = (href, a.get("download"), [])
        elif tag == "iframe":
            src = a.get("src")
            if src:
                self.iframes.append((src, a.get("title")))
        elif tag == "object":
            data = a.get("data")
            if data:
                self.objects.append((data, a.get("title")))
        elif tag == "embed":
            src = a.get("src")
            if src:
                self.embeds.append((src, a.get("title")))
        elif tag == "title":
            self._in_title = True

    def handle_startendtag(
        self, tag: str, attrs: list[tuple[str, str | None]]
    ) -> None:
        if tag != "a":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close_anchor()
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._open_anchor is not None:
            self._open_anchor[2].append(data)
        if self._in_title and self.title is None and data.strip():
            self.title = data.strip()

    def close(self) -> None:
        super().close()
        self._close_anchor()

    def _close_anchor(self) -> None:
        if self._open_anchor is not None:
            href, download, chunks = self._open_anchor
            # bs4 get_text(strip=True): each text node stripped, joined by ""
            text = "".join(c.strip() for c in chunks)
            self.anchors.append((href, download, text))
            self._open_anchor = None


def _anchor_text(href: str, download: str | None, inner: str, url: str) -> str:
    """Reference text-selection priority (html_parser.py:125-148)."""
    raw = download or inner or href or url
    return _PDF_SUFFIX_RUN.sub(".pdf", raw).strip()


def _iframe_text(url: str, title: str | None) -> str:
    """Golden iframe text rule (html_parser.py:150-166, test-pinned)."""
    low = url.lower()
    if any(h in low for h in _VIDEO_HINTS):
        return "Embedded Video Content"
    if title:
        return title
    return f"Embedded Content: {url}"


def tokenize_html(
    html: str, base_url: str
) -> tuple[list[tuple[str, str]], str | None, list[tuple[str, str, str]]]:
    """Tokenize one HTML payload.

    Returns (candidates, page_title, errors) where candidates is the
    ordered list of (raw_or_resolved_url, text) *before* validation —
    mirroring the reference's list[tuple[url, text]] IR
    (src/core/interfaces.py:24) — except URLs are already
    urljoin-resolved.  ``errors`` records each dropped candidate as
    (stage, reason, target): the queryable analog of the reference's
    ContextualExtractionError context (src/core/exceptions.py:46-67,
    service.py:126-140) — drop-not-fail semantics preserved, but every
    drop is attributable.

    The returned URLs are HttpUrl-normalized absolute URLs.
    """
    tok = _LinkTokenizer()
    tok.feed(html)
    tok.close()

    out: list[tuple[str, str, str]] = []
    errors: list[tuple[str, str, str]] = []
    bp = urlnorm.base_prefix(base_url)

    def push(raw_target: str, tag: str, text_fn: Any) -> None:
        # fast paths for the two dominant href shapes.  Absolute http(s)
        # targets are returned verbatim by urljoin (urllib keeps their
        # dot segments).  Root-relative targets get dot segments
        # *removed* by urljoin (RFC 3986 §5.2.4), so any href containing
        # "/." ("/./", "/../", trailing "/." or "/..") must take the
        # full resolve path.
        if raw_target.startswith(("http://", "https://")):
            resolved = raw_target
        elif (
            bp
            and raw_target.startswith("/")
            and not raw_target.startswith("//")
            and "/." not in raw_target
        ):
            resolved = bp + raw_target
        else:
            resolved = urlnorm.resolve(base_url, raw_target)
        normalized = urlnorm.normalize(resolved)
        if normalized is None:
            errors.append(("url_validation", "invalid_url", resolved))
            return
        text = text_fn(normalized)
        if not text:
            errors.append(("text_selection", "empty_text", normalized))
            return
        out.append((normalized, text, tag))

    for href, download, inner in tok.anchors:
        if not href or href.startswith(urlnorm.SKIP_PREFIXES):
            continue
        push(
            href, "a", lambda u, h=href, d=download, i=inner: _anchor_text(h, d, i, u)
        )
    for src, title in tok.iframes:
        push(src, "iframe", lambda u, t=title: _iframe_text(u, t))
    for data, title in tok.objects:
        push(data, "object", lambda u, t=title: (t or "Embedded Object"))
    for src, title in tok.embeds:
        push(src, "embed", lambda u, t=title: (t or "Embedded Content"))
    return out, tok.title, errors


def tokenize_doc(
    doc_id: str, spans: Iterable[dict[str, Any]] | None
) -> dict[str, Any]:
    """Tokenize one interleaved document row -> TOKENIZED-shaped dict.

    Candidates come back as flat parallel lists (urls/texts/tags) —
    document parse order is the list index.  Flat ``list<string>``
    columns cross the Arrow boundary an order of magnitude faster than
    ``list<struct>`` (no per-candidate Python dict/struct conversion);
    the downstream assembly zips them natively (arrays_zip).
    ``tag='media'`` marks pass-through media spans; invalid URLs are
    already dropped here (drop-not-fail, link_classifier.py:50-53) and
    only counted in ``parse_failures``.
    """
    t0 = time.perf_counter()
    base_url = doc_id  # fixture convention: doc_id IS the base URL
    urls: list[str] = []
    texts: list[str] = []
    tags: list[str] = []
    err_stages: list[str] = []
    err_reasons: list[str] = []
    err_targets: list[str] = []
    title: str | None = None
    span_list = list(spans) if spans is not None else []
    for span in sorted(span_list, key=lambda s: s["offset"] or 0):
        kind = span.get("kind")
        if kind == "html" and span.get("text"):
            try:
                cands, t, errs = tokenize_html(span["text"], base_url)
            except Exception as exc:
                err_stages.append("parse")
                err_reasons.append(f"parse_error:{type(exc).__name__}")
                err_targets.append(base_url)
                continue
            for stage, reason, target in errs:
                err_stages.append(stage)
                err_reasons.append(reason)
                err_targets.append(target)
            title = title or t
            for url, text, tag in cands:
                urls.append(url)
                texts.append(text)
                tags.append(tag)
        elif kind == "media" and span.get("media_ref"):
            # opaque media payload: passes through unvalidated
            urls.append(span["media_ref"])
            texts.append("")
            tags.append("media")
    return {
        "doc_id": doc_id,
        "base_url": base_url,
        "page_title": title,
        "cand_urls": urls,
        "cand_texts": texts,
        "cand_tags": tags,
        "parse_failures": len(err_stages),
        "err_stages": err_stages,
        "err_reasons": err_reasons,
        "err_targets": err_targets,
        "proc_us": int((time.perf_counter() - t0) * 1e6),
    }


_COLS = (
    "doc_id",
    "base_url",
    "page_title",
    "cand_urls",
    "cand_texts",
    "cand_tags",
    "parse_failures",
    "err_stages",
    "err_reasons",
    "err_targets",
    "proc_us",
)


def tokenize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: DOCS batches in, TOKENIZED batches out.

    Output is built column-wise (dict of lists) — constructing pandas
    frames from per-row dicts re-infers every cell and dominated the
    profile at scale.
    """
    for pdf in batches:
        cols: dict[str, list[Any]] = {c: [] for c in _COLS}
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            d = tokenize_doc(doc_id, spans)
            for c in _COLS:
                cols[c].append(d[c])
        yield pd.DataFrame(cols, columns=list(_COLS))
