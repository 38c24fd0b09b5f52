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
from web_content_extractor_spark.functions.classify import rank_context_py

_PDF_SUFFIX_RUN = re.compile(r"(\.pdf)+$", re.IGNORECASE)
_VIDEO_HINTS = ("youtube", "youtu.be", "embed", "iframe.ly")
_CDATA_CLOSE = {
    e: re.compile(rf"</\s*{e}", re.IGNORECASE) for e in ("script", "style")
}
_PLAIN_DOCTYPE = re.compile(r"<!doctype[^>\[]*>", re.IGNORECASE)
# tags whose events the consumer observes (plus cdata-mode switches)
_INTERESTING_TAGS = frozenset(
    ("a", "iframe", "object", "embed", "title", "script", "style")
)
# Idle jump-scan: when no anchor is open and we're not inside <title>,
# every construct NOT matched below is provably unobservable, so one
# C-level search replaces per-tag Python iterations.  The scan must
# stop at (left-to-right, so the OUTERMOST construct wins):
#   <[!?]      comments / doctypes / PIs (may contain tag-like text);
#   </junk     malformed end tags (endtagfind fails) swallow input up
#              to the first '>' and could eat a real opener — only a
#              WELL-FORMED </name\s*> is skipped (its extent cannot
#              contain '<', quotes, or '=' by its grammar);
#   <a|iframe|object|embed|title|script|style  (name-boundary checked:
#              tagfind's name chars are [^\t\n\r\f />\x00], so a name
#              is "done" only before those or EOF);
#   <name(ws|/|NUL) any start tag with whitespace/attrs — its attr
#              values (quoted OR unquoted) and tolerant attr NAMES may
#              contain '<', so its extent must be parsed exactly.  NUL
#              is included because attrfind's name lookbehind ['"\s/]
#              lets an attribute start right after a quote-terminated
#              NAME run (`<d"\x00<a href=x>` is ONE tag named `d"`
#              with attrs `\x00<a` and `href` — fuzz-found);
#   <name<     a start tag whose name run hits another '<' ('<' is a
#              legal tagfind name char, so `<x<title>` is ONE boring
#              tag named "x<title" — jumping to the inner `<title`
#              would wrongly enter title mode).
# What remains skipped: text runs, stray '<' chars, attributeless
# '<'-free `<name>` tags (their extent is exactly name chars + '>' —
# no '<' inside, so no room for an opener), and well-formed end tags
# (their name grammar excludes '<'/quotes).  All are event-free while
# idle.  Quotes and '=' need no handling: an attribute VALUE can only
# exist inside a start tag whose name run ends in whitespace or '/'
# (or hits '<'), and those all stop the scan above — a quote anywhere
# else is inert text or part of a tag NAME, neither of which can
# extend an extent past a later '<'.
_IDLE_JUMP = re.compile(
    r"""<(?:"""
    r"""[!?]"""
    r"""|/(?![a-zA-Z][-.a-zA-Z0-9:_]*\s*>)"""
    r"""|(?:a|iframe|object|embed|title|script|style)"""
    r"""(?=[\t\n\r\f />]|$)"""
    r"""|[a-zA-Z][^\t\n\r\f />\x00]*(?=[\t\n\r\f /\x00])"""
    r"""|[a-zA-Z][^<\t\n\r\f />\x00]*(?=<)"""
    r""")""",
    re.IGNORECASE,
)


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


class _FastScanError(Exception):
    """Internal: fast scanner bailed; caller falls back to HTMLParser."""


def _fast_feed(tok: _LinkTokenizer, rawdata: str) -> None:
    """Single-pass scanner emitting the same event stream as
    ``HTMLParser(convert_charrefs=True)`` into ``tok``.

    The stdlib parser's incremental-feed state machine (goahead /
    updatepos bookkeeping) is ~85% of tokenizer CPU; this one-shot
    scanner reuses the stdlib's OWN tolerant regexes
    (tagfind/attrfind/locatestarttagend/endtagfind), its attr
    unescaping, its CDATA (script/style) rules, its stray-'<' and
    unterminated-tag fallbacks — so the event stream matches on
    well-formed AND common-malformed input (differential-tested
    against HTMLParser in tests/test_tokenizer.py; any internal
    surprise raises and the caller re-parses with HTMLParser).
    """
    import html as _htmlmod
    import html.parser as _hp

    unescape = _htmlmod.unescape
    tagfind = _hp.tagfind_tolerant
    attrfind = _hp.attrfind_tolerant
    locatestart = _hp.locatestarttagend_tolerant
    endtagfind = _hp.endtagfind
    commentclose = _hp.commentclose

    n = len(rawdata)
    i = 0
    cdata_elem: str | None = None

    def data(chunk: str, in_cdata: bool = False) -> None:
        if not chunk:
            return
        if not in_cdata and "&" in chunk:
            chunk = unescape(chunk)
        tok.handle_data(chunk)

    def incomplete(at: int) -> int:
        # html.parser goahead(end=1) EOF rule for an incomplete
        # construct: emit one data chunk up to and including the next
        # '>', else up to (excluding) the next '<', else one char
        k = rawdata.find(">", at + 1)
        if k < 0:
            k = rawdata.find("<", at + 1)
            if k < 0:
                k = at + 1
        else:
            k += 1
        data(rawdata[at:k])
        return k

    while i < n:
        if cdata_elem is not None:
            # content is raw until a matching close tag (html.parser
            # set_cdata_mode semantics); unterminated CDATA content is
            # DISCARDED at EOF, exactly like goahead's cdata break
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if not m:
                break
            j = m.start()
            data(rawdata[i:j], in_cdata=True)
            em = endtagfind.match(rawdata, j)
            if em and em.group(1).lower() == cdata_elem:
                tok.handle_endtag(cdata_elem)
                cdata_elem = None
                i = em.end()
            else:
                gt = rawdata.find(">", j + 1)
                if gt < 0:
                    # incomplete-at-EOF rule, raw (no unescape), still
                    # in cdata: chunk to next '<' else one char
                    k = rawdata.find("<", j + 1)
                    if k < 0:
                        k = j + 1
                    data(rawdata[j:k], in_cdata=True)
                    i = k
                else:
                    data(rawdata[j:gt], in_cdata=True)
                    i = gt
            continue

        # "idle" = no open anchor, not inside <title>: data events are
        # dropped by the consumer and non-interesting tags produce no
        # observable event.  One _IDLE_JUMP search (see its contract
        # above) replaces per-tag iteration over text runs, '<'-free
        # attributeless tags, and well-formed end tags; every stop
        # position is parsed exactly with the stdlib regexes, so
        # quoted '>'/'<' inside attributes can never derail the scan.
        idle = tok._open_anchor is None and not tok._in_title
        if idle:
            jm = _IDLE_JUMP.search(rawdata, i)
            if jm is None:
                break  # only text/boring extents remain; idle drops them
            i = jm.start()
        else:
            lt = rawdata.find("<", i)
            if lt < 0:
                data(rawdata[i:])
                break
            data(rawdata[i:lt])
            i = lt
        nxt = rawdata[i + 1 : i + 2]
        if nxt and nxt.isascii() and nxt.isalpha():
            # start tag; mirror parse_starttag + check_for_whole_start_tag
            tm = tagfind.match(rawdata, i + 1)
            tag = tm.group(1).lower()
            lm = locatestart.match(rawdata, i)
            if not lm:
                i = incomplete(i)
                continue
            j = lm.end()
            after = rawdata[j : j + 1]
            if after == ">":
                endpos = j + 1
            elif after == "/":
                if rawdata.startswith("/>", j):
                    endpos = j + 2
                else:
                    i = incomplete(i)
                    continue
            elif after == "" or after in "abcdefghijklmnopqrstuvwxyz=/":
                i = incomplete(i)  # end of input in/before attr value
                continue
            elif j > i:
                endpos = j  # junk characters in start tag (lenient)
            else:
                i = incomplete(i)
                continue
            if idle and tag not in _INTERESTING_TAGS:
                i = endpos  # extent consumed; no observable event
                continue
            k = tm.end()
            attrs: list[tuple[str, str | None]] = []
            while k < endpos:
                am = attrfind.match(rawdata, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (
                    attrvalue[:1] == "'" == attrvalue[-1:]
                    or attrvalue[:1] == '"' == attrvalue[-1:]
                ):
                    attrvalue = attrvalue[1:-1]
                if attrvalue and "&" in attrvalue:
                    attrvalue = unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end not in (">", "/>"):
                # stdlib parse_starttag's junk path emits this chunk
                # RAW (no charref unescape), unlike goahead text
                tok.handle_data(rawdata[i:endpos])
                i = endpos
                continue
            if end.endswith("/>"):
                tok.handle_startendtag(tag, attrs)
            else:
                tok.handle_starttag(tag, attrs)
                if tag in ("script", "style"):
                    cdata_elem = tag
            i = endpos
        elif rawdata.startswith("</", i):
            gtpos = rawdata.find(">", i + 1)
            if gtpos < 0:
                i = incomplete(i)
                continue
            em = endtagfind.match(rawdata, i)
            if em:
                tok.handle_endtag(em.group(1).lower())
                i = em.end()
                continue
            nm = tagfind.match(rawdata, i + 2)
            if nm:  # lenient end tag w/ junk before '>'
                tok.handle_endtag(nm.group(1).lower())
                gt2 = rawdata.find(">", nm.end())
                if gt2 < 0:
                    break
                i = gt2 + 1
                continue
            if rawdata[i : i + 3] == "</>":
                i += 3
                continue
            i = gtpos + 1  # bogus comment: skip to '>'
        elif rawdata.startswith("<!--", i):
            cm = commentclose.search(rawdata, i + 4)
            if not cm:
                i = incomplete(i)
                continue
            i = cm.end()
        elif rawdata.startswith("<?", i):
            gt = rawdata.find(">", i + 2)
            if gt < 0:
                i = incomplete(i)
                continue
            i = gt + 1
        elif rawdata.startswith("<!", i):
            # plain doctype (no internal subset) is skipped inline; any
            # other declaration / marked section goes to the stdlib
            # parser, whose lenient-vs-raising behavior (AssertionError
            # on bad marked sections -> doc-level parse_error) is the
            # engine's pinned semantics
            dm = _PLAIN_DOCTYPE.match(rawdata, i)
            if dm:
                i = dm.end()
            else:
                raise _FastScanError
        else:
            data("<")
            i += 1

    tok.close()


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
) -> tuple[list[tuple[str, str, str, int]], str | None, list[tuple[str, str, str]]]:
    """Tokenize one HTML payload.

    Returns (candidates, page_title, errors) where candidates is the
    ordered list of (url, text, tag, type_rank) — the reference's
    list[tuple[url, text]] IR (src/core/interfaces.py:24) with URLs
    already urljoin-resolved, plus the source tag and the precomputed
    golden-classifier rank (see schemas.TOKENIZED cand_ranks).  ``errors`` records each dropped candidate as
    (stage, reason, target): the queryable analog of the reference's
    ContextualExtractionError context (src/core/exceptions.py:46-67,
    service.py:126-140) — drop-not-fail semantics preserved, but every
    drop is attributable.

    The returned URLs are HttpUrl-normalized absolute URLs.
    """
    tok = _LinkTokenizer()
    try:
        _fast_feed(tok, html)
    except Exception:
        # any surprise in the fast scanner -> authoritative stdlib parse
        tok = _LinkTokenizer()
        tok.feed(html)
        tok.close()

    out: list[tuple[str, str, str, int]] = []
    errors: list[tuple[str, str, str]] = []
    bp = urlnorm.base_prefix(base_url)

    def push(raw_target: str, tag: str, text_fn: Any) -> None:
        # fast paths for the two dominant href shapes.  Absolute http(s)
        # targets are returned verbatim by urljoin (urllib keeps their
        # dot segments).  Root-relative targets get dot segments
        # *removed* by urljoin (RFC 3986 §5.2.4), so any href containing
        # "/." ("/./", "/../", trailing "/." or "/..") must take the
        # full resolve path.  Both fast paths also exclude targets with
        # an EMPTY query or fragment ('a?', 'a#', 'a?#x'): urljoin's
        # split/unsplit round-trip silently DROPS the bare delimiter
        # ('/a?' -> '/a'), so the reference — which joins every href —
        # never emits it, and a verbatim fast path must not either
        # (fuzz-found; empty query ⟺ '?' at end or right before '#',
        # empty fragment ⟺ trailing '#').
        # Same class of silent rewrite: urljoin also removes urllib's
        # _UNSAFE_URL_BYTES_TO_REMOVE (tab/CR/LF) from the target
        # ('/a\tb' -> '/ab'), so a target containing any of them must
        # take the full resolve path too (advisor-found).
        joins_clean = not (
            raw_target.endswith(("?", "#"))
            or "?#" in raw_target
            or "\t" in raw_target
            or "\r" in raw_target
            or "\n" in raw_target
        )
        if joins_clean and raw_target.startswith(("http://", "https://")):
            resolved = raw_target
        elif (
            joins_clean
            and bp
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
        # golden-classifier rank computed here (~1 us) so the native
        # assembly sorts on a precomputed int instead of re-running
        # the interpreted rlike chain inside its transform() HOF
        out.append((normalized, text, tag, rank_context_py(normalized, text)))

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
    ranks: list[int] = []
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
            for url, text, tag, rank in cands:
                urls.append(url)
                texts.append(text)
                tags.append(tag)
                ranks.append(rank)
        elif kind == "media" and span.get("media_ref"):
            # opaque media payload: passes through unvalidated
            urls.append(span["media_ref"])
            texts.append("")
            tags.append("media")
            ranks.append(2)  # media is always kind='other' (F14)
    return {
        "doc_id": doc_id,
        "base_url": base_url,
        "page_title": title,
        "cand_urls": urls,
        "cand_texts": texts,
        "cand_tags": tags,
        "cand_ranks": ranks,
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
    "cand_ranks",
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
