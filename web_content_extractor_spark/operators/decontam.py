"""Benchmark decontamination for training-data pipelines.

A training corpus must not contain evaluation-benchmark text; the
standard sweep (GPT-3 appx. C / Llama style) flags every document that
contains any benchmark snippet as a substring after light
normalization (lowercase + whitespace collapse).

Two physical strategies, one semantics:

- ``contaminated_pairs``     — native path: the snippet table is tiny
  by definition (benchmarks are MBs; the corpus is TBs), so broadcast
  it and evaluate ``contains`` JVM-side in a whole-stage-codegen'd
  filter over a single corpus scan.  No shuffle at all; cost is
  O(docs x snippets) substring searches, the right shape while the
  snippet count is small.  This is the DuckDB-oracle-checked path.
- ``contaminated_pairs_multi`` — scale path for LARGE snippet sets: an
  Aho–Corasick automaton built once from the snippet list and shipped
  to executors inside a ``mapInPandas`` kernel; each document is
  scanned ONCE regardless of snippet count (O(len + hits) per doc vs
  O(len x snippets)).  Still shuffle-free.  Pure-Python automaton (a
  C automaton like pyahocorasick drops in where available); pytest
  pins pair-set equality against the native path.

The reference has no decontamination (it is a single-site extractor);
this is part of the engine-added LLM-pipeline battery, built in the
same drop-don't-fail spirit as its link filters
(src/infrastructure/link_classifier.py:50-53).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(text: Column) -> Column:
    """Decontamination normalization: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def benchmark_snippets(
    docs: DataFrame,
    every: int = 97,
    offset: int = 3,
    start_tok: int = 5,
    n_tok: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic benchmark set: an ``n_tok``-gram lifted
    from every ``every``-th document (the sandbox stand-in for a real
    benchmark table; at 100 TB this is `spark.read` of the eval sets).

    Returns (snippet_id, snippet) — normalized word n-grams, so every
    source document is contaminated by construction and any other
    document repeating the same n-gram is flagged too.
    """
    toks = F.filter(
        F.split(_norm(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    return (
        docs.where((F.col("doc_id") % every) == offset)
        .select(
            F.col("doc_id").alias("snippet_id"),
            F.concat_ws(" ", F.slice(toks, start_tok, n_tok)).alias("snippet"),
            F.size(toks).alias("_n"),
        )
        .where(F.col("_n") >= start_tok + n_tok - 1)
        .drop("_n")
    )


def contaminated_pairs(docs: DataFrame, snippets: DataFrame) -> DataFrame:
    """(doc_id, snippet_id) for every document containing a snippet.

    Broadcast nested-loop join with a JVM-side ``contains`` predicate:
    one corpus scan, zero shuffles (the final distinct is keyed on the
    already-tiny hit set).
    """
    # empty snippets match nothing (contains('') would flag EVERY doc;
    # the Aho-Corasick path drops them too, so both paths agree)
    snips = snippets.where(F.length("snippet") > 0)
    return (
        docs.select("doc_id", _norm(F.col("text")).alias("t"))
        .join(F.broadcast(snips), F.col("t").contains(F.col("snippet")))
        .select("doc_id", "snippet_id")
        .distinct()
    )


class AhoCorasick:
    """Minimal Aho–Corasick multi-pattern matcher (set-of-ids output).

    goto is a list of dicts (char -> state), fail the classic BFS
    failure links, out the pattern-id sets merged through fail links.
    """

    def __init__(self, patterns: list[tuple[int, str]]):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[set[int]] = [set()]
        for pid, pat in patterns:
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(set())
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].add(pid)
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque(self.goto[0].values())
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0)
                self.out[t] |= self.out[self.fail[t]]

    def match_ids(self, text: str) -> set[int]:
        s, hits = 0, set()
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                hits |= out[s]
        return hits


def contaminated_pairs_multi(docs: DataFrame, snippets: DataFrame) -> DataFrame:
    """Aho–Corasick variant: one pass per document over ALL snippets.

    The snippet list is collected driver-side (it is the broadcast-
    small side by definition) and the automaton rides to executors in
    the UDF closure — the Python analog of a broadcast hash join's
    build side.
    """
    pats = [
        (int(r.snippet_id), r.snippet)
        for r in snippets.select("snippet_id", "snippet").collect()
        if r.snippet
    ]
    ac = AhoCorasick(pats)

    import re as _re

    # ASCII-only \s and space-only strip: the JVM path's regexp_replace
    # uses Java's ASCII \s and trim() strips spaces, so the Python
    # kernel must NOT collapse Unicode whitespace (  etc.) that
    # the native path leaves intact
    _ws = _re.compile(r"\s+", _re.ASCII)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            snip_ids: list[int] = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                if not txt:
                    continue
                norm = _ws.sub(" ", txt.strip(" ")).lower()
                for pid in ac.match_ids(norm):
                    doc_ids.append(did)
                    snip_ids.append(pid)
            yield pd.DataFrame({"doc_id": doc_ids, "snippet_id": snip_ids})

    return (
        docs.select("doc_id", "text")
        .mapInPandas(scan, "doc_id: bigint, snippet_id: bigint")
        .distinct()
    )


def contamination_report(docs: DataFrame, snippets: DataFrame) -> DataFrame:
    """Per-document contamination rollup: hit count + first snippet id
    (min) — the table a pipeline owner drops rows by."""
    pairs = contaminated_pairs(docs, snippets)
    return pairs.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        F.min("snippet_id").alias("first_snippet_id"),
    )


def contamination_scores(
    docs: DataFrame,
    snippets: DataFrame,
    n: int = 8,
    tau: float = 0.01,
    text_col: str = "text",
) -> DataFrame:
    """GPT-3-style quantitative contamination: the fraction of a
    document's DISTINCT word ``n``-grams colliding with any benchmark
    ``n``-gram (GPT-3 appx. C measures gram collisions to split dirty
    vs clean eval docs; applied corpus-side here, the quantitative
    complement of the boolean ``contaminated_pairs`` sweep).

    Returns (doc_id, n_grams, n_hit, frac, dirty) for EVERY document
    — ``frac`` is rounded to 6 places and ``dirty`` compares the
    ROUNDED value against ``tau`` so the verdict is reproducible
    across engines and partitionings.

    Scale notes (10^12 docs): the benchmark gram set is MBs by nature
    -> broadcast; the whole query is ONE pass — explode the doc grams
    once, LEFT-join the broadcast gram set as a hit marker in the same
    stage, and fold both counts into a single doc_id-keyed aggregation
    (grams of a doc are colocated with it, so the partial agg collapses
    to one row per doc before the exchange).  The n-gram shingling HOF
    is interpreted (never codegens), so it must be evaluated exactly
    once: an earlier size(gs)+explode(gs) two-branch shape re-ran it
    per branch and was 3x slower at sf0.1.
    """
    from web_content_extractor_spark.operators.dedup_docs import (
        _word_ngrams,
    )

    bench = (
        snippets.select(F.explode(_word_ngrams(F.col("snippet"), n)).alias("g"))
        .where(F.length("g") > 0)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    g = docs.select(
        "doc_id", F.explode_outer(_word_ngrams(F.col(text_col), n)).alias("g")
    )
    agg = (
        g.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_grams"),  # non-null: 0 for short docs
            F.count("hit").alias("n_hit"),
        )
    )
    frac = F.round(
        F.when(
            F.col("n_grams") > 0,
            F.col("n_hit").cast("double") / F.col("n_grams"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return agg.withColumn("frac", frac).withColumn(
        "dirty", F.col("frac") >= F.lit(tau)
    )
