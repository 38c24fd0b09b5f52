"""Vocabulary build + unigram LM quality-proxy semantics."""

from __future__ import annotations

import math

from web_content_extractor_spark.operators.keywords import (
    unigram_logprob_scores,
    vocab_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_rank_tiebreak_and_coverage(spark):
    docs = _docs(spark, [(1, "b b b a a c"), (2, "a d")])
    rows = vocab_topk(docs, v=3).collect()
    got = [(r.rank, r.tok, r.cnt) for r in rows]
    # a and b tie at 3 -> text asc puts a first; c/d tie at 1 -> c
    assert got == [(1, "a", 3), (2, "b", 3), (3, "c", 1)]
    cov = {r.rank: r.coverage for r in rows}
    assert abs(cov[1] - 3 / 8) < 1e-9
    assert abs(cov[2] - 6 / 8) < 1e-9
    assert abs(cov[3] - 7 / 8) < 1e-9


def test_vocab_full_coverage_reaches_one(spark):
    docs = _docs(spark, [(1, "x y z x")])
    rows = vocab_topk(docs, v=10).collect()
    assert abs(rows[-1].coverage - 1.0) < 1e-9
    assert len(rows) == 3  # only 3 distinct tokens exist


def test_unigram_nll_hand_values(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "b c"), (3, "")])
    out = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
    # counts: a=2 b=2 c=1, N=5
    assert abs(out[1].nll - (math.log(5) - math.log(2))) < 1e-6
    assert abs(
        out[2].nll - (math.log(5) - (math.log(2) + math.log(1)) / 2)
    ) < 1e-6
    assert out[3].n_tokens == 0 and out[3].nll is None
    # rare-token doc scores strictly higher (worse) than common-token doc
    assert out[2].nll > out[1].nll


def test_unigram_uniform_corpus_is_flat(spark):
    docs = _docs(spark, [(i, "w1 w2 w3 w4") for i in range(8)])
    rows = unigram_logprob_scores(docs).collect()
    # every token occurs 8 times, N=32: nll = ln(32/8) = ln 4 for all
    for r in rows:
        assert abs(r.nll - math.log(4)) < 1e-6
