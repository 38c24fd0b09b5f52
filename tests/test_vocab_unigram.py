"""Vocabulary build + unigram LM quality-proxy semantics."""

from __future__ import annotations

import math

from web_content_extractor_spark.operators.keywords import (
    bigram_logprob_scores,
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


# --- bigram LM ---------------------------------------------------------------


def test_bigram_nll_hand_values(spark):
    docs = _docs(spark, [(1, "a b a b"), (2, "a b c"), (3, "solo"), (4, "")])
    out = {r.doc_id: r for r in bigram_logprob_scores(docs).collect()}
    # bigram counts: "a b"=3 ("a b a b" has 2, "a b c" has 1),
    #                "b a"=1, "b c"=1; prefix totals: a·=3, b·=2
    # doc 1: bigrams [ab, ba, ab] -> -mean(ln(3/3), ln(1/2), ln(3/3))
    import math
    want1 = -(math.log(1.0) + math.log(0.5) + math.log(1.0)) / 3
    assert out[1].n_bigrams == 3 and abs(out[1].nll - round(want1, 6)) < 1e-9
    # doc 2: [ab, bc] -> -mean(ln(3/3), ln(1/2))
    want2 = -(math.log(1.0) + math.log(0.5)) / 2
    assert out[2].n_bigrams == 2 and abs(out[2].nll - round(want2, 6)) < 1e-9
    # short/empty docs: no bigrams, NULL score, row kept
    assert out[3].n_bigrams == 0 and out[3].nll is None
    assert out[4].n_bigrams == 0 and out[4].nll is None


def test_bigram_conditionals_normalize(spark):
    # a corpus where one prefix fans out: P(.|a) must sum to 1, so a
    # doc of ONLY deterministic transitions scores exactly 0
    docs = _docs(spark, [(1, "x y x y x y"), (2, "p q"), (3, "p r")])
    out = {r.doc_id: r for r in bigram_logprob_scores(docs).collect()}
    # doc 1 transitions are all deterministic (x->y always, y->x always)
    assert abs(out[1].nll) < 1e-9
    # docs 2/3 split the "p ." mass evenly -> nll = ln 2 / 1
    import math
    assert abs(out[2].nll - round(math.log(2), 6)) < 1e-9
    assert abs(out[3].nll - round(math.log(2), 6)) < 1e-9


def test_bigram_differential_python_reference(spark):
    import math
    import random
    from collections import Counter

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randrange(0, 9))) for _ in range(50)
    ]
    docs = _docs(spark, list(enumerate(texts)))
    c2: Counter = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, t in enumerate(texts):
        toks = t.split()
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        c2.update(bgs)
    c1: Counter = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    out = {r.doc_id: r for r in bigram_logprob_scores(docs).collect()}
    assert set(out) == set(per_doc)
    for i, bgs in per_doc.items():
        if not bgs:
            assert out[i].nll is None and out[i].n_bigrams == 0
            continue
        want = -sum(math.log(c2[b] / c1[b[0]]) for b in bgs) / len(bgs)
        assert out[i].n_bigrams == len(bgs)
        assert abs(out[i].nll - want) < 1e-5, (i, out[i].nll, want)
