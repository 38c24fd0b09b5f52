"""BPE trainer + encoder: differential vs an independent reference,
hand cases, and the anchor to the DuckDB-oracled pair-count query."""

from __future__ import annotations

import re
from collections import Counter

from web_content_extractor_spark.operators import bpe, keywords


# --- independent reference trainer (subword-nmt style: vocabulary as
# space-joined symbol STRINGS, merge via regex replacement — a
# structurally different implementation from operators/bpe.py's
# tuple-based one) ----------------------------------------------------------


def _ref_train(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[str, int] = {}
    for w, c in word_counts.items():
        key = " ".join(list(w) + [bpe.EOW])
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for key, c in vocab.items():
            syms = key.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        pat = re.compile(
            r"(?<!\S)" + re.escape(pair[0] + " " + pair[1]) + r"(?!\S)"
        )
        vocab = {
            pat.sub(pair[0] + pair[1], key): c for key, c in vocab.items()
        }
    return merges


def _word_counts(texts: list[str]) -> dict[str, int]:
    wc: Counter = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.strip()):
            if w and re.fullmatch(r"[a-z0-9]+", w) and len(w) >= 2:
                wc[w] += 1
    return dict(wc)


def test_train_matches_reference_implementation(spark):
    import random

    rng = random.Random(11)
    base = ["low", "lower", "lowest", "newer", "wider", "new", "ab", "abs"]
    texts = [
        " ".join(rng.choices(base, k=rng.randrange(1, 15))) for _ in range(60)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = [(a, b) for a, b, _ in bpe.train_bpe(docs, n_merges=25)]
    want = _ref_train(_word_counts(texts), 25)
    assert got == want and len(got) > 5


def test_first_merge_anchored_to_oracled_pair_counts(spark):
    """The trainer's first merge must agree with the DuckDB-oracled
    bpe_pairs query: restricted to char-char pairs (the sentinel is
    invisible to the query), round-1 pair stats ARE that table."""
    docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "newest low wide")],
        "doc_id int, text string",
    )
    merges = bpe.train_bpe(docs, n_merges=1)
    top = keywords.bpe_pair_counts(docs, top=1).collect()[0]
    a, b, cnt = merges[0]
    if b == bpe.EOW:
        # an end-of-word pair won: it must beat (or tie) the best
        # char-char pair the oracled query can see
        assert cnt >= top.cnt
    else:
        assert (a, b, cnt) == (top.left_sym, top.right_sym, top.cnt)


def test_train_stops_at_singleton_pairs(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id int, text string")
    # every pair occurs once -> nothing to merge
    assert bpe.train_bpe(docs, n_merges=10) == []


def test_encode_hand_case(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id int, text string")
    merges = bpe.train_bpe(docs, n_merges=2)
    assert [(a, b) for a, b, _ in merges] == [("a", "b"), ("ab", bpe.EOW)]
    out = bpe.encode_with_merges(docs, merges).collect()[0]
    assert (out.n_words, out.n_subwords, out.compression) == (3, 3, 1.0)


def test_encode_unknown_words_pass_through(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id int, text string")
    merges = bpe.train_bpe(docs, n_merges=5)
    probe = spark.createDataFrame(
        [(9, "ab XY a ?!")], "doc_id int, text string"
    )
    out = bpe.encode_with_merges(probe, merges).collect()[0]
    # "ab" fully merged (1); "XY"/"a"/"?!" outside the clean set (1 each)
    assert out.n_words == 4 and out.n_subwords == 4


def test_more_merges_never_increase_subword_count(spark):
    import random

    rng = random.Random(3)
    base = ["low", "lower", "lowest", "slow", "slower"]
    texts = [
        " ".join(rng.choices(base, k=rng.randrange(1, 10))) for _ in range(30)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    totals = []
    for n in (0, 3, 10, 30):
        merges = bpe.train_bpe(docs, n_merges=n)
        enc = bpe.encode_with_merges(docs, merges)
        totals.append(
            enc.agg({"n_subwords": "sum"}).collect()[0][0]
        )
    assert totals == sorted(totals, reverse=True)
    assert totals[-1] < totals[0]  # merges actually compress


def test_encode_training_words_reach_one_symbol(spark):
    docs = spark.createDataFrame(
        [(i, "low low low") for i in range(3)], "doc_id int, text string"
    )
    merges = bpe.train_bpe(docs, n_merges=10)
    out = bpe.encode_with_merges(docs, merges).collect()
    for r in out:
        # "low" fully merged into a single symbol incl. the sentinel
        assert r.n_subwords == r.n_words
