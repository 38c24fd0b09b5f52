"""Anchor-text index semantics: counts, top-k cap, tie order."""

from __future__ import annotations

from web_content_extractor_spark.operators.graph import anchor_text_index


def _links(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, media_ref string, text string"
    )


def test_counts_cap_and_tie_order(spark):
    rows = (
        [("d1", "https://t/a", "alpha")] * 3
        + [("d2", "https://t/a", "beta")] * 3
        + [("d3", "https://t/a", "gamma")] * 2
        + [("d1", "https://t/a", "delta")]
        + [("d4", "https://t/b", "solo")]
    )
    out = {
        r.target: r
        for r in anchor_text_index(_links(spark, rows), k=2).collect()
    }
    a = out["https://t/a"]
    assert a.n_refs == 9
    assert a.n_docs == 3  # distinct referrers d1, d2, d3
    # count desc, then text asc for the alpha/beta tie; gamma/delta cut by k=2
    assert a.top_texts == ["alpha", "beta"]
    b = out["https://t/b"]
    assert b.n_refs == 1 and b.n_docs == 1 and b.top_texts == ["solo"]


def test_null_targets_dropped(spark):
    rows = [("d1", None, "x"), ("d1", "https://t/a", "x")]
    out = anchor_text_index(_links(spark, rows), k=3).collect()
    assert len(out) == 1 and out[0].target == "https://t/a"


def test_hot_target_capped_not_exploded(spark):
    rows = [
        (f"d{i}", "https://hot/", f"text{i % 7}") for i in range(700)
    ]
    out = anchor_text_index(_links(spark, rows), k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_refs == 700 and r.n_docs == 700
    assert len(r.top_texts) == 3
    assert r.top_texts == ["text0", "text1", "text2"]  # 100 each, text asc


def test_differential_vs_python_reference(spark):
    """Random link tables: counts, in-degrees, and capped top-k lists
    must match a direct Python implementation."""
    import random
    from collections import Counter, defaultdict

    rng = random.Random(21)
    rows = [
        (
            f"d{rng.randrange(12)}",
            f"https://t/{rng.randrange(6)}",
            f"w{rng.randrange(5)}",
        )
        for _ in range(400)
    ]
    k = 3
    got = {
        r.target: (r.n_refs, r.n_docs, list(r.top_texts))
        for r in anchor_text_index(_links(spark, rows), k=k).collect()
    }
    per = defaultdict(list)
    for d, t, w in rows:
        per[t].append((d, w))
    for t, items in per.items():
        n_refs = len(items)
        n_docs = len({d for d, _ in items})
        cnt = Counter(w for _, w in items)
        top = [w for w, _ in sorted(cnt.items(), key=lambda x: (-x[1], x[0]))][:k]
        assert got[t] == (n_refs, n_docs, top), t
    assert set(got) == set(per)
