"""SemDeDup semantic-dedup semantics (kept-set soundness + determinism)."""

from __future__ import annotations

import numpy as np
import pytest

from web_content_extractor_spark.operators.similarity import (
    semantic_duplicates,
)


def _unit(rng, dim=64):
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _embs(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(11)
    base = [(i, _unit(rng)) for i in range(20)]
    twins = [(1000 + i, v) for i, v in base[:10]]  # exact copies
    return _embs(spark, base + twins), {i: v for i, v in base + twins}


def test_exact_twins_dropped_with_correct_shadow(planted):
    df, _ = planted
    out = {r.id: r for r in semantic_duplicates(df, threshold=0.99).collect()}
    assert len(out) == 30
    for i in range(10):
        assert out[i].kept, f"base {i} must be kept (lower id wins)"
        tw = out[1000 + i]
        assert not tw.kept and tw.dup_of == i
        assert tw.max_kept_sim >= 0.99
    # the 10 un-twinned bases are mutually near-orthogonal: all kept
    assert all(out[i].kept for i in range(10, 20))


def test_kept_set_is_sound_and_complete_within_cluster(planted):
    df, vecs = planted
    rows = semantic_duplicates(df, threshold=0.9).collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r.cid, []).append(r)
    for cid, rs in by_cid.items():
        kept = [r.id for r in rs if r.kept]
        # completeness: no two kept vectors in a cluster are >= threshold
        for a in range(len(kept)):
            for b in range(a + 1, len(kept)):
                assert float(vecs[kept[a]] @ vecs[kept[b]]) < 0.9
        # soundness: every dropped vector really matches its shadow
        for r in rs:
            if not r.kept:
                assert r.dup_of in kept and r.dup_of < r.id
                assert float(vecs[r.id] @ vecs[r.dup_of]) >= 0.9 - 1e-6


def test_threshold_above_one_keeps_everything(planted):
    df, _ = planted
    rows = semantic_duplicates(df, threshold=1.01).collect()
    assert all(r.kept for r in rows) and len(rows) == 30


def test_deterministic_across_runs_and_layouts(planted):
    df, _ = planted
    a = sorted(
        (r.id, r.cid, r.kept, r.dup_of)
        for r in semantic_duplicates(df, threshold=0.95).collect()
    )
    b = sorted(
        (r.id, r.cid, r.kept, r.dup_of)
        for r in semantic_duplicates(
            df.repartition(7), threshold=0.95
        ).collect()
    )
    assert a == b


def test_oversized_cluster_raises_skew_guard(planted):
    df, _ = planted
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_duplicates(
            df, threshold=0.99, n_centroids=1, max_cluster_rows=5
        ).collect()
