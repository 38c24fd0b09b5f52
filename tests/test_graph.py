"""Host-graph PageRank semantics."""

from __future__ import annotations

import random

from web_content_extractor_spark.operators.graph import (
    host_pagerank,
    normalize_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _python_pagerank(pairs, iters=5, d=0.85):
    """Plain-Python reference of the exact operator recurrence."""
    ed = sorted({(s, t) for s, t in pairs if s != t})
    nodes = sorted({s for s, _ in ed} | {t for _, t in ed})
    srcs = {s for s, _ in ed}
    edges = ed + [(h, h) for h in nodes if h not in srcs]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    r = {h: 1.0 / n for h in nodes}
    for _ in range(iters):
        c = {h: 0.0 for h in nodes}
        for s, t in edges:
            c[t] += r[s] / deg[s]
        r = {h: (1 - d) / n + d * c[h] for h in nodes}
    return r


def test_two_node_cycle_is_uniform(spark):
    out = {
        r.host: r.rank
        for r in host_pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), iters=5
        ).collect()
    }
    assert abs(out["a"] - 0.5) < 1e-12 and abs(out["b"] - 0.5) < 1e-12


def test_dangling_gets_self_loop_and_mass_conserved(spark):
    # b has no out-links -> normalize_edges patches a self-loop
    e = normalize_edges(_edges(spark, [("a", "b"), ("c", "b")])).collect()
    assert ("b", "b") in {(r.src, r.dst) for r in e}
    ranks = host_pagerank(
        _edges(spark, [("a", "b"), ("c", "b")]), iters=4
    ).collect()
    assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-9  # mass stays 1
    by = {r.host: r.rank for r in ranks}
    assert by["b"] > by["a"]  # the sink accumulates authority


def test_matches_python_reference_on_random_graph(spark):
    rng = random.Random(11)
    pairs = [
        (f"h{rng.randrange(12)}", f"h{rng.randrange(12)}")
        for _ in range(40)
    ]
    want = _python_pagerank(pairs, iters=5)
    got = {
        r.host: r.rank
        for r in host_pagerank(_edges(spark, pairs), iters=5).collect()
    }
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-9


def test_broadcast_mode_identical(spark):
    rng = random.Random(3)
    pairs = [
        (f"h{rng.randrange(8)}", f"h{rng.randrange(8)}") for _ in range(25)
    ]
    plain = {
        r.host: r.rank
        for r in host_pagerank(
            _edges(spark, pairs), iters=3, broadcast_ranks=False
        ).collect()
    }
    bcast = {
        r.host: r.rank
        for r in host_pagerank(
            _edges(spark, pairs), iters=3, broadcast_ranks=True
        ).collect()
    }
    assert plain.keys() == bcast.keys()
    for h in plain:
        assert abs(plain[h] - bcast[h]) < 1e-12


def test_checkpointed_pagerank_same_values_bounded_plan(spark):
    from web_content_extractor_spark.operators.graph import host_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    plain = host_pagerank(edges, iters=12)
    ckpt = host_pagerank(edges, iters=12, checkpoint_every=4)
    a = {r.host: round(r.rank, 10) for r in plain.collect()}
    b = {r.host: round(r.rank, 10) for r in ckpt.collect()}
    assert a == b
    # lineage truncation: the checkpointed plan is far shallower than
    # the 12-iteration unrolled one
    p_plain = plain._jdf.queryExecution().optimizedPlan().toString()
    p_ckpt = ckpt._jdf.queryExecution().optimizedPlan().toString()
    assert len(p_ckpt) < len(p_plain) / 3
