"""Host-graph authority: PageRank over the site link graph.

A web-scale curation signal the reference's single-page pipeline cannot
compute: rank every host by the structure of the host-to-host link
graph (edges come from extracted link spans: base host -> target host).
Rank feeds quality weighting — e.g. mixture rates or crawl priority.

Design (10^8-host graph, 10^10 edges):

- Edges are normalized once (self-loops for dangling hosts, out-degree
  attached) and **persisted partitioned by src**: every iteration joins
  ranks to edges on src, so the expensive side's partitioning is reused
  across all iterations — only the (tiny relative to edges) rank table
  moves per round.
- Each iteration is one shuffle: the contribution aggregation on dst.
  The join itself is src-partition-aligned after the first iteration
  (AQE reuses the exchange).
- Dangling hosts (no out-links) get a self-loop at build time — the
  standard patch that keeps total rank mass at 1 without a per-round
  global dangling-mass broadcast (one anti-join once, instead of a
  scalar agg + cross-join every round).
- Fixed iteration count (the oracle unrolls the same recurrence);
  convergence-threshold stopping would need a per-round driver action,
  which at scale is the right call only when iterations are expensive
  relative to a count() — expose ``iters`` and let the caller choose.

Float determinism: contributions are summed in nondeterministic
partition order, so ranks are stable only to ~1e-15 relative; callers
comparing across engines should round (the driver query rounds to
6 dp, far above the noise floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_edges(edges: DataFrame) -> DataFrame:
    """Dedup edges, drop self-loops, patch dangling nodes, attach degree.

    Input: (src, dst) string columns.  Output: (src, dst, out_deg)
    where every node reachable in the graph has out_deg >= 1 (dangling
    nodes carry a self-loop).
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    dangling = nodes.join(
        e.select(F.col("src").alias("host")).distinct(), "host", "left_anti"
    )
    patched = e.union(
        dangling.select(
            F.col("host").alias("src"), F.col("host").alias("dst")
        )
    )
    deg = patched.groupBy("src").agg(F.count("*").alias("out_deg"))
    return patched.join(deg, "src")


def host_pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    broadcast_ranks: bool = False,
    checkpoint_every: int = 0,
) -> DataFrame:
    """PageRank over a (src, dst) host edge table.

    Returns (host, rank) for every node, after ``iters`` synchronous
    iterations of ``r' = (1-d)/n + d * sum_in(r_src / out_deg_src)``
    from a uniform start.  With the dangling self-loop patch the total
    mass stays 1 every iteration.

    ``broadcast_ranks=True`` hints the per-iteration rank table (and
    the contribution table, same cardinality) for broadcast joins —
    right when the node set fits in executor memory (up to ~10^7
    hosts): each iteration then costs exactly one shuffle (the dst
    aggregation) and the persisted edge partitioning is never touched.
    Beyond that, leave it False: ranks shuffle-join against the
    src-partitioned edges, which AQE keeps exchange-aligned across
    iterations.

    ``checkpoint_every=k`` truncates the rank lineage with an eager
    ``localCheckpoint`` every k iterations: the unrolled plan otherwise
    grows linearly with ``iters`` and long runs (30+ rounds at corpus
    scale) pay quadratic planning time and risk stack-depth limits.
    Same fixpoint, same values — only the lineage is cut.  Off by
    default so short oracle-matched runs keep a pure plan.
    """
    e = normalize_edges(edges)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    # iterated from the driver: persist what every round re-reads
    e = e.persist()
    nodes = nodes.persist()
    n = nodes.count()  # also materializes both caches

    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        contrib = (
            e.join(hint(ranks), e.src == ranks.host)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("c"))
        )
        ranks = (
            nodes.join(hint(contrib), nodes.host == contrib.dst, "left")
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def anchor_text_index(
    links: DataFrame,
    target_col: str = "media_ref",
    text_col: str = "text",
    doc_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Inbound anchor-text index: per target URL, in-degree, referring-
    doc count, and the top-``k`` anchor texts.

    The classic web-corpus quality/relevance signal (anchor text
    describes the *target*, not the source — the original web-search
    ranking feature), aggregated from extracted link spans.

    Returns (target, n_refs, n_docs, top_texts) with ``top_texts``
    ordered by (count desc, text asc) and capped at ``k`` — the cap is
    the skew guard: a hot target (a million inbound links) contributes
    at most its distinct-text rows to the final per-target pass, and
    the heavy first shuffle keys on (target, text), which fans a hot
    target out across reducers instead of pinning one.

    Shuffle profile: pair counts on (target, text); the distinct-doc
    and top-k branches then both key on target, so AQE reuses one
    target partitioning for the final join.
    """
    t = F.col(target_col).alias("target")
    pairs = (
        links.where(F.col(target_col).isNotNull())
        .groupBy(t, F.col(text_col).alias("text"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("target").orderBy(
        F.desc("cnt"), F.asc("text")
    )
    top = (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .groupBy("target")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rank"), F.col("text")))
                ),
                lambda s: s["text"],
            ).alias("top_texts")
        )
    )
    totals = (
        links.where(F.col(target_col).isNotNull())
        .groupBy(t)
        .agg(
            F.count("*").alias("n_refs"),
            F.count_distinct(F.col(doc_col)).alias("n_docs"),
        )
    )
    return totals.join(top, "target").select(
        "target", "n_refs", "n_docs", "top_texts"
    )
