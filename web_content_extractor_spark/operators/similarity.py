"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- brute-force cosine top-k — the correctness baseline: broadcast the
  (small) query set, JVM-side dot products via zip_with/aggregate
  (no Python), window top-k.  Cost O(|Q| * N); at 100 TB you only run
  this for small query batches, which is exactly when the broadcast
  join is free of shuffles on the corpus side.
- LSH-bucketed (random hyperplanes) — the scale path: a deterministic
  seeded set of H hyperplanes maps every vector to an H-bit bucket;
  candidate search touches only matching buckets (equi-join on the
  bucket key).  Bits are computed natively from literal hyperplane
  arrays — again no Python in the hot path.

Embedding-cosine near-duplicate detection reuses the same kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # accumulate in double precision (float32 dot products drift vs
    # the DuckDB double-precision oracle).  Interpreted by Catalyst
    # (no codegen for HOF lambdas) — fine for one-off scalar dots like
    # lsh_bucket's literal planes, but NEVER the per-pair scorer in a
    # candidate join: that path benched 10-30x slower than the numpy
    # matmul kernels below, which all hot paths now use.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Collect the (small by contract) query side into (ids, matrix).

    The same pattern as the LSH hyperplanes / IVF centroids: the query
    set is an index artifact shipped in the kernel closure, so the
    corpus side streams through ONE scan with no q_vec carried through
    any join or shuffle.
    """
    rows = queries.select(id_col, vec_col).collect()
    ids = [r[0] for r in rows]
    Q = (
        np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 1))
    )
    return ids, Q


def _empty_topk(embeddings: DataFrame, id_col: str) -> DataFrame:
    id_type = dict(embeddings.dtypes)[id_col]
    return embeddings.sparkSession.createDataFrame(
        [],
        f"query_id {id_type}, neighbor_id {id_type}, cos_sim double, rank int",
    )


def _matrix_scorer(q_ids: list, Q: "np.ndarray", id_type: str, topk: int = 0):
    """mapInPandas scorer for candidate rows (query_id, neighbor_id,
    c_vec): cos_sim = row-normalized c_vec . normalized Q[query_id],
    one einsum per Arrow batch (no per-pair interpreted HOFs).

    ``topk`` > 0 additionally trims each batch to its per-query top-k
    by (cos desc, neighbor_id asc) — a map-side partial top-k, so the
    downstream global window shuffles O(batches * k) rows per query
    instead of every candidate.
    """
    QN = _norm_rows(Q)
    qindex = {qid: i for i, qid in enumerate(q_ids)}
    schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf["c_vec"]])
            )
            qi = np.fromiter(
                (qindex[q] for q in pdf["query_id"]),
                dtype=np.int64,
                count=len(pdf),
            )
            cos = np.round(np.einsum("ij,ij->i", V, QN[qi]), 6)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cos_sim": cos,
                }
            )
            if topk:
                out = (
                    out.sort_values(
                        ["query_id", "cos_sim", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(topk)
                )
            yield out

    return score, schema


def _window_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rank).

    ``queries`` must be small (collected into the kernel closure, the
    exact_near_duplicates pattern); self-matches excluded.  The corpus
    streams through one scan doing a (rows x dim) @ (dim x |Q|) float64
    matmul per Arrow batch with a per-batch partial top-k, then one
    window resolves the global top-k — the former crossJoin scored each
    pair with an interpreted aggregate(zip_with(...)), ~10-30x slower.
    """
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    QN = _norm_rows(Q).T  # (dim, m)
    id_type = dict(embeddings.dtypes)[id_col]
    qid_frame = pd.DataFrame({"query_id": q_ids})

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            cos = np.round(V @ QN, 6)  # (n, m)
            n, m = cos.shape
            out = pd.DataFrame(
                {
                    "query_id": np.tile(qid_frame["query_id"].to_numpy(), n),
                    "neighbor_id": np.repeat(pdf[id_col].to_numpy(), m),
                    "cos_sim": cos.ravel(),
                }
            )
            out = out[out["query_id"] != out["neighbor_id"]]
            yield (
                out.sort_values(
                    ["query_id", "cos_sim", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
    )
    return _window_topk(scored, k)


def exact_near_duplicates(
    corpus: DataFrame,
    batch: DataFrame,
    min_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dups of a (small) candidate batch vs the
    corpus: (batch_id, corpus_id, cos_sim >= min_cos), self excluded.

    The incremental-dedup shape: the (small by contract) batch is
    collected into the kernel closure — the same pattern as the LSH
    hyperplanes and IVF centroids — and the corpus streams through ONE
    scan doing a (rows x dim) @ (dim x |batch|) float64 matmul per
    Arrow chunk; no corpus shuffle, cost |batch| x N.  The equivalent
    crossJoin + per-pair zip_with/aggregate dot is interpreted by
    Catalyst and benched ~10x slower.  The threshold is applied to the
    6-dp-rounded value on both engine and SQL-oracle sides so float
    summation order can't flip the cut.
    """
    import pandas as pd

    brows = batch.select(id_col, vec_col).collect()
    if not brows:
        id_type = dict(corpus.dtypes)[id_col]
        return corpus.sparkSession.createDataFrame(
            [], f"batch_id {id_type}, corpus_id {id_type}, cos_sim double"
        )
    b_ids = [r[0] for r in brows]
    B = np.stack([np.asarray(r[1], dtype=np.float64) for r in brows])
    Bn = _norm_rows(B).T  # (dim, m); zero-norm guard shared w/ IVF path

    def score(batches):
        for pdf in batches:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) if len(pdf) else np.zeros((0, Bn.shape[0]))
            if len(pdf):
                V = _norm_rows(V)
            cos = np.round(V @ Bn, 6)  # (n, m)
            ids = pdf[id_col].to_numpy()
            rows_i, cols_j = np.nonzero(cos >= min_cos)
            out = {
                "batch_id": [b_ids[j] for j in cols_j],
                "corpus_id": [ids[i] for i in rows_i],
                "cos_sim": [float(cos[i, j]) for i, j in zip(rows_i, cols_j)],
            }
            pdf_out = pd.DataFrame(out, columns=["batch_id", "corpus_id", "cos_sim"])
            yield pdf_out[pdf_out["batch_id"] != pdf_out["corpus_id"]]

    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        score,
        schema=f"batch_id {id_type}, corpus_id {id_type}, cos_sim double",
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (public LSH construction)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """H-bit signature bucket id for a vector, computed natively."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1).otherwise(0)
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out.cast("bigint")


def lsh_buckets(
    vec: Column, planes: list[list[float]], r: int, tables: int
) -> Column:
    """OR-amplified multi-table buckets: array of `tables` bucket ids,
    table t built from planes [t*r, (t+1)*r).  A pair is a candidate if
    it collides in ANY table — the standard recall amplification for
    random-hyperplane LSH (prob 1-(1-p^r)^L for per-plane agreement p).

    Computed by a vectorized numpy Pandas UDF: one (batch x dim) @
    (dim x H) matmul + bit packing.  The pure-Column form (H nested
    aggregate/zip_with dot products per row) is interpreted by Catalyst
    and benched ~10x slower; :func:`lsh_bucket` keeps the native
    single-table reference implementation.
    """
    P = np.asarray(planes, dtype=np.float64)  # (H, dim), H = r*tables
    weights = (1 << np.arange(r - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf("array<bigint>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        bits = (V @ P.T) >= 0.0  # (n, H); sign rule matches lsh_bucket
        bm = bits.reshape(len(vs), -1, r).astype(np.int64) @ weights
        return pd.Series(list(bm))

    return _buckets(vec)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    r: int = 4,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Candidates = union over tables of same-bucket rows (deduped), so the
    corpus-side cost is |tables| bucket probes instead of a full scan;
    tests measure recall vs brute force.
    """
    planes = hyperplanes(dim, r * tables, seed)
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    id_type = dict(embeddings.dtypes)[id_col]
    # query buckets computed driver-side with the SAME numpy formula as
    # the corpus-side lsh_buckets kernel (sign rule + bit packing), so
    # no q_vec ever enters the join: the probe table is (query_id,
    # table, bucket) rows only
    P = np.asarray(planes, dtype=np.float64)
    weights = (1 << np.arange(r - 1, -1, -1)).astype(np.int64)
    bits = (Q @ P.T) >= 0.0
    bm = bits.reshape(len(q_ids), tables, r).astype(np.int64) @ weights
    q = embeddings.sparkSession.createDataFrame(
        [
            (qid, int(t), int(bm[i, t]))
            for i, qid in enumerate(q_ids)
            for t in range(tables)
        ],
        f"query_id {id_type}, table int, bucket bigint",
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.posexplode(lsh_buckets(F.col(vec_col), planes, r, tables)).alias(
            "table", "bucket"
        ),
    )
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "c_vec")
    )
    score, schema = _matrix_scorer(q_ids, Q, id_type, topk=k)
    return _window_topk(cand.mapInPandas(score, schema=schema), k)


def _norm_rows(M: "np.ndarray") -> "np.ndarray":
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _assign_udf(C: "np.ndarray"):
    """Nearest-centroid assignment (cosine / spherical): one
    (batch x dim) @ (dim x k) matmul per Arrow batch."""
    Cn = _norm_rows(np.asarray(C, dtype=np.float64)).T  # (dim, k)

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        V = _norm_rows(np.stack([np.asarray(v, dtype=np.float64) for v in vs]))
        return pd.Series(np.argmax(V @ Cn, axis=1).astype(np.int32))

    return _assign


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int | None = 4096,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: spherical k-means.

    Init = random-partition (pmod(xxhash64(id), k) — deterministic,
    balanced); then ``iters`` Lloyd rounds of numpy matmul assignment
    + per-cell mean, an empty cell keeping its previous centroid.

    ``sample`` (default 4096, the same knob and hash-sample as
    ``pq_train``) trains on the ``sample`` lowest-xxhash64(id) rows,
    collected ONCE and iterated driver-side in numpy: a quantizer is
    an index artifact, and training it on more than a bounded sample
    is wasted corpus passes at 10^9+ rows — one TakeOrdered job
    replaces ``1 + 2*iters`` distributed passes (measured: the build
    was a third of ivf_topk's bench time at sf0.1, all of it per-job
    overhead on a 2k-row table).  When the table has at most
    ``sample`` rows the sample IS the corpus and the Lloyd trajectory
    matches the distributed path's exactly, up to float summation
    order.  ``sample=None`` trains distributed on the full corpus:
    per-round map-side partial sums (at most k x dim floats per
    partition reach the driver — no shuffle), for when the quantizer
    must see every row.
    """

    import pandas as pd

    if sample is not None:
        rows = (
            embeddings.select(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids))
                .cast("int")
                .alias("cid"),
                F.col(vec_col).alias("v"),
                F.xxhash64(F.col(id_col)).alias("h"),
            )
            .orderBy("h", "v")
            .limit(sample)
            .collect()
        )
        if not rows:
            raise ValueError(
                "ivf_build: empty embeddings input (nothing to index)"
            )
        V = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
        dim = V.shape[1]

        def np_means(
            cids: "np.ndarray", prev: "np.ndarray | None"
        ) -> "np.ndarray":
            out = np.zeros((n_centroids, dim))
            for c in range(n_centroids):
                sel = V[cids == c]
                if len(sel):
                    out[c] = sel.mean(axis=0)
                elif prev is not None:  # empty cell keeps its centroid
                    out[c] = prev[c]
            return out

        C = np_means(np.array([r.cid for r in rows]), None)
        Vn = _norm_rows(V)
        for _ in range(iters):
            a = np.argmax(Vn @ _norm_rows(C).T, axis=1)
            C = np_means(a, C)
        return [list(c) for c in C]

    def means(assigned: DataFrame, prev: list[list[float]] | None) -> list[list[float]]:
        # map-side partial sums: each partition reduces its vectors to
        # at most n_centroids (cid, count, sum-vector) rows in numpy —
        # ONE narrow pass, no shuffle, driver combines <= k * P partials
        # (the posexplode -> groupBy(cid, pos) alternative shuffles
        # n x dim scalar rows per round)
        def partials(batches):
            acc: dict[int, list] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                cids = pdf["cid"].to_numpy()
                for c in np.unique(cids):
                    sel = V[cids == c]
                    if int(c) in acc:
                        acc[int(c)][0] += len(sel)
                        acc[int(c)][1] += sel.sum(axis=0)
                    else:
                        acc[int(c)] = [len(sel), sel.sum(axis=0)]
            if acc:  # an all-empty partition must yield NOTHING: an
                # empty frame defaults to float64 columns, which Arrow
                # cannot convert to the declared list<double> vsum type
                yield pd.DataFrame(
                    {
                        "cid": list(acc),
                        "cnt": [v[0] for v in acc.values()],
                        "vsum": [v[1] for v in acc.values()],
                    }
                )

        rows = assigned.mapInPandas(
            partials, schema="cid int, cnt long, vsum array<double>"
        ).collect()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in rows:
            v = np.asarray(r.vsum, dtype=np.float64)
            sums[r.cid] = sums.get(r.cid, 0) + v
            counts[r.cid] = counts.get(r.cid, 0) + r.cnt
        if not sums:
            raise ValueError(
                "ivf_build: empty embeddings input (nothing to index)"
            )
        dim = len(next(iter(sums.values())))
        out = []
        for c in range(n_centroids):
            if c in sums:
                out.append(list(sums[c] / counts[c]))
            else:  # empty cluster keeps its previous centroid
                out.append(list(prev[c]) if prev else [0.0] * dim)
        return out

    init = embeddings.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids))
        .cast("int")
        .alias("cid"),
        F.col(vec_col),
    )
    C = means(init, None)
    for _ in range(iters):
        assigned = embeddings.select(
            _assign_udf(C)(F.col(vec_col)).alias("cid"), F.col(vec_col)
        )
        C = means(assigned, C)
    return C


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int | None = 4096,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``nprobe`` nearest inverted
    lists per query instead of scanning the corpus.

    Search cost ~= nprobe/n_centroids of a full scan: the corpus is
    partitioned once by coarse-quantizer cell (a single int per vector
    — at 10^12 docs the natural Iceberg partition/bucket key, making
    probes partition-pruned scans), and each query broadcast-joins only
    its probed cells.  Recall is tuned by nprobe; tests measure it
    against brute force.
    """
    # collect the (small) query side FIRST: an empty query set must
    # not pay the corpus-wide k-means index build
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    C = ivf_build(embeddings, n_centroids, iters, id_col, vec_col, sample)
    assign = _assign_udf(C)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        assign(F.col(vec_col)).alias("cid"),
    )
    Cn = _norm_rows(np.asarray(C, dtype=np.float64)).T
    id_type = dict(embeddings.dtypes)[id_col]
    # probe selection driver-side (the query set is collected anyway for
    # the scoring matrix); the probe table joined onto the corpus is
    # (query_id, cid) rows only, never a vector
    q = _probe_table(
        embeddings, q_ids, _norm_rows(Q), Cn, nprobe, n_centroids, id_type
    )
    cand = (
        c.join(F.broadcast(q), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "c_vec")
    )
    score, schema = _matrix_scorer(q_ids, Q, id_type, topk=k)
    return _window_topk(cand.mapInPandas(score, schema=schema), k)


def _probe_table(
    embeddings: DataFrame,
    q_ids: list,
    QN: "np.ndarray",
    Cn: "np.ndarray",
    nprobe: int,
    n_centroids: int,
    id_type: str,
) -> DataFrame:
    """(query_id, cid) rows for each query's nprobe nearest coarse
    cells — the tiny routing table ivf_topk and ivfpq_topk broadcast
    onto the cell-keyed corpus."""
    npb = min(nprobe, n_centroids)
    order = np.argsort(-(QN @ Cn), axis=1)[:, :npb]
    return embeddings.sparkSession.createDataFrame(
        [
            (qid, int(order[i, p]))
            for i, qid in enumerate(q_ids)
            for p in range(order.shape[1])
        ],
        f"query_id {id_type}, cid int",
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    min_cos: float = 0.95,
    r: int = 6,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by embedding cosine, multi-table LSH self-join.

    At min_cos 0.95 (angle ~18deg, per-plane agreement ~0.9) the r=6 /
    L=6 configuration catches a true near-dup pair with prob ~0.98
    while keeping bucket sizes ~n/2^6 per table.
    """
    planes = hyperplanes(dim, r * tables, seed)
    # id-only band self-join (the minhash band-join shape,
    # dedup_docs.py): the (table, bucket) shuffle carries two ids per
    # row, never the vectors — carrying both vectors multiplied shuffle
    # bytes by dim x L tables.  Vectors re-attach by id join after the
    # pair dedup, then one numpy kernel scores each pair row-wise.
    d = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(lsh_buckets(F.col(vec_col), planes, r, tables)).alias(
            "table", "bucket"
        ),
    )
    lhs = d.select(F.col("id").alias("id_a"), "table", "bucket")
    rhs = d.select(F.col("id").alias("id_b"), "table", "bucket")
    pairs = (
        lhs.join(rhs, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    withv = pairs.join(va, "id_a").join(vb, "id_b")
    id_type = dict(embeddings.dtypes)[id_col]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec_a"]])
            )
            B = _norm_rows(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec_b"]])
            )
            cos = np.round(np.einsum("ij,ij->i", A, B), 6)
            out = pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy(),
                    "id_b": pdf["id_b"].to_numpy(),
                    "cos_sim": cos,
                }
            )
            yield out[out["cos_sim"] >= min_cos]

    return withv.mapInPandas(
        score, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def semantic_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 200_000,
    sample: int | None = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means + within-
    cluster cosine pruning.

    The spherical-kmeans coarse quantizer (``ivf_build``, shared with
    the IVF ANN index) assigns every vector a cluster; within each
    cluster a greedy id-ordered sweep keeps a vector only if its cosine
    to every already-kept vector is < ``threshold``.  Greedy-by-id is
    deterministic and order-independent of partitioning — the same
    keep/drop set on every run and every cluster layout.

    Returns one row per vector: (id, cid, kept, dup_of, max_kept_sim)
    where ``dup_of`` is the kept vector that shadowed a dropped one
    (NULL for kept rows) and ``max_kept_sim`` the max cosine to any
    kept vector seen before it (0.0 for the first of its cluster).

    Scale shape: ONE shuffle, on cid — pairwise work never crosses
    clusters, which is the entire point of SemDeDup vs all-pairs.  At
    10^12 docs you build the quantizer from a sample and raise
    ``n_centroids`` so clusters stay bounded; the per-cluster cost is
    O(m^2) flops as one numpy gram matrix.  ``max_cluster_rows`` is an
    explicit skew guard: a cluster above it raises (undersized k or a
    degenerate embedding space) instead of silently OOM-ing an
    executor.
    """
    C = ivf_build(embeddings, n_centroids, iters, id_col, vec_col, sample)
    assigned = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _assign_udf(C)(F.col(vec_col)).alias("cid"),
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_cluster_rows:
            raise ValueError(
                f"semantic_duplicates: cluster of {m} rows exceeds "
                f"max_cluster_rows={max_cluster_rows}; raise n_centroids"
            )
        pdf = pdf.sort_values("id").reset_index(drop=True)
        V = _norm_rows(
            np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        )
        kept: list[int] = []
        keep_flags, dup_of, max_sim = [], [], []
        for i in range(m):
            if kept:
                sims = V[kept] @ V[i]
                j = int(np.argmax(sims))
                mx = float(sims[j])
            else:
                mx = 0.0
            ok = mx < threshold
            keep_flags.append(ok)
            # object dtype keeps None + the id's native type (int OR
            # string) intact through the Arrow conversion
            dup_of.append(None if ok else pdf["id"].iloc[kept[j]])
            max_sim.append(round(mx, 6))
            if ok:
                kept.append(i)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cid": pdf["cid"],
                "kept": keep_flags,
                "dup_of": pd.Series(dup_of, dtype=object),
                "max_kept_sim": max_sim,
            }
        )

    # derive the id field type from the input (string vec_ids must not
    # silently coerce at the Arrow boundary); dup_of shares it
    id_type = dict(embeddings.dtypes)[id_col]
    return assigned.groupBy("cid").applyInPandas(
        prune,
        schema=(
            f"id {id_type}, cid int, kept boolean, "
            f"dup_of {id_type}, max_kept_sim double"
        ),
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Train product-quantization codebooks: (m, n_codes, dim/m).

    The vector space is split into ``m`` contiguous subspaces and each
    subspace gets its own ``n_codes``-entry k-means codebook, so a
    vector compresses to ``m`` small integers (1 byte each at
    n_codes<=256) — a 64-dim float32 embedding shrinks 32x.  Training
    runs driver-side in numpy over a DETERMINISTIC sample (the
    ``sample`` lowest xxhash64(id) rows — a TakeOrdered, no shuffle of
    the corpus): codebooks are an index artifact like the IVF
    centroids and LSH hyperplanes above; at real corpus scale you
    never train a quantizer on more than a sample anyway.
    """
    rows = (
        embeddings.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col)).alias("h"),
        )
        .orderBy("h", "v")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty embeddings input")
    X = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(n_codes, len(X))
    rng = np.random.RandomState(seed)
    books = np.zeros((m, n_codes, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[rng.choice(len(Xs), size=k, replace=False)].copy()
        for _ in range(iters):
            # squared L2 assignment: ||x||^2 - 2 x.c + ||c||^2
            d2 = (
                (Xs * Xs).sum(axis=1, keepdims=True)
                - 2.0 * (Xs @ C.T)
                + (C * C).sum(axis=1)
            )
            a = np.argmin(d2, axis=1)
            for c in range(k):
                sel = Xs[a == c]
                if len(sel):
                    C[c] = sel.mean(axis=0)  # empty cell keeps centroid
        books[s, :k] = C
        if k < n_codes:  # degenerate tiny input: pad with the last cell
            books[s, k:] = C[-1]
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its PQ codes + exact norm — ONE narrow
    mapInPandas pass, no shuffle.  Output (id, codes array<int>,
    vnorm): ``codes[s]`` indexes ``codebooks[s]``; ``vnorm`` is kept
    exact so ADC scoring can return true-denominator cosine.  At
    10^12 docs this codes table (m bytes + 8) IS the resident index;
    the float vectors stay cold in object storage.
    """
    B = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, dsub)
    m, _, dsub = B.shape
    Bn2 = (B * B).sum(axis=2)  # (m, n_codes)
    id_type = dict(embeddings.dtypes)[id_col]

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            S = V.reshape(len(V), m, dsub)
            # (n, m, n_codes) distances via one einsum per term
            d2 = Bn2[None, :, :] - 2.0 * np.einsum("nsd,scd->nsc", S, B)
            codes = np.argmin(d2, axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "vnorm": np.linalg.norm(V, axis=1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        enc, schema=f"id {id_type}, codes array<int>, vnorm double"
    )


def _adc_lut(QN: "np.ndarray", books: "np.ndarray"):
    """Flattened ADC lookup tables for a normalized query matrix:
    LUT[i, s*n_codes + c] = q_i[subspace s] . books[s, c], plus the
    per-subspace flat offsets — approx_dot(q_i, x) is then m gathers
    ``LUT[i, codes(x) + offs].sum()`` (never a float-vector read)."""
    B = np.asarray(books, dtype=np.float64)
    m, ncb, dsub = B.shape
    LUT = np.einsum(
        "qsd,scd->qsc", QN.reshape(len(QN), m, dsub), B
    ).reshape(len(QN), -1)
    offs = (np.arange(m) * ncb).astype(np.int64)
    return LUT, offs


def _adc_cut_and_rerank(
    scored: DataFrame,
    keep: int,
    embeddings: DataFrame,
    q_ids: list,
    Q: "np.ndarray",
    id_type: str,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC tail: global quantized-score cut to ``keep``
    candidates per query, then the exact cosine re-rank.  The
    candidate set is bounded at |Q| * keep id-pairs — broadcast it so
    the float-vector table is never shuffled for the re-rank."""
    cand = (
        scored.withColumn(
            "arank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("adc_cos"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("arank") <= keep)
        .select("query_id", "neighbor_id")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    score, schema = _matrix_scorer(q_ids, Q, id_type, topk=k)
    rescored = F.broadcast(cand).join(vecs, "neighbor_id").mapInPandas(
        score, schema=schema
    )
    return _window_topk(rescored, k)


class ANNIndex:
    """A built ANN index: the tiny driver-side model artifacts plus the
    distributed codes table.  Build ONCE (``pq_index`` / ``ivfpq_index``
    — persist or write ``codes`` to parquet/Iceberg), search MANY
    (``pq_search`` / ``ivfpq_search``): the production regime, where
    per-batch search cost excludes training and encoding entirely."""

    def __init__(self, books, codes: DataFrame, centroids=None):
        self.books = books        # (m, n_codes, dim/m)
        self.codes = codes        # (id[, cid], codes, vnorm)
        self.centroids = centroids  # (kc, dim) for IVF routing, or None


def pq_index(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ANNIndex:
    """Train codebooks + encode the corpus: the flat (no-routing) PQ
    index.  ``codes`` is one narrow pass over the corpus."""
    books = pq_train(
        embeddings, m, n_codes, iters, sample, seed, id_col, vec_col
    )
    return ANNIndex(books, pq_encode(embeddings, books, id_col, vec_col))


def pq_search(
    index: ANNIndex,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC scan of a built PQ index + exact re-rank (``embeddings`` is
    read only for the refine*k candidate vectors)."""
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    return _pq_search_collected(
        index, embeddings, q_ids, Q, k, refine, id_col, vec_col
    )


def _pq_search_collected(
    index: ANNIndex,
    embeddings: DataFrame,
    q_ids: list,
    Q: "np.ndarray",
    k: int,
    refine: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    QN = _norm_rows(Q)
    LUT, offs = _adc_lut(QN, index.books)
    nq = len(q_ids)
    keep = refine * k
    id_type = dict(embeddings.dtypes)[id_col]
    q_arr = np.asarray(q_ids, dtype=object)

    def adc(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64) + offs
            vn = pdf["vnorm"].to_numpy()
            vn = np.where(vn == 0.0, 1.0, vn)
            cos = LUT[:, C].sum(axis=2) / vn  # (q, n)
            ids = pdf["id"].to_numpy()
            # mask self-matches BEFORE the cut so the query's own row
            # never consumes one of its refine*k candidate slots
            cos = np.where(ids[None, :] == q_arr[:, None], -np.inf, cos)
            cut = min(keep, n)
            # per-query partial top-k inside the batch (argpartition
            # then exact ordering happens at the re-rank)
            part = np.argpartition(-cos, cut - 1, axis=1)[:, :cut]
            qi = np.repeat(np.arange(nq), cut)
            ni = part.ravel()
            vals = cos[qi, ni]
            keep_mask = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": q_arr[qi][keep_mask],
                    "neighbor_id": ids[ni][keep_mask],
                    "adc_cos": np.round(vals[keep_mask], 6),
                }
            )

    scored = index.codes.mapInPandas(
        adc,
        schema=f"query_id {id_type}, neighbor_id {id_type}, adc_cos double",
    )
    return _adc_cut_and_rerank(
        scored, keep, embeddings, q_ids, Q, id_type, k, id_col, vec_col
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample: int = 4096,
    refine: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric-distance PQ scan + exact
    re-rank (the IVF-PQ refinement stage, minus the IVF routing —
    :func:`ivfpq_topk` composes both).

    One-shot convenience: builds the index and searches it once.  For
    repeated query batches build with :func:`pq_index`, persist
    ``index.codes``, and call :func:`pq_search` — search cost then
    excludes training/encoding entirely (the resident-index regime;
    measured in BENCH.md "ANN crossover").

    Scan phase: each query builds an (m x n_codes) lookup table of
    subspace dot products against the codebooks; scoring a corpus
    vector is m table gathers + a sum over its byte codes — never a
    float-vector read.  The scan emits ``refine * k`` candidates per
    query (map-side partial top-k, so the shuffle is O(batches *
    refine * k) rows), then the exact cosine re-ranks those few
    candidates from their true vectors.  ``refine`` >= corpus/k
    degenerates to brute force — the correctness anchor in tests.
    """
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    index = pq_index(
        embeddings, m, n_codes, iters, sample, seed, id_col, vec_col
    )
    return _pq_search_collected(
        index, embeddings, q_ids, Q, k, refine, id_col, vec_col
    )


def ivfpq_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    m: int = 16,
    n_codes: int = 32,
    pq_iters: int = 5,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ANNIndex:
    """IVF+PQ index: coarse centroids + codebooks trained, then ONE
    fused narrow pass encodes every vector to (cid, codes, vnorm).
    ``cid`` is the partition/bucket key to lay the codes table out by
    at real scale (probes become partition-pruned scans)."""
    C = ivf_build(embeddings, n_centroids, iters, id_col, vec_col, sample)
    books = pq_train(
        embeddings, m, n_codes, pq_iters, sample, seed, id_col, vec_col
    )
    id_type = dict(embeddings.dtypes)[id_col]
    Cn = _norm_rows(np.asarray(C, dtype=np.float64)).T  # (dim, kc)
    B = np.asarray(books, dtype=np.float64)
    mm, _, dsub = B.shape
    Bn2 = (B * B).sum(axis=2)

    def build_index(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cid = np.argmax(_norm_rows(V) @ Cn, axis=1).astype(np.int32)
            S = V.reshape(len(V), mm, dsub)
            d2 = Bn2[None, :, :] - 2.0 * np.einsum("nsd,scd->nsc", S, B)
            codes = np.argmin(d2, axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cid": cid,
                    "codes": list(codes),
                    "vnorm": np.linalg.norm(V, axis=1),
                }
            )

    codes = embeddings.select(id_col, vec_col).mapInPandas(
        build_index,
        schema=f"id {id_type}, cid int, codes array<int>, vnorm double",
    )
    return ANNIndex(books, codes, centroids=np.asarray(C, dtype=np.float64))


def ivfpq_search(
    index: ANNIndex,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a built IVF+PQ index: broadcast the (query, cid) probe
    table onto the cell-keyed codes, ADC-score only probed rows, exact
    re-rank the refine*k survivors."""
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    return _ivfpq_search_collected(
        index, embeddings, q_ids, Q, k, nprobe, refine, id_col, vec_col
    )


def _ivfpq_search_collected(
    index: ANNIndex,
    embeddings: DataFrame,
    q_ids: list,
    Q: "np.ndarray",
    k: int,
    nprobe: int,
    refine: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    id_type = dict(embeddings.dtypes)[id_col]
    n_centroids = len(index.centroids)
    Cn = _norm_rows(index.centroids).T
    QN = _norm_rows(Q)
    probes = _probe_table(
        embeddings, q_ids, QN, Cn, nprobe, n_centroids, id_type
    )
    LUT, offs = _adc_lut(QN, index.books)
    qindex = {qid: i for i, qid in enumerate(q_ids)}
    keep = refine * k

    def adc(batches):
        # pair-wise form of pq_search's matrix ADC: after the probe
        # join each row already carries its query, so the gather is
        # indexed per row instead of broadcast over all queries
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            Cc = np.stack(pdf["codes"].to_numpy()).astype(np.int64) + offs
            qi = np.fromiter(
                (qindex[q] for q in pdf["query_id"]),
                dtype=np.int64,
                count=n,
            )
            vn = pdf["vnorm"].to_numpy()
            vn = np.where(vn == 0.0, 1.0, vn)
            cos = LUT[qi[:, None], Cc].sum(axis=1) / vn
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["id"].to_numpy(),
                    "adc_cos": np.round(cos, 6),
                }
            )
            # self-matches dropped BEFORE the per-batch cut (same slot
            # rule as pq_search's mask)
            out = out[out["query_id"] != out["neighbor_id"]]
            out = (
                out.sort_values(
                    ["query_id", "adc_cos", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(keep)
            )
            yield out

    scored = index.codes.join(F.broadcast(probes), "cid").mapInPandas(
        adc,
        schema=f"query_id {id_type}, neighbor_id {id_type}, adc_cos double",
    )
    return _adc_cut_and_rerank(
        scored, keep, embeddings, q_ids, Q, id_type, k, id_col, vec_col
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    m: int = 16,
    n_codes: int = 32,
    pq_iters: int = 5,
    sample: int = 4096,
    refine: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ composition — the standard billion-scale ANN
    architecture: IVF routing bounds WHICH rows each query touches
    (nprobe of n_centroids inverted lists, cell id = the natural
    Iceberg partition/bucket key at 10^12 docs, so probes are
    partition-pruned scans), PQ codes bound WHAT a touched row costs
    (m byte-gathers instead of a dim-float read — the resident index
    is m bytes + a norm per vector), and the exact re-rank of the
    refine*k ADC survivors restores true-cosine ordering.

    One-shot convenience over :func:`ivfpq_index` +
    :func:`ivfpq_search`; build once / search many for repeated query
    batches (persist ``index.codes``, ideally partitioned by cid).
    """
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if not q_ids:
        return _empty_topk(embeddings, id_col)
    index = ivfpq_index(
        embeddings, n_centroids, iters, m, n_codes, pq_iters, sample,
        seed, id_col, vec_col,
    )
    return _ivfpq_search_collected(
        index, embeddings, q_ids, Q, k, nprobe, refine, id_col, vec_col
    )
