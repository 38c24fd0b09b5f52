"""Skew handling: explicit key salting for hot-key aggregations.

North-rule requirement ("explicit salting of skewed hosts ... AQE
skew-join handling").  Web corpora are Zipf-distributed over hosts: a
handful of giant hosts would pin their entire groups on single reduce
tasks.  The classic fix is two-phase aggregation over a salted key:

    groupBy(key, salt) partial-agg   -- salt splits a hot key across
                                        `buckets` reducers
    groupBy(key)       final-agg     -- tiny: one row per (key, salt)

Works for any associative aggregate (count/sum/min/max).  AQE's
skewJoin handles the join-side analog at runtime (session.py turns it
on); this operator covers the aggregation side, which AQE does not
rebalance.

Salt must be deterministic per ROW (not per key) and uniform: derived
by hashing a high-cardinality companion column (e.g. doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: associative aggregates: (partial expr builder, final expr builder)
_ASSOC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, Column | str, str]],
    salt_from: Column | str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of (fn, col, alias) with fn in
    count/sum/min/max.  Result is identical to
    ``df.groupBy(key).agg(...)`` but a hot key's partial work spreads
    over ``buckets`` reduce tasks.
    """
    salt = F.pmod(F.xxhash64(salt_from), F.lit(buckets)).alias("_salt")
    partial_cols = []
    final_cols = []
    for fn, col, alias in aggs:
        if fn not in _ASSOC:
            raise ValueError(f"non-associative aggregate {fn!r}; "
                             f"supported: {sorted(_ASSOC)}")
        part, final = _ASSOC[fn]
        partial_cols.append(part(col).alias(f"_p_{alias}"))
        final_cols.append(final(f"_p_{alias}").alias(alias))
    return (
        df.groupBy(F.col(key), salt)
        .agg(*partial_cols)
        .groupBy(key)
        .agg(*final_cols)
    )


def per_host_link_stats(
    exploded_spans: DataFrame, buckets: int = 16
) -> DataFrame:
    """Per-host link rollup of an exploded span frame, salted.

    The concrete skewed aggregation of this engine: host keys follow
    the corpus' Zipf law, doc_id provides the uniform salt.
    Returns (domain, n_links, n_pdf, n_youtube).
    """
    domain = F.regexp_replace(
        F.parse_url("media_ref", F.lit("HOST")), r"^www\.", ""
    ).alias("domain")
    df = exploded_spans.select(
        domain,
        "doc_id",
        F.when(F.col("kind") == "pdf", 1).otherwise(0).alias("_is_pdf"),
        F.when(F.col("kind") == "youtube", 1).otherwise(0).alias("_is_yt"),
    )
    return salted_agg(
        df,
        "domain",
        [
            ("count", F.lit(1), "n_links"),
            ("sum", "_is_pdf", "n_pdf"),
            ("sum", "_is_yt", "n_youtube"),
        ],
        salt_from="doc_id",
        buckets=buckets,
    )
