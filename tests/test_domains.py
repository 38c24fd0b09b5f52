"""Domain-level curation (operators/domains.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.operators.domains import (
    domain_curate,
    domain_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, domain string, q double")


class TestDomainStats:
    def test_verdicts_split_by_mean_quality(self, spark):
        rows = [(i, "good.com", 80.0) for i in range(10)]
        rows += [(100 + i, "spam.com", 5.0) for i in range(10)]
        got = {
            r.domain: (r.n_docs, r.mean_q, r.keep_domain)
            for r in domain_stats(
                _docs(spark, rows), min_docs=10, min_mean_quality=33.5
            ).collect()
        }
        assert got == {
            "good.com": (10, 80.0, True),
            "spam.com": (10, 5.0, False),
        }

    def test_insufficient_evidence_keeps_domain(self, spark):
        # 3 terrible docs are a sample-size artifact, not a spam farm
        rows = [(i, "tiny.com", 0.0) for i in range(3)]
        rows += [(10 + i, "bad.com", 0.0) for i in range(10)]
        got = {
            r.domain: r.keep_domain
            for r in domain_stats(
                _docs(spark, rows), min_docs=10, min_mean_quality=33.5
            ).collect()
        }
        assert got == {"tiny.com": True, "bad.com": False}

    def test_low_frac_gate(self, spark):
        # high mean but two-thirds of docs below the low bar -> drop
        # when max_low_frac is configured, keep when it is not
        rows = [(0, "mix.com", 99.0), (1, "mix.com", 24.0), (2, "mix.com", 24.0)]
        kw = dict(min_docs=3, min_mean_quality=33.5, low_quality=25.0)
        stats = domain_stats(_docs(spark, rows), **kw).collect()[0]
        assert stats.mean_q == 49.0 and stats.low_frac == 0.666667
        assert stats.keep_domain is True
        gated = domain_stats(
            _docs(spark, rows), max_low_frac=0.5, **kw
        ).collect()[0]
        assert gated.keep_domain is False

    def test_empty_input(self, spark):
        assert domain_stats(_docs(spark, [])).count() == 0


class TestDomainCurate:
    def test_drops_only_dropped_domain_docs(self, spark):
        rows = [(i, "good.com", 80.0) for i in range(10)]
        rows += [(100 + i, "spam.com", 5.0) for i in range(10)]
        rows += [(200, "tiny.com", 0.0)]  # under min_docs -> kept
        kept = domain_curate(
            _docs(spark, rows), min_docs=10, min_mean_quality=33.5
        )
        ids = sorted(r.doc_id for r in kept.collect())
        assert ids == list(range(10)) + [200]

    def test_precomputed_stats_reused(self, spark):
        base = _docs(spark, [(0, "a.com", 0.0), (1, "b.com", 99.0)])
        stats = domain_stats(base, min_docs=1, min_mean_quality=33.5)
        other = _docs(spark, [(7, "a.com", 99.0), (8, "b.com", 99.0)])
        # verdicts come from BASE evidence, applied to OTHER corpus
        ids = sorted(
            r.doc_id for r in domain_curate(other, stats=stats).collect()
        )
        assert ids == [8]

    def test_all_kept_is_identity(self, spark):
        base = _docs(spark, [(i, f"d{i}.com", 90.0) for i in range(5)])
        assert domain_curate(base, min_docs=1).count() == 5


def test_driver_query_matches_operator(spark):
    # the registry entry composes quality_score + domain_stats; pin the
    # composition end-to-end on the smallest sf
    import __spark_entry__ as contract

    df = contract.queries()["domain_curation"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 500  # one row per document, both verdict arms
    keeps = {r.keep_domain for r in rows}
    assert keeps == {True, False}, "threshold should split the corpus"
    # verdict consistency: every row of one domain carries one verdict
    per_domain = {}
    for r in rows:
        per_domain.setdefault(r.domain, set()).add(
            (r.n_docs, r.mean_q, r.keep_domain)
        )
    assert all(len(v) == 1 for v in per_domain.values())
