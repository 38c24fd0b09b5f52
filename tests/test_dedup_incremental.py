"""Ingest-time dedup of a new batch against an existing corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.operators.dedup_docs import (
    dedup_against_corpus,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedupAgainstCorpus:
    def test_corpus_dup_dropped_fresh_kept(self, spark):
        corpus = _df(spark, [(1, "old page"), (2, "other page")])
        batch = _df(spark, [(10, "old page"), (11, "brand new")])
        got = {r.doc_id for r in dedup_against_corpus(batch, corpus).collect()}
        assert got == {11}

    def test_in_batch_first_wins(self, spark):
        corpus = _df(spark, [(1, "old")])
        batch = _df(
            spark, [(12, "same body"), (10, "same body"), (11, "same body")]
        )
        got = dedup_against_corpus(batch, corpus).collect()
        assert [(r.doc_id) for r in got] == [10]

    def test_content_keyed_normalization(self, spark):
        # fingerprint lowercases + collapses whitespace: a re-crawled
        # page with cosmetic whitespace/case drift is still a dup.
        corpus = _df(spark, [(1, "Hello   World")])
        batch = _df(spark, [(10, "hello world"), (11, "hello  worlds")])
        got = {r.doc_id for r in dedup_against_corpus(batch, corpus).collect()}
        assert got == {11}

    def test_fp_column_returned_for_state_append(self, spark):
        corpus = _df(spark, [(1, "a")])
        batch = _df(spark, [(10, "b")])
        out = dedup_against_corpus(batch, corpus)
        assert set(out.columns) == {"doc_id", "text", "fp"}
        fp = out.collect()[0].fp
        assert isinstance(fp, str) and len(fp) == 32

    def test_empty_batch_and_disjoint_batch(self, spark):
        corpus = _df(spark, [(1, "a"), (2, "b")])
        empty = _df(spark, []).where(F.lit(False))
        assert dedup_against_corpus(empty, corpus).count() == 0
        fresh = _df(spark, [(10, "x"), (11, "y")])
        assert dedup_against_corpus(fresh, corpus).count() == 2


class TestResolveClusters:
    def test_longest_wins_min_id_tiebreak(self, spark):
        from web_content_extractor_spark.operators.dedup_docs import (
            resolve_clusters,
        )

        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5)],
            "doc_id long, n_chars long",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4)],
            "doc_id long, cluster_id long",
        )
        got = {
            r.doc_id: (r.cluster_size, r.is_canonical)
            for r in resolve_clusters(docs, clusters).collect()
        }
        # 2 and 3 tie on length -> min id 2 is canonical; singleton 4
        # is its own canonical
        assert got == {
            1: (3, False),
            2: (3, True),
            3: (3, False),
            4: (1, True),
        }

    def test_one_canonical_per_cluster(self, spark):
        from web_content_extractor_spark.operators.dedup_docs import (
            duplicate_clusters,
            resolve_clusters,
        )

        docs = spark.createDataFrame(
            [
                (i, "alpha beta gamma delta epsilon" + (" tail" if i % 2 else ""))
                for i in range(6)
            ]
            + [(10, "totally different words here entirely")],
            "doc_id long, text string",
        ).withColumn("n_chars", F.length("text").cast("long"))
        out = resolve_clusters(
            docs, duplicate_clusters(docs, min_jaccard=0.5)
        ).collect()
        per = {}
        for r in out:
            per.setdefault(r.cluster_id, []).append(r.is_canonical)
        assert all(sum(v) == 1 for v in per.values())
        assert len(out) == 7
