"""Salted two-phase aggregation: correctness + plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web_content_extractor_spark.datagen import scale_corpus_rows
from web_content_extractor_spark.operators.assemble import explode_spans
from web_content_extractor_spark.operators.skew import (
    per_host_link_stats,
    salted_agg,
)
from web_content_extractor_spark.plans.pipeline import extract
from web_content_extractor_spark.schemas import DOCS


def test_salted_equals_plain_on_zipf_corpus(spark):
    """Salted rollup == plain groupBy on a Zipf-skewed host corpus."""
    rows = scale_corpus_rows(400, seed=7, n_hosts=8, pad_fraction=0.0)
    docs = spark.createDataFrame(rows, schema=DOCS)
    ex = explode_spans(extract(docs)).cache()
    salted = {
        r.domain: (r.n_links, r.n_pdf, r.n_youtube)
        for r in per_host_link_stats(ex, buckets=8).collect()
    }
    domain = F.regexp_replace(
        F.parse_url("media_ref", F.lit("HOST")), r"^www\.", ""
    )
    plain = {
        r.domain: (r.n, r.p, r.y)
        for r in ex.groupBy(domain.alias("domain"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("kind") == "pdf", 1).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("kind") == "youtube", 1).otherwise(0)).alias("y"),
        )
        .collect()
    }
    assert salted == plain
    # the Zipf head host really is hot (top host >> median)
    counts = sorted((v[0] for v in plain.values()), reverse=True)
    assert counts[0] > 3 * counts[len(counts) // 2]
    ex.unpersist()


def test_salted_plan_has_two_phases(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    out = salted_agg(df, "k", [("sum", "v", "s"), ("count", F.lit(1), "n")],
                     salt_from="v", buckets=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # two logical aggregation levels -> 4 HashAggregate nodes (each
    # groupBy plans partial+final) and exchanges keyed on (k, salt)
    # then (k)
    assert plan.count("HashAggregate") >= 4
    assert "pmod(xxhash64" in plan  # the salt key (renamed _groupingexpression)
    got = {r.k: (r.s, r.n) for r in out.collect()}
    assert got == {"0": (166833, 334), "1": (166167, 333), "2": (166500, 333)}


def test_salted_rejects_non_associative(spark):
    df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-associative"):
        salted_agg(df, "k", [("avg", "v", "a")], salt_from="v")
