"""corpus_health: exact vs approx (HLL) cardinality modes.

The exact mode is oracle-checked through the driver registry
(q_corpus_health); these tests pin the approx flag — same schema,
HLL estimates within rsd of the exact counts, and the plan actually
uses approx_count_distinct partials (no Expand multi-distinct)."""

from pyspark.sql import functions as F

from web_content_extractor_spark.operators.corpus import corpus_health


def _docs(spark, n=400):
    # 1 exact-dup pair per 10 docs, 4 sources, 3 langs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc text body "), (F.col("id") % (n * 9 // 10)).cast("string")
        ).alias("text"),
        (F.length(F.concat(F.lit("doc text body "),
                           (F.col("id") % (n * 9 // 10)).cast("string")))
         ).alias("n_chars"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("lang"),
    )


def test_exact_counts(spark):
    row = corpus_health(_docs(spark)).collect()[0]
    assert row.n_docs == 400
    assert row.n_unique == 360
    assert row.n_exact_dups == 40
    assert row.n_sources == 4 and row.n_langs == 3


def test_approx_within_rsd_and_same_schema(spark):
    exact = corpus_health(_docs(spark), approx=False)
    approx = corpus_health(_docs(spark), approx=True, rsd=0.02)
    assert approx.columns == exact.columns
    e, a = exact.collect()[0], approx.collect()[0]
    assert e.n_docs == a.n_docs and e.total_tokens == a.total_tokens
    # HLL++ at rsd=0.02: allow 3 sigma
    assert abs(a.n_unique - e.n_unique) <= max(3, 0.06 * e.n_unique)
    assert a.n_sources == 4 and a.n_langs == 3  # tiny cardinalities exact


def test_approx_dup_count_never_negative(spark):
    """HLL can overshoot count(*) on a fully-unique corpus; the report
    must clamp n_exact_dups at 0 instead of printing a negative count.
    (The overshoot itself isn't deterministic to provoke, so this pins
    the clamp on a fully-unique corpus across several rsd settings —
    any estimate above n_docs would go negative without it.)"""
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique doc "), F.col("id").cast("string")).alias(
            "text"
        ),
        F.lit(20).alias("n_chars"),
        F.lit("s0").alias("source"),
        F.lit("en").alias("lang"),
    )
    for rsd in (0.02, 0.05, 0.1, 0.2):
        row = corpus_health(docs, approx=True, rsd=rsd).collect()[0]
        assert row.n_exact_dups >= 0, f"negative dup count at rsd={rsd}"
        # the same overshoot must not leak through the sibling field:
        # n_unique > n_docs with dups = 0 is internally impossible
        assert row.n_unique <= row.n_docs, f"n_unique overshoot rsd={rsd}"


def test_approx_plan_uses_hll_not_expand(spark):
    exact_plan = corpus_health(_docs(spark))._jdf.queryExecution().toString()
    approx_plan = corpus_health(
        _docs(spark), approx=True
    )._jdf.queryExecution().toString()
    assert "approx_count_distinct" in approx_plan
    assert "approx_count_distinct" not in exact_plan
    # the exact multi-distinct needs Expand; the HLL path must not
    assert "Expand" not in approx_plan
