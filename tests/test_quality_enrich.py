"""Tests for the C4/Gopher quality filter battery and stream-static
enrichment join."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from web_content_extractor_spark.functions import text_quality as tq
from web_content_extractor_spark.streaming.incremental import enrich_stream


def _signals(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: bigint, text: string"
    )
    s = tq.quality_signals(F.col("text"))
    rows = docs.select(
        "doc_id",
        *[v.alias(k) for k, v in s.items()],
        tq.quality_filter(F.col("text")).alias("keep"),
    ).collect()
    return {r.doc_id: r for r in rows}


def test_quality_filter_battery_hand_cases(spark):
    good = " ".join(["word"] * 60)
    out = _signals(
        spark,
        [
            good,                                   # 0: kept
            "too short",                            # 1: word-count floor
            good + " lorem ipsum",                  # 2: boilerplate marker
            good + " {",                            # 3: brace marker
            " ".join(["a"] * 60),                   # 4: mean word len < 3
            good + " " + "#" * 60,                  # 5: symbol ratio
            None,                                   # 6: null text
        ],
    )
    assert out[0].keep and out[0].n_words == 60
    assert abs(out[0].mean_word_len - 4.0) < 1e-12
    assert not out[1].keep
    assert not out[2].keep and out[2].has_lorem
    assert not out[3].keep and out[3].has_brace
    assert not out[4].keep and out[4].mean_word_len < 3
    assert not out[5].keep and out[5].symbol_word_ratio > 0.1
    assert not out[6].keep and out[6].n_words == 0


def test_enrich_stream_static_broadcast_join(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    spark.createDataFrame(
        [(1, "hostA", "x"), (2, "hostB", "y"), (3, "hostC", "z")],
        "doc_id: bigint, host: string, payload: string",
    ).write.parquet(inp)
    dim = spark.createDataFrame(
        [("hostA", 1, "edu"), ("hostB", 2, "news")],
        "host: string, priority: int, category: string",
    )
    stream = spark.readStream.schema(
        "doc_id bigint, host string, payload string"
    ).parquet(inp)
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(50):
        if not q.isActive:
            break
        time.sleep(0.2)
    got = {r.doc_id: r for r in spark.read.parquet(outp).collect()}
    assert got[1].priority == 1 and got[1].category == "edu"
    assert got[2].priority == 2 and got[2].category == "news"
    assert got[3].priority is None  # left join keeps unmatched stream rows


def test_approx_percentile_sketch_close_to_exact(spark):
    """The scale path (mergeable approx_percentile sketch) must stay
    within its accuracy contract of the exact grouped percentile."""
    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r.event_type: (r.p25, r.p50, r.p75)
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit([0.25, 0.5, 0.75])).alias("p"))
        .select(
            "event_type",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
        )
        .collect()
    }
    approx = {
        r.event_type: r.p
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.lit([0.25, 0.5, 0.75]), F.lit(1000)
            ).alias("p")
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for et, (e25, e50, e75) in exact.items():
        spread = max(1.0, e75 - e25)
        for e, a in zip((e25, e50, e75), approx[et]):
            assert abs(e - a) <= 0.05 * spread + 0.5, (et, e, a)


def test_approx_count_distinct_within_rsd(spark):
    """HLL sketch (mergeable, the 100 TB cardinality plan) within its
    relative-standard-deviation contract of the exact count."""
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = d.select(F.countDistinct("text").alias("n")).collect()[0].n
    approx = d.select(
        F.approx_count_distinct("text", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) <= max(3, 0.1 * exact), (exact, approx)


def test_stratified_sample_fractions(spark):
    """sampleBy (per-stratum Bernoulli) honors fractions and never
    leaks strata that were assigned zero probability."""
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    keep = {lang: (0.5 if lang == "en" else 0.0) for lang in langs}
    s = d.sampleBy("lang", keep, seed=13)
    counts = {r.lang: r.n for r in
              s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"en"}
    n_en = d.where("lang = 'en'").count()
    got = counts.get("en", 0)
    assert 0.2 * n_en <= got <= 0.8 * n_en, (n_en, got)


def test_curate_stream_incremental_dedup_across_batches(spark, tmp_path):
    """Streaming curation: quality + decontam drop rows inline; the
    fingerprint state survives to reject duplicates arriving in LATER
    micro-batch runs (restart-resumed checkpoint)."""
    from web_content_extractor_spark.streaming.incremental import curate_stream

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"
    good = " ".join(f"word{i}" for i in range(60))
    other = " ".join(f"token{i}" for i in range(70))
    snippets = spark.createDataFrame(
        [(1, "zebra quagga okapi")], "snippet_id: bigint, snippet: string"
    )

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            curate_stream(stream, snippets=snippets)
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        for _ in range(100):
            if not q.isActive:
                break
            time.sleep(0.2)

    # batch 1: doc 10 good, doc 11 exact dup (within batch), doc 12
    # contaminated by the snippet
    drain([(11, good), (10, good), (12, good + " zebra quagga okapi ok")])
    got1 = {r.doc_id: r for r in spark.read.parquet(outp).collect()}
    assert set(got1) == {10}  # min doc id of the dup pair, once
    assert got1[10].n_first_batch == 2

    # batch 2: doc 20 repeats batch-1 text (state must reject), doc 21 new
    drain([(20, good), (21, other)])
    got2 = {r.doc_id: r for r in spark.read.parquet(outp).collect()}
    assert set(got2) == {10, 21}
