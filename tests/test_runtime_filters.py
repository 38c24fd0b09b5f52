"""Runtime Bloom-filter join pruning: the engine's shuffle-join shapes
qualify for Spark's injected runtime filters.

At 100 TB the win is concrete: a selective dim-side predicate becomes a
bloom filter broadcast to the fact-side scan, dropping non-matching
rows BEFORE the shuffle (`BloomFilterMightContain` above the scan), so
shuffle bytes track the join's selectivity instead of the corpus size.
Spark only injects it when the application side looks big
(`...bloomFilter.applicationSideScanSizeThreshold`, default 10 GB), so
this test lowers the thresholds to demonstrate the qualifying *shape*
at sandbox scale — on a real corpus the defaults fire on their own.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def runtime_filter_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # runtime filters only fire on non-broadcast joins
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_join_gets_bloom_filter(runtime_filter_conf, tmp_path):
    spark = runtime_filter_conf
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(0, 200_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 1000).alias("host_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(0, 1000).select(
        F.col("id").alias("host_id"),
        F.when(F.col("id") < 10, "news").otherwise("other").alias("tier"),
    ).write.mode("overwrite").parquet(dim_p)

    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p).where(F.col("tier") == "news")
    joined = fact.join(dim, "host_id").groupBy("tier").agg(
        F.count("*").alias("n")
    )

    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), (
        "runtime bloom filter was not injected:\n" + plan[:2000]
    )
    # and the filtered result is still correct
    rows = joined.collect()
    assert rows[0].tier == "news" and rows[0].n == 10 * 200  # 10 hosts x 200 docs


def test_engine_join_shape_qualifies(runtime_filter_conf, tmp_path):
    """The flagship star-join shape (docs x selective host dim) also
    qualifies once the fact side is a file scan — i.e. the engine does
    not break injection with nondeterministic exprs or Python stages
    below the join key."""
    spark = runtime_filter_conf
    docs_p = str(tmp_path / "docs")
    spark.range(0, 50_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 500).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string"))
        .alias("doc_id"),
        (F.col("id") % 500).alias("host_id"),
    ).write.mode("overwrite").parquet(docs_p)
    docs = spark.read.parquet(docs_p)
    hot_p = str(tmp_path / "hot")
    spark.range(0, 500).select(
        F.col("id").alias("host_id"),
        (F.col("id") % 50).alias("host_bucket"),
    ).write.mode("overwrite").parquet(hot_p)
    # injection requires a LIKELY-SELECTIVE predicate (equality/IN —
    # a bare boolean attribute does not qualify) on the creation side
    # of the join itself, as in the engine's hot-host queries
    hot = spark.read.parquet(hot_p).where(F.col("host_bucket") == 0)

    j = docs.join(hot, "host_id").select("doc_id")
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower()
    assert j.count() == 10 * 100  # 10 hot hosts x 100 docs each
