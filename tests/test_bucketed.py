"""Bucketed co-located join: the doc_id join family runs shuffle-free."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web_content_extractor_spark.sources.bucketed import (
    cojoin,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    docs = spark.range(0, 2000).select(
        F.concat(F.lit("https://h/d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("n_links"),
    )
    metrics = spark.range(0, 2000).select(
        F.concat(F.lit("https://h/d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 3).alias("parse_failures"),
    )
    write_bucketed(docs, "b_docs", buckets=4)
    write_bucketed(metrics, "b_metrics", buckets=4)
    yield "b_docs", "b_metrics"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_metrics")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    left, right = bucketed_pair
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cojoin(spark, left, right)
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: the join reads bucket layouts directly — no
        # Exchange on either side, and the within-bucket sortBy also
        # removes the SMJ sort
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 2000
        # correctness of the merged rows
        row = j.where(F.col("doc_id") == "https://h/d42").collect()[0]
        assert row.n_links == 0 and row.parse_failures == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_static_partition_pruning(spark, tmp_path):
    # hive-partitioned corpus layout (host=... dirs): a host predicate
    # must prune at the FILE level, not post-scan
    docs = spark.range(0, 1000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 8), F.lit("/d"), F.col("id"))
        .alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 8)).alias("host"),
        (F.col("id") * 3).alias("n_links"),
    )
    path = str(tmp_path / "parted")
    docs.write.partitionBy("host").parquet(path)
    back = spark.read.parquet(path).where(F.col("host") == "h3")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "h3" in plan
    assert back.count() == 125
    # post-scan there is no host filter left: pruning happened at the
    # source, so the data filter list carries no host condition
    data_filters = plan.split("PartitionFilters")[0]
    assert "isnotnull(host" not in data_filters


def test_dynamic_partition_pruning(spark, tmp_path):
    # the 100-TB join shape: fact partitioned by host, small filtered
    # dim on host -> Spark injects a dynamic pruning subquery so only
    # the dim's hosts are scanned
    fact = spark.range(0, 4000).select(
        (F.col("id") % 16).cast("string").alias("host"),
        (F.col("id") * 2).alias("links"),
    )
    path = str(tmp_path / "fact")
    fact.write.partitionBy("host").parquet(path)
    dim = spark.createDataFrame(
        [("3", "edu"), ("7", "edu")], "host string, category string"
    )
    f = spark.read.parquet(path)
    j = f.join(dim.where(F.col("category") == "edu"), "host")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() == 500


def test_bucketed_groupby_avoids_shuffle(spark, bucketed_pair):
    left, _ = bucketed_pair
    # aggregation on the bucket key also reuses the layout: no Exchange
    agg = spark.table(left).groupBy("doc_id").agg(F.sum("n_links").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 2000


def test_snapshot_diff_on_bucketed_tables_is_exchange_free(spark, tmp_path):
    """The incremental-reprocessing diff join co-locates on bucketed
    snapshots: full-outer join on doc_id with ZERO Exchange."""
    from web_content_extractor_spark.operators.diff import snapshot_diff
    from web_content_extractor_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )

    old = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
    )
    new = old.where("doc_id % 10 != 0")
    write_bucketed(old, "diff_old", buckets=4)
    write_bucketed(new, "diff_new", buckets=4)
    try:
        d = snapshot_diff(
            read_table(spark, "diff_old"), read_table(spark, "diff_new")
        )
        counts = {r.status: r["count"] for r in
                  d.groupBy("status").count().collect()}
        assert counts == {"removed": 500, "unchanged": 4500}
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1200]
    finally:
        spark.sql("DROP TABLE IF EXISTS diff_old")
        spark.sql("DROP TABLE IF EXISTS diff_new")
