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


def test_bucketed_groupby_avoids_shuffle(spark, bucketed_pair):
    left, _ = bucketed_pair
    # aggregation on the bucket key also reuses the layout: no Exchange
    agg = spark.table(left).groupBy("doc_id").agg(F.sum("n_links").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 2000
