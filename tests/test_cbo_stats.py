"""Cost-based optimizer statistics: ANALYZE TABLE feeds Catalyst real
row counts and column NDV/min/max, and the resulting cardinality
estimates are close to truth.

At 100 TB this is what keeps join strategy and reorder decisions sane:
without stats Catalyst falls back to raw file sizes (sizeInBytes),
which says nothing about post-filter cardinality.  The engine's tables
are path-based parquet in the sandbox, but the same ANALYZE flow
applies to catalog/Iceberg tables on a real cluster.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cbo(spark, tmp_path_factory):
    keys = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    db = "cbo_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"USE {db}")
    spark.range(100_000).select(
        F.col("id").alias("doc_pk"),
        (F.col("id") % 500).alias("host_id"),
    ).write.mode("overwrite").saveAsTable("facts")
    spark.range(500).select(
        F.col("id").alias("host_id"),
        (F.col("id") % 10).alias("tier"),
    ).write.mode("overwrite").saveAsTable("hosts")
    spark.sql("ANALYZE TABLE facts COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE hosts COMPUTE STATISTICS FOR ALL COLUMNS")
    yield spark
    spark.sql("USE default")
    spark.sql(f"DROP DATABASE {db} CASCADE")
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _estimate(df) -> int:
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    assert rc.isDefined(), "CBO produced no row-count estimate"
    return int(str(rc.get()))


def test_analyze_collects_exact_table_stats(cbo):
    spark = cbo
    row = [
        r
        for r in spark.sql("DESCRIBE TABLE EXTENDED facts").collect()
        if r.col_name == "Statistics"
    ][0]
    assert "100000 rows" in row.data_type
    ndv = {
        r.info_name: r.info_value
        for r in spark.sql("DESCRIBE EXTENDED facts host_id").collect()
    }
    assert abs(int(ndv["distinct_count"]) - 500) <= 25  # HLL ~5% error
    assert ndv["min"] == "0" and ndv["max"] == "499"


def test_filter_selectivity_estimate_close_to_truth(cbo):
    spark = cbo
    df = spark.table("hosts").where(F.col("tier") == 3)
    est, actual = _estimate(df), df.count()
    assert actual == 50
    assert actual / 3 <= est <= actual * 3


def test_join_cardinality_estimate_close_to_truth(cbo):
    spark = cbo
    j = spark.table("facts").join(
        spark.table("hosts").where(F.col("tier") == 3), "host_id"
    )
    est, actual = _estimate(j), j.count()
    assert actual == 10_000  # 50 hosts x 200 facts each
    assert actual / 5 <= est <= actual * 5
