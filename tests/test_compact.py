"""Small-file compaction: merge-only and range-clustered rewrites."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from web_content_extractor_spark.sinks.compact import (
    compact_table,
    plan_compaction,
)


def _fragmented(spark, tmp_path, n_rows=4000, n_files=64):
    src = str(tmp_path / "frag")
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


def test_plan_counts_only_data_files(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    n_out, stats = plan_compaction(spark, src, target_file_bytes=1 << 40)
    assert stats.files_before == 64
    assert n_out == 1  # huge target -> single output file
    # plan bytes == sum of the *.parquet data files (hidden files excluded)
    import os

    disk = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*.parquet"))
    assert stats.bytes_before == disk > 0


def test_merge_only_compaction_hits_target_and_keeps_rows(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dst = str(tmp_path / "merged")
    _, plan = plan_compaction(spark, src, target_file_bytes=1)
    per_file = plan.bytes_before // 64
    # target ~16 input files' worth per output -> ~4 output files
    stats = compact_table(
        spark, src, dst, target_file_bytes=per_file * 16
    )
    assert stats.files_before == 64
    assert 3 <= stats.files_after <= 6
    assert (
        spark.read.parquet(dst).count()
        == spark.read.parquet(src).count()
        == 4000
    )
    # merge-only path must not shuffle: executed plan has no Exchange
    plan_str = spark.read.parquet(src).coalesce(4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan_str


def test_clustered_compaction_gives_disjoint_key_ranges(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dst = str(tmp_path / "clustered")
    _, plan = plan_compaction(spark, src, target_file_bytes=1)
    stats = compact_table(
        spark,
        src,
        dst,
        target_file_bytes=plan.bytes_before // 4,
        cluster_by="doc_id",
    )
    assert stats.files_after <= 6
    ranges = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) == stats.files_after
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "per-file doc_id ranges must be disjoint"
    assert spark.read.parquet(dst).count() == 4000


def test_single_row_table_compacts_to_one_file(spark, tmp_path):
    src = str(tmp_path / "one")
    spark.range(1).write.mode("overwrite").parquet(src)
    dst = str(tmp_path / "one_out")
    stats = compact_table(spark, src, dst)
    assert stats.files_after == 1
    assert spark.read.parquet(dst).count() == 1
