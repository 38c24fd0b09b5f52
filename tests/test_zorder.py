"""Z-order layout: Morton-code correctness + data-skipping evidence."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from web_content_extractor_spark.sinks.zorder import (
    interleave_bits,
    write_zordered,
)


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    rows = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(300)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1), (65535, 0), (0, 65535)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "zval", interleave_bits(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.zval == _py_morton(r.x, r.y), (r.x, r.y)


def test_inputs_masked_to_16_bits(spark):
    df = spark.createDataFrame(
        [(65536 + 3, 65536 + 5)], "x int, y int"
    ).withColumn("zval", interleave_bits(F.col("x"), F.col("y")))
    assert df.collect()[0].zval == _py_morton(3, 5)


def _file_stats(spark, path):
    stats = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                F.min("zval"), F.max("zval"),
            )
            .collect()[0]
        )
        stats.append(tuple(r))
    return stats


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    # a full 128x128 grid: every (x, y) combination once
    grid = spark.range(128 * 128).select(
        (F.col("id") % 128).cast("int").alias("x"),
        (F.col("id") / 128).cast("int").alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(grid, "x", "y", zpath, n_files=16)

    # one-dimensional range layout on x for comparison
    lpath = str(tmp_path / "linear")
    (
        grid.withColumn("zval", interleave_bits(F.col("x"), F.col("y")))
        .repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zstats = _file_stats(spark, zpath)
    lstats = _file_stats(spark, lpath)
    assert len(zstats) == 16 and len(lstats) == 16

    # per-file z ranges are disjoint (contiguous curve segments)
    zr = sorted((s[4], s[5]) for s in zstats)
    for (lo1, hi1), (lo2, hi2) in zip(zr, zr[1:]):
        assert hi1 < lo2

    def touched(stats, lo, hi, dim):  # dim: 0 = x, 1 = y
        mn, mx = 2 * dim, 2 * dim + 1
        return sum(1 for s in stats if not (s[mx] < lo or s[mn] > hi))

    # box query 32 <= x < 64: both layouts skip on x.  File boundaries
    # come from repartitionByRange's reservoir SAMPLING, so exact
    # counts wobble by a file or two between runs — thresholds assert
    # majority skipping, not a fixed boundary placement (the old <= 5
    # linear bound contradicted that concession and flaked at 6 in
    # full-suite runs; both layouts now share the <= 10 majority bound
    # and the discriminating assertion is the relative one below).
    assert touched(zstats, 32, 63, 0) <= 10
    assert touched(lstats, 32, 63, 0) <= 10
    # box query 32 <= y < 64: the x-ordered layout reads EVERY file
    # (each spans the full y range); z-order skips a majority
    assert touched(lstats, 32, 63, 1) == 16
    assert touched(zstats, 32, 63, 1) <= 10
    assert touched(zstats, 32, 63, 1) <= touched(lstats, 32, 63, 1) - 6

    # row counts preserved
    assert spark.read.parquet(zpath).count() == 128 * 128
