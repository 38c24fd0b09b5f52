"""Heavy-hitter detection: sketch-screened, exactly recounted."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.operators.skew import heavy_hitters


def _zipf(spark, n=20_000):
    """Rows with one ~40% host, one ~10% host, long uniform tail."""
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 4, "hot.example.com")
        .when(F.col("id") % 10 == 4, "warm.example.com")
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 997).cast("string")))
        .alias("host"),
    )


def test_finds_exactly_the_keys_above_threshold(spark):
    df = _zipf(spark)
    got = {r.host: (r.n, r.frac) for r in
           heavy_hitters(df, "host", min_frac=0.05, row_id="row_id").collect()}
    exact = {
        r.host: r.n
        for r in df.groupBy("host").agg(F.count("*").alias("n")).collect()
        if r.n >= 0.05 * 20_000
    }
    assert set(got) == set(exact) == {"hot.example.com", "warm.example.com"}
    for k, n in exact.items():
        assert got[k][0] == n
        assert abs(got[k][1] - n / 20_000) < 1e-6


def test_no_hitters_returns_empty_with_schema(spark):
    df = spark.range(1000).select(
        F.col("id").alias("row_id"), F.col("id").cast("string").alias("host")
    )
    out = heavy_hitters(df, "host", min_frac=0.01, row_id="row_id")
    assert out.count() == 0
    assert out.columns == ["host", "n", "frac"]


def test_null_keys_ignored_and_fraction_over_nonnull(spark):
    df = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, "only.example.com").alias("host"),
    )
    rows = heavy_hitters(df, "host", min_frac=0.5, row_id="row_id").collect()
    assert len(rows) == 1
    assert rows[0].n == 500 and abs(rows[0].frac - 1.0) < 1e-6


def test_layout_independent_with_row_id(spark):
    df = _zipf(spark, n=8000)
    a = sorted(
        (r.host, r.n)
        for r in heavy_hitters(df, "host", 0.05, row_id="row_id").collect()
    )
    b = sorted(
        (r.host, r.n)
        for r in heavy_hitters(
            df.repartition(13), "host", 0.05, row_id="row_id"
        ).collect()
    )
    assert a == b and len(a) == 2


def test_long_key_type_preserved(spark):
    df = spark.range(5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 4 < 2, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .cast("long")
        .alias("uid"),
    )
    rows = heavy_hitters(df, "uid", min_frac=0.25, row_id="row_id").collect()
    # 2500 from the hot branch + 5 tail collisions (ids = 7 mod 1000)
    assert len(rows) == 1 and rows[0].uid == 7 and rows[0].n == 2505
    assert isinstance(rows[0].uid, int)


def test_empty_input(spark):
    df = spark.range(0).select(
        F.col("id").alias("row_id"), F.col("id").cast("string").alias("host")
    )
    assert heavy_hitters(df, "host", row_id="row_id").count() == 0


def test_randomized_differential_vs_exact_groupby(spark):
    import random

    rng = random.Random(3)
    for trial in range(2):
        n = 5000
        hot = [f"hot{j}" for j in range(rng.randint(1, 3))]
        rows = []
        for i in range(n):
            if rng.random() < 0.5:
                rows.append((i, rng.choice(hot)))
            else:
                rows.append((i, f"cold{rng.randrange(2000)}"))
        df = spark.createDataFrame(rows, "row_id long, host string")
        frac = 0.04
        got = {
            r.host: r.n
            for r in heavy_hitters(
                df, "host", min_frac=frac, row_id="row_id"
            ).collect()
        }
        import math

        cut = math.ceil(frac * n)
        exact = {
            r.host: r.n
            for r in df.groupBy("host").agg(F.count("*").alias("n")).collect()
            if r.n >= cut
        }
        assert got == exact, trial
