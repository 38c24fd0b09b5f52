"""AQE skew-join handling (north rule: "AQE skew-join handling"):
a Zipf-hot join key gets its oversized shuffle partition SPLIT at
runtime — `SortMergeJoin(skew=true)` over an `AQEShuffleRead skewed` —
instead of pinning one reducer with 90% of the rows.

Thresholds are lowered so the sandbox-scale shuffle qualifies; the
engine's session defaults keep skewJoin enabled so the same re-plan
fires untouched on real corpus shuffles (default 256 MB threshold).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "16",
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


def test_aqe_splits_the_hot_key_partition(skew_conf):
    spark = skew_conf
    # 90% of the left side lands on key 7 (one hot host)
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    right = spark.range(2000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    j = left.join(right, "k").select(F.substring("pad", 1, 1).alias("p"))
    rows = j.collect()  # executes THIS plan (count() would plan its own)
    # key 7: 180'200 left rows x 2 right rows; 199 cold keys x ~100 x 2
    assert len(rows) == 400_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
    assert "AQEShuffleRead skewed" in plan
