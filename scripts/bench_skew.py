#!/usr/bin/env python
"""Skewed-layout bench: evidence for the ``balance=True`` path.

PLANS.md/SURVEY claim: when the input file layout is skewed (a few
giant files / row groups), ``extract(balance=True)`` —
``repartitionByRange(doc_id)`` before the tokenizer, AQE coalescing the
small post-shuffle partitions — restores full parallelism for one
bounded shuffle.  This script manufactures the pathological layout and
measures both paths.

Layout: ~85% of the corpus in ONE parquet file written as a single
giant row group (``parquet.block.size`` = 1 GB).  A row group is the
minimum split unit, so no matter how small
``spark.sql.files.maxPartitionBytes`` is, one task owns 85% of the
extraction work — the local analog of one giant host/site in a 100-TB
crawl.  The remainder spreads across many small files.

Prints ONE JSON line:
    {"metric": "skewed-layout extract wall-clock", "skewed_sec": ...,
     "balanced_sec": ..., "speedup": ..., "docs": N, "cpus": C}

Run: python scripts/bench_skew.py   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REP)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from web_content_extractor_spark.plans.pipeline import extract  # noqa: E402
from web_content_extractor_spark.session import get_spark  # noqa: E402


def materialize_skewed(spark, sf_dir: str, replication: int) -> str:
    path = os.path.join(REPO, ".bench", f"skewed_{replication}_v1")
    # own completeness marker: Spark's _SUCCESS already exists after the
    # FIRST (hot) write, so a crash before the cold append would leave a
    # dataset later runs silently treat as complete
    marker = os.path.join(path, "_SKEW_COMPLETE")
    if not os.path.exists(marker):
        docs = bench.replicated_docs(spark, sf_dir, replication)
        hot = docs.where(F.crc32(F.col("doc_id")) % 100 < 85)
        cold = docs.where(F.crc32(F.col("doc_id")) % 100 >= 85)
        # one file, one giant row group: the minimum split unit owns
        # 85% of the corpus regardless of maxPartitionBytes
        (
            hot.coalesce(1)
            .write.option("parquet.block.size", str(1 << 30))
            .mode("overwrite")
            .parquet(path)
        )
        cold.repartition(64).write.mode("append").parquet(path)
        open(marker, "w").close()
    return path


# timing via the shared bench.timed_best (rebuilds per pass)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replication = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "10"))
    spark = get_spark("bench-skew", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warmup(spark, sf_dir)

    path = materialize_skewed(spark, sf_dir, replication)
    # small splits so the layout, not split sizing, is the variable
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    skewed_sec = bench.timed_best(lambda: extract(docs))
    balanced_sec = bench.timed_best(
        lambda: extract(docs, balance=True, partitions=cpus * 4)
    )

    print(
        json.dumps(
            {
                "metric": "skewed-layout extract wall-clock (85% of docs "
                "in one row group)",
                "skewed_sec": round(skewed_sec, 3),
                "balanced_sec": round(balanced_sec, 3),
                "speedup": round(skewed_sec / balanced_sec, 2),
                "docs": n_docs,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
