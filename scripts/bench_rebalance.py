#!/usr/bin/env python
"""Heavy-tailed doc-size bench: evidence for ``balance="bytes"``.

bench_skew.py covers skewed FILE layout (one giant row group), where
row-balanced ``repartitionByRange(doc_id)`` is the fix.  This probe
covers the failure mode row-balancing CANNOT fix: doc SIZES are
heavy-tailed and correlated with the key (two giant hosts' documents
carry 30x the HTML of everyone else's, and host is the doc_id prefix,
so the giants sit in a contiguous key range — the interleaved
text+media corpus shape).  Row-balanced ranges give those hosts ~their
ROW share of partitions while they own most of the parse BYTES, so a
handful of partitions straggle; the byte-weighted rebalance
(operators/rebalance.py) sizes ranges by payload instead.

Prints ONE JSON line:
    {"metric": "...", "input_sec": ..., "rows_sec": ..., "bytes_sec":
     ..., "speedup_vs_rows": ..., "docs": N, "giant_frac_rows": ...,
     "giant_frac_bytes": ..., "cpus": C}

Run: python scripts/bench_rebalance.py   (env: SPARK_GRAFT_SF_DIR,
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
from web_content_extractor_spark.plans.pipeline import (  # noqa: E402
    extract,
    span_bytes,
)
from web_content_extractor_spark.session import get_spark  # noqa: E402

INFLATE = int(os.environ.get("SPARK_GRAFT_TAIL_INFLATE", "30"))
# giant-host docs carry INFLATE x the HTML
# bench doc_ids are "https://host<k>.example.org/d<id>.html" with
# k = id % 97; host0.* + host1.* is ~2% of rows AND a contiguous
# doc_id string range (host1. sorts before host10.)
def giant():
    return F.col("doc_id").startswith("https://host0.") | F.col(
        "doc_id"
    ).startswith("https://host1.")


def materialize_heavy_tail(spark, sf_dir: str, replication: int) -> str:
    """Corpus in key-sorted files with ONE giant row group each.

    A hash-scattered write would pre-spread the giants and the scan
    itself would byte-balance (parquet splits by bytes); the
    pathological shape is a SORTED ingest — each file one unsplittable
    row group, so the file holding the giant-host key range owns ~40%
    of the parse bytes no matter how small maxPartitionBytes is.
    That is the layout a sorted crawl dump or a compacted Iceberg
    table hands you."""
    path = os.path.join(
        REPO, ".bench", f"heavytail_{replication}_x{INFLATE}_v3"
    )
    marker = os.path.join(path, "_TAIL_COMPLETE")
    if not os.path.exists(marker):
        docs = bench.replicated_docs(spark, sf_dir, replication)
        inflate = F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.repeat(s["text"], INFLATE).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        )
        (
            docs.withColumn(
                "spans",
                F.when(giant(), inflate).otherwise(F.col("spans")),
            )
            # size metadata, as curated corpora carry: lets the
            # byte-balance boundary sample scan (doc_id, n_bytes)
            # instead of the payload
            .withColumn("n_bytes", span_bytes())
            .repartitionByRange(16, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.option("parquet.block.size", str(1 << 30))
            .mode("overwrite")
            .parquet(path)
        )
        open(marker, "w").close()
    return path


# timing: bench.timed_best — each pass REBUILDS the DataFrame, so the
# byte-rebalance boundary-sampling job (which runs eagerly at
# construction time and reads the payload column under the default
# weight) is paid inside the timed region, exactly as production pays
# it; a pre-built frame would hide that scan and flatter "bytes"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replication = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "6"))
    spark = get_spark("bench-rebalance", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warmup(spark, sf_dir)

    path = materialize_heavy_tail(spark, sf_dir, replication)
    docs = spark.read.parquet(path)
    stats = docs.agg(
        F.count("*").alias("n"),
        F.sum(span_bytes()).alias("b"),
        F.sum(F.when(giant(), 1).otherwise(0)).alias("gn"),
        F.sum(F.when(giant(), span_bytes()).otherwise(0)).alias("gb"),
    ).collect()[0]

    input_sec = bench.timed_best(lambda: extract(docs))
    rows_sec = bench.timed_best(
        lambda: extract(docs, balance="rows", partitions=cpus * 4)
    )
    # metadata weight: boundary sample scans (doc_id, n_bytes) only —
    # column pruning keeps it off the payload even in giant row groups
    bytes_sec = bench.timed_best(
        lambda: extract(
            docs,
            balance="bytes",
            partitions=cpus * 4,
            weight=F.col("n_bytes"),
        )
    )
    # default payload weight: the sampling job reads spans and itself
    # straggles on the unsplittable giant row group — the documented
    # counter-case (use a metadata column on sorted/compacted layouts)
    bytes_payload_sec = bench.timed_best(
        lambda: extract(docs, balance="bytes", partitions=cpus * 4)
    )

    print(
        json.dumps(
            {
                "metric": "heavy-tailed doc-size extract wall-clock "
                f"(2 of 97 hosts carry {INFLATE}x HTML, contiguous "
                "doc_id range)",
                "input_sec": round(input_sec, 3),
                "rows_sec": round(rows_sec, 3),
                "bytes_sec": round(bytes_sec, 3),
                "bytes_payload_weight_sec": round(bytes_payload_sec, 3),
                "speedup_vs_rows": round(rows_sec / bytes_sec, 2),
                "docs": stats["n"],
                "giant_frac_rows": round(stats["gn"] / stats["n"], 4),
                "giant_frac_bytes": round(stats["gb"] / stats["b"], 4),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
