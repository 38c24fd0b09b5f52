"""Small-file table compaction (post-hoc output maintenance).

Streaming sinks and wide fan-out writes leave table directories full
of KB-size parquet files; at 10^12-doc scale the file *count* itself
becomes the bottleneck (NameNode/manifest pressure, per-file open cost
at scan time — see ``spark.sql.files.openCostInBytes``).  This is the
``rewrite_data_files`` maintenance action of an Iceberg table,
expressed over the parquet fallback the sandbox uses (sources/docs.py
explains the Iceberg/parquet duality).

Two modes, chosen by ``cluster_by``:

- merge-only (default): ``coalesce(n)`` — a NARROW bin-packing of
  existing partitions into ~target-size outputs.  Zero shuffle: each
  output task reads a handful of small files and streams them out.
  This is the right default; compaction that shuffles the corpus to
  merge files pays for itself only if it also clusters.
- clustered: ``repartitionByRange(n, key).sortWithinPartitions(key)``
  — ONE range shuffle that yields globally range-clustered,
  min/max-prunable files (the Iceberg sort-order rewrite).  Costs the
  shuffle, buys predicate file-skipping on the cluster key forever
  after.

File sizing is measured, not guessed: the planner reads the actual
byte sizes of the input data files through the Hadoop FileSystem API
(works on HDFS/S3A/local alike) and divides by ``target_file_bytes``.
Output size ~= input size for same-codec parquet rewrite, so the
estimate is tight without any sampling pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    bytes_before: int
    files_after: int
    bytes_after: int
    target_file_bytes: int


def _data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path``, recursively,
    via the Hadoop FS API — hidden/metadata entries (``_SUCCESS``,
    ``.crc``, ``_delta_log`` …) excluded."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((f.getPath().toString(), int(f.getLen())))
    return out


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> tuple[int, CompactionStats]:
    files = _data_files(spark, path)
    total = sum(b for _, b in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    return n_out, CompactionStats(
        files_before=len(files),
        bytes_before=total,
        files_after=n_out,
        bytes_after=0,
        target_file_bytes=target_file_bytes,
    )


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: str | None = None,
) -> CompactionStats:
    """Rewrite ``in_path`` into ~target-size files at ``out_path``.

    Returns measured before/after stats.  ``cluster_by=<col>`` switches
    from the shuffle-free coalesce merge to the range-clustered rewrite
    (disjoint per-file key ranges -> min/max file skipping).
    """
    n_out, stats = plan_compaction(spark, in_path, target_file_bytes)
    df = spark.read.parquet(in_path)
    if cluster_by is None:
        out = df.coalesce(n_out)
    else:
        out = df.repartitionByRange(n_out, F.col(cluster_by)) \
                .sortWithinPartitions(cluster_by)
    out.write.mode("overwrite").parquet(out_path)
    after = _data_files(spark, out_path)
    return CompactionStats(
        files_before=stats.files_before,
        bytes_before=stats.bytes_before,
        files_after=len(after),
        bytes_after=sum(b for _, b in after),
        target_file_bytes=target_file_bytes,
    )
