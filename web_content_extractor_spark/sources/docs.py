"""Docs-table IO: Iceberg when available, parquet otherwise.

The engine's contract is an Iceberg table of interleaved documents
(BASELINE.json input_hint).  The sandbox image carries no
iceberg-spark-runtime jar, so reads/writes fall back to plain parquet
with the identical schema — the pipeline code is format-agnostic
(schemas.DOCS either way).  On a real cluster, pass
``format="iceberg"`` and a table identifier instead of a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from web_content_extractor_spark.schemas import DOCS


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_docs(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or ("iceberg" if location.count("/") == 0 else "parquet")
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.schema(DOCS).parquet(location)


def write_docs(
    df: DataFrame, location: str, fmt: str | None = None, mode: str = "append"
) -> None:
    fmt = fmt or ("iceberg" if location.count("/") == 0 else "parquet")
    if fmt == "iceberg":
        # hidden partitioning bucket(N, doc_id) is configured on table DDL
        df.writeTo(location).append()
    else:
        df.write.mode(mode).parquet(location)
