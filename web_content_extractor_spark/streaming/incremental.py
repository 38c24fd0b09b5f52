"""Incremental extraction via Structured Streaming.

The reference has no streaming surface (SURVEY §2.9) — its
incremental behaviors are skip-existing sinks (src/cli.py:396-398)
and retry/resume (src/infrastructure/http_client.py:61-113).  The
engine offers two distributed analogs:

- ``sources/checkpoint.py``   — batch resume from a file-lineage
  manifest (Iceberg-snapshot-shaped bookkeeping).
- this module                 — the same pipeline as a Structured
  Streaming job: the file source's own checkpoint gives exactly-once
  incremental processing of newly-landed corpus files; with
  ``availableNow`` it drains the backlog and stops, so a cron'd
  re-run is a resumable batch job with zero custom bookkeeping.

The extraction plan is IDENTICAL to the batch path (same
``extract()`` call — mapInPandas and column algebra are both
streaming-compatible, stateless transforms), so span parity carries
over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from web_content_extractor_spark.plans.pipeline import extract
from web_content_extractor_spark.schemas import DOCS


def read_docs_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a landing directory of docs parquet."""
    reader = spark.readStream.schema(DOCS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    variant: str = "context",
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally extract newly-landed doc files; exactly-once sink.

    ``available_now=True`` processes the current backlog and stops
    (resumable batch); ``False`` runs continuously on new files.
    """
    docs = read_docs_stream(spark, input_path)
    ex = extract(docs, variant=variant)
    writer = (
        ex.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_span_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed per-kind span counts with late-data bound.

    Takes an exploded span stream carrying an event-time column;
    watermarking bounds state so the agg runs indefinitely at scale.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "kind")
        .agg(F.count("*").alias("n_spans"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "kind",
            "n_spans",
        )
    )
