"""Output formatters + manifest sink-prep (SURVEY §2.8, O1-O9).

The reference renders one ``ExtractionResult`` to json/text/markdown/
csv via a format registry (src/infrastructure/formatters.py:32-151)
and prepares two asset manifests before its sinks: first-wins PDF
dedup (src/cli.py:381-387) and a sorted-unique YouTube list
(src/cli.py:407-413).

Here the registry renders a *collected* result row driver-side (these
are human-facing reports over a single document — not distributed
work), while everything that scales with the corpus is a DataFrame:
``spans_rows`` (the CSV projection), ``write_spans`` (distributed
parquet/json/csv writers), and the manifest builders.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KIND_TITLES = {"pdf": "PDF Links", "youtube": "YouTube Links", "other": "Other Links"}


class ResultFormattingError(ValueError):
    """Unknown output format (formatters.py:66-71 analog)."""


def _spans_of(row: Mapping[str, Any]) -> list[Mapping[str, Any]]:
    return [s.asDict() if hasattr(s, "asDict") else s for s in row["spans"]]


def format_json(row: Mapping[str, Any]) -> str:
    import json

    spans = _spans_of(row)
    out = {
        "source_url": row["doc_id"],
        "pdf_links": [
            {"url": s["media_ref"], "link_text": s["text"], "link_type": "pdf"}
            for s in spans
            if s["kind"] == "pdf"
        ],
        "youtube_links": [
            {"url": s["media_ref"], "link_text": s["text"], "link_type": "youtube"}
            for s in spans
            if s["kind"] == "youtube"
        ],
        "other_links": [
            {"url": s["media_ref"], "link_text": s["text"], "link_type": "other"}
            for s in spans
            if s["kind"] == "other"
        ],
    }
    return json.dumps(out, indent=2)


def format_text(row: Mapping[str, Any]) -> str:
    spans = _spans_of(row)
    lines = [f"Extraction results for: {row['doc_id']}", ""]
    for kind in ("pdf", "youtube", "other"):
        group = [s for s in spans if s["kind"] == kind]
        lines.append(f"{_KIND_TITLES[kind]} ({len(group)}):")
        lines += [f"  - {s['text']}: {s['media_ref']}" for s in group]
        lines.append("")
    lines.append(f"Total links: {len(spans)}")
    return "\n".join(lines)


def format_markdown(row: Mapping[str, Any]) -> str:
    spans = _spans_of(row)
    lines = [f"# Extraction results for {row['doc_id']}", ""]
    for kind in ("pdf", "youtube", "other"):
        group = [s for s in spans if s["kind"] == kind]
        lines.append(f"## {_KIND_TITLES[kind]} ({len(group)})")
        lines += [f"- [{s['text']}]({s['media_ref']})" for s in group]
        lines.append("")
    return "\n".join(lines)


def format_csv(row: Mapping[str, Any]) -> str:
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["Type", "Text", "URL"])
    for s in _spans_of(row):
        w.writerow([s["kind"], s["text"], s["media_ref"]])
    return buf.getvalue()


FORMATTERS: dict[str, Callable[[Mapping[str, Any]], str]] = {
    "json": format_json,
    "text": format_text,
    "markdown": format_markdown,
    "csv": format_csv,
}


def format_result(row: Mapping[str, Any], fmt: str) -> str:
    """Registry dispatch; unknown format raises (formatters.py:66-71)."""
    try:
        return FORMATTERS[fmt](row)
    except KeyError:
        raise ResultFormattingError(
            f"unknown format {fmt!r}; expected one of {sorted(FORMATTERS)}"
        ) from None


# --- distributed sinks ------------------------------------------------------


def spans_rows(extracted: DataFrame) -> DataFrame:
    """CSV projection (Type, Text, URL) of an extracted frame (O5)."""
    return extracted.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("type"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("url"),
    )


def write_spans(extracted: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Distributed writer: parquet (nested) or csv/json (exploded).

    Parquet keeps the nested span arrays (the engine's canonical shape,
    Iceberg-compatible); csv/json write the exploded projection.  The
    writer partitions by nothing on purpose: at 10^12 docs the upstream
    repartitionByRange(doc_id) already set the file layout, and a
    partitionBy here would re-shuffle.
    """
    if fmt == "parquet":
        extracted.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        spans_rows(extracted).write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "json":
        spans_rows(extracted).write.mode("overwrite").json(path)
    else:
        raise ResultFormattingError(f"unknown sink format {fmt!r}")


def pdf_manifest(extracted: DataFrame) -> DataFrame:
    """Unique PDF URLs, first text wins by document position (D6).

    Mirrors cli.py:381-387 (dict insert order = first occurrence); the
    distributed order key is (doc_id, offset) — deterministic, unlike
    the reference's process-local dict.
    """
    from pyspark.sql import Window

    pdfs = (
        extracted.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .where(F.col("s.kind") == "pdf")
        .select(
            F.col("s.media_ref").alias("url"),
            F.col("s.text").alias("text"),
            "doc_id",
            "pos",
        )
    )
    w = Window.partitionBy("url").orderBy("doc_id", "pos")
    return (
        pdfs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("url", "text")
    )


def youtube_manifest(extracted: DataFrame) -> DataFrame:
    """Sorted unique YouTube URLs (cli.py:407-413, D7/O9)."""
    return (
        extracted.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "youtube")
        .select(F.col("s.media_ref").alias("url"))
        .distinct()
        .orderBy("url")
    )
