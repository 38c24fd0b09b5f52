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

class ResultFormattingError(ValueError):
    """Unknown output format (formatters.py:66-71 analog)."""


def _spans_of(row: Mapping[str, Any]) -> list[Mapping[str, Any]]:
    return [s.asDict() if hasattr(s, "asDict") else s for s in row["spans"]]


def _groups(
    row: Mapping[str, Any],
) -> tuple[list[Mapping[str, Any]], dict[str, list[Mapping[str, Any]]]]:
    spans = _spans_of(row)
    return spans, {
        k: [s for s in spans if s["kind"] == k] for k in ("pdf", "youtube", "other")
    }


def _metadata_of(row: Mapping[str, Any]) -> Mapping[str, Any] | None:
    """Optional metadata dict carried in the row.

    Keys mirror ExtractionMetadata (models.py:93-131): at least
    ``processing_time_s`` (float seconds) and ``extraction_timestamp``.
    """
    md = row.get("metadata") if hasattr(row, "get") else None
    return md if md else None


def format_json(row: Mapping[str, Any]) -> str:
    """JSON render (reference _format_json = model_dump_json(indent=2)).

    Field parity with ExtractionResult.model_dump_json: the three typed
    link lists (each link with url/link_text/link_type/is_valid,
    models.py:22-28) and the optional ``metadata`` object (null when
    absent).  ``total_links`` is a @property in the reference
    (models.py:143-146) and is correctly NOT serialized.  Divergence:
    ``source_url`` renders as a plain string, not the nested SourceUrl
    value-object dict.
    """
    import json

    _, groups = _groups(row)

    def links(kind: str) -> list[dict[str, Any]]:
        return [
            {
                "url": s["media_ref"],
                "link_text": s["text"],
                "link_type": kind,
                "is_valid": True,
            }
            for s in groups[kind]
        ]

    out = {
        "source_url": row["doc_id"],
        "pdf_links": links("pdf"),
        "youtube_links": links("youtube"),
        "other_links": links("other"),
        "metadata": dict(_metadata_of(row)) if _metadata_of(row) else None,
    }
    return json.dumps(out, indent=2)


def format_text(row: Mapping[str, Any]) -> str:
    """Plain-text render, exact parity with reference _format_text
    (formatters.py:78-102): header + Total Links Found, PDF and YouTube
    sections only (the reference text format has NO Other section),
    optional Extraction Information footer when metadata is present.
    """
    spans, groups = _groups(row)
    lines = [
        f"Extraction Results for: {row['doc_id']}",
        f"Total Links Found: {len(spans)}",
        "",
        f"PDF Links ({len(groups['pdf'])}):",
    ]
    lines += [f"- {s['text']}: {s['media_ref']}" for s in groups["pdf"]]
    lines.append("")
    lines.append(f"YouTube Links ({len(groups['youtube'])}):")
    lines += [f"- {s['text']}: {s['media_ref']}" for s in groups["youtube"]]
    md = _metadata_of(row)
    if md:
        lines.append("")
        lines.append("Extraction Information:")
        lines.append(f"- Processing Time: {md['processing_time_s']:.2f} seconds")
        lines.append(f"- Extraction Date: {md['extraction_timestamp']}")
    return "\n".join(lines)


def format_markdown(row: Mapping[str, Any]) -> str:
    """Markdown render, exact parity with reference _format_markdown
    (formatters.py:104-136)."""
    spans, groups = _groups(row)
    lines = [
        f"# Extraction Results for: {row['doc_id']}",
        f"**Total Links Found:** {len(spans)}",
        "",
        f"## PDF Links ({len(groups['pdf'])})",
    ]
    lines += [f"- [{s['text']}]({s['media_ref']})" for s in groups["pdf"]]
    lines.append("")
    lines.append(f"## YouTube Links ({len(groups['youtube'])})")
    lines += [f"- [{s['text']}]({s['media_ref']})" for s in groups["youtube"]]
    lines.append("")
    lines.append(f"## Other Links ({len(groups['other'])})")
    lines += [f"- [{s['text']}]({s['media_ref']})" for s in groups["other"]]
    md = _metadata_of(row)
    if md:
        lines.append("")
        lines.append("## Extraction Information")
        lines.append(f"- **Processing Time:** {md['processing_time_s']:.2f} seconds")
        lines.append(f"- **Extraction Date:** {md['extraction_timestamp']}")
    return "\n".join(lines)


_CSV_KIND = {"pdf": "PDF", "youtube": "YouTube", "other": "Other"}


def format_csv(row: Mapping[str, Any]) -> str:
    """CSV render, exact parity with reference _format_csv
    (formatters.py:138-151): capitalized type names (PDF/YouTube/Other),
    text naively double-quoted, URL bare — the reference builds lines
    with an f-string, not a csv writer, and this reproduces that byte
    for byte (including its non-escaping of quotes inside link text).
    """
    _, groups = _groups(row)
    lines = ["Type,Text,URL"]
    for kind in ("pdf", "youtube", "other"):
        lines += [
            f'{_CSV_KIND[kind]},"{s["text"]}",{s["media_ref"]}'
            for s in groups[kind]
        ]
    return "\n".join(lines)


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
