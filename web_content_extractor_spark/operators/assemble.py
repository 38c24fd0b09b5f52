"""Span assembly: classify + order candidates into the output array.

Pure Column algebra over the nested candidates array — the whole
classify/partition/sort/offset step runs JVM-side with NO shuffle:

1. drop invalid candidates (drop-not-fail, link_classifier.py:50-53);
2. classify each candidate with the when/rlike chain
   (functions/classify.py); input media spans pass through as
   kind='other' with their media_ref preserved and used as text
   fallback (engine rule for interleaved payloads, FIXTURES.md F14);
3. order by (type-rank, document parse order) — the ExtractionResult
   invariant: pdf list, then youtube list, then other list, each in
   parse order (service.py:80-88, models.py:171-173) — via
   ``sort_array`` on a struct whose leading fields are (rank, pos);
4. re-number the final array positions into ``offset``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_content_extractor_spark.functions import classify


def assemble_spans(candidates: Column, variant: str = "context") -> Column:
    """candidates: array<struct<pos,url,text,is_media,valid>> -> spans."""
    kept = F.filter(candidates, lambda x: x["valid"])
    classified = F.transform(
        kept,
        lambda x: F.struct(
            F.when(x["is_media"], F.lit(classify.OTHER))
            .otherwise(classify.classify_kind(x["url"], x["text"], variant))
            .alias("kind"),
            x["pos"].alias("pos"),
            F.when(F.length(x["text"]) == 0, x["url"])
            .otherwise(x["text"])
            .alias("text"),
            x["url"].alias("media_ref"),
        ),
    )
    ranked = F.transform(
        classified,
        lambda x: F.struct(
            classify.type_rank(x["kind"]).alias("rank"),
            x["pos"].alias("pos"),
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
        ),
    )
    # struct sort is lexicographic over (rank, pos, ...); pos is unique
    ordered = F.sort_array(ranked)
    return F.transform(
        ordered,
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def explode_spans(extracted: DataFrame) -> DataFrame:
    """Exploded relational view (doc_id, kind, text, media_ref, offset)."""
    return extracted.select("doc_id", F.inline("spans"))
