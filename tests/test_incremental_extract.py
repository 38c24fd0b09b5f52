"""Incremental reprocessing equivalence: diff-driven extraction of only
added+changed docs, merged over the previous output, must equal a full
re-run on the new snapshot."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from web_content_extractor_spark.datagen import fixture_docs
from web_content_extractor_spark.operators.diff import (
    changed_docs,
    snapshot_diff,
)
from web_content_extractor_spark.plans.pipeline import extract


def _span_sets(df):
    return {
        r.doc_id: [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
        for r in df.collect()
    }


def test_incremental_equals_full_rerun(spark):
    old = fixture_docs(spark)
    # fixture doc_ids are not unique; key the diff on a uniquified id
    old = old.withColumn(
        "doc_id",
        F.concat_ws(
            "#", "doc_id",
            F.row_number().over(
                Window.partitionBy("doc_id")
                .orderBy(F.col("spans")[0]["text"])
            ).cast("string"),
        ),
    )
    # new snapshot: drop one doc, mutate one doc's html, add one doc
    ids = sorted(r.doc_id for r in old.select("doc_id").collect())
    drop_id, edit_id = ids[0], ids[-1]
    edited = old.where(F.col("doc_id") != drop_id).withColumn(
        "spans",
        F.when(
            F.col("doc_id") == edit_id,
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.concat(
                        F.lit('<a href="https://x.org/extra.pdf">Extra</a>'),
                        s["text"],
                    ).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    added = old.where(F.col("doc_id") == edit_id).select(
        F.lit("https://brand.new/page#1").alias("doc_id"), "spans"
    )
    new = edited.unionByName(added)

    # the diff sees spans, not text: fingerprint the serialized spans
    fp = F.md5(F.to_json(F.col("spans")))
    d = snapshot_diff(old, new, fingerprint=fp)
    st = {r.doc_id: r.status for r in d.collect()}
    assert st[drop_id] == "removed"
    assert st[edit_id] == "changed"
    assert st["https://brand.new/page#1"] == "added"
    assert sum(1 for v in st.values() if v == "unchanged") == len(ids) - 2

    todo = changed_docs(old, new, fingerprint=fp)
    # previous output minus removed/changed docs, plus fresh extraction
    prev_out = extract(old)
    keep_ids = d.where(F.col("status") == "unchanged").select("doc_id")
    merged = prev_out.join(keep_ids, "doc_id", "left_semi").unionByName(
        extract(todo)
    )
    full = extract(new)
    assert _span_sets(merged) == _span_sets(full)
