"""Format-agnostic docs source: the same extraction pipeline over
parquet, ORC, and JSON copies of the corpus produces identical spans —
the engine's claim that the input layer is a detail of `spark.read`
(Iceberg in production, anything columnar-or-line in practice)."""

from __future__ import annotations

import pytest

from web_content_extractor_spark.datagen import (
    FIXTURES,
    expected_spans,
    fixture_docs,
)
from web_content_extractor_spark.plans.pipeline import extract
from web_content_extractor_spark.schemas import DOCS


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_pipeline_is_source_format_agnostic(spark, tmp_path, fmt):
    path = str(tmp_path / f"docs_{fmt}")
    fixture_docs(spark).write.format(fmt).mode("overwrite").save(path)
    docs = spark.read.schema(DOCS).format(fmt).load(path)
    out = extract(docs).collect()
    golden = [
        expected_spans(f["name"]) for f in FIXTURES
    ]
    ok = sum(
        [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans] in [
            expected_spans(f["name"])
            for f in FIXTURES
            if f["doc_id"] == r.doc_id
        ]
        for r in out
    )
    assert ok == len(out) == 14, f"format {fmt}: {ok}/{len(out)}"
    assert any(g for g in golden)
