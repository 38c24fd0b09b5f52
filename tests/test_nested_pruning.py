"""Nested schema pruning on the spans table: a projection of one
struct field must reach the parquet scan as array<struct<kind>> only —
at 10^12 docs the text payload dominates the table, so reading it for
a kind-histogram would be a ~10x scan-cost bug."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from web_content_extractor_spark.datagen import fixture_docs
from web_content_extractor_spark.plans.pipeline import extract


def _read_schema(df) -> str:
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"ReadSchema: (\S+)", p)
    return m.group(1) if m else ""


@pytest.fixture(scope="module")
def spans_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pruning") / "spans")
    extract(fixture_docs(spark)).write.parquet(path)
    return spark.read.parquet(path)


def test_field_access_prunes_to_single_subfield(spans_table):
    rs = _read_schema(
        spans_table.select("doc_id", F.col("spans.kind"))
    )
    assert "kind" in rs and "text" not in rs and "media_ref" not in rs


def test_explode_then_field_prunes_too(spans_table):
    df = spans_table.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind")
    rs = _read_schema(df)
    assert "kind" in rs and "text" not in rs


def test_transform_hof_blocks_pruning_known_caveat(spans_table):
    """Pinned Spark behavior: a higher-order `transform` lambda defeats
    nested pruning (full struct read).  This is WHY the engine's hot
    paths use explode/field access, never HOFs, over the spans column —
    if a Spark upgrade starts pruning here, celebrate and relax this."""
    df = spans_table.select(
        "doc_id", F.transform("spans", lambda s: s["kind"]).alias("k")
    )
    rs = _read_schema(df)
    assert "text" in rs  # full struct still read under the HOF
