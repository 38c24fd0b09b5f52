"""URL-list batch source (SURVEY §2.1 S3 — blob-trigger parity).

The reference's Azure blob trigger reads a JSON blob that is either a
JSON array of URL strings, an array of ``{"url": …}`` objects, a mix,
or a single non-list object (wrapped into a one-element list), and
builds the work list from it; an input yielding no URLs produces an
error object instead of a result
(src/functions/extract_blob_trigger.py:41-66).

Engine shape: the parsed work list becomes a tiny DataFrame that
BROADCAST-semi-joins the docs corpus — "extract just these pages" never
scans rows it doesn't need past the join, and the corpus side is never
collected.  The list itself is driver-side by contract: it is a trigger
*input* (the reference reads the entire blob into memory), not corpus
data.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UrlListError(ValueError):
    """No usable URLs in the input (blob-trigger error-object analog).

    ``error_object`` carries the exact payload the reference writes to
    the output blob (extract_blob_trigger.py:56-65).
    """

    def __init__(self, source_name: str | None = None) -> None:
        super().__init__("No valid URLs found in input blob")
        self.error_object = {
            "error": "No valid URLs found in input blob",
            "blob_name": source_name,
        }


def parse_url_items(content: str | bytes, source_name: str | None = None) -> list[str]:
    """Reference URL-list parsing semantics, byte for byte.

    - JSON array: each item contributes item (if str) or item["url"]
      (if dict with "url"); other items are skipped silently.
    - non-list JSON: wrapped into a one-element list first.
    - zero resulting URLs: UrlListError (error-object semantics).
    """
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    data: Any = json.loads(content)
    if not isinstance(data, list):
        data = [data]
    urls: list[str] = []
    for item in data:
        if isinstance(item, str):
            urls.append(item)
        elif isinstance(item, dict) and "url" in item:
            urls.append(item["url"])
    if not urls:
        raise UrlListError(source_name)
    return urls


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    """Read a URL-list JSON file into a (doc_id) work-list DataFrame.

    Duplicates are kept (the reference processes a URL once per list
    occurrence, but the semi-join naturally dedupes the corpus scan —
    the one deliberate divergence, matching crawl's visited-set rule).
    """
    with open(path, "rb") as fh:
        urls = parse_url_items(fh.read(), source_name=path)
    return spark.createDataFrame([(u,) for u in urls], "doc_id string")


def url_batch(docs: DataFrame, url_list: DataFrame) -> DataFrame:
    """Restrict the docs corpus to the work list: broadcast semi-join.

    The work list is small by contract, so this never shuffles the
    corpus; Catalyst pushes the join's partition pruning into the
    Iceberg/parquet scan when doc_id is a partition/bucket column.
    """
    return docs.join(
        F.broadcast(url_list.select("doc_id").dropDuplicates()),
        "doc_id",
        "left_semi",
    )
