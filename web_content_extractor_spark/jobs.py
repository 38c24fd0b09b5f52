"""spark-submit entry point for the extraction engine.

North-rule deployment shape (BASELINE.json: "submitted via
spark-submit --py-files on multi-executor clusters"):

    zip -r engine.zip web_content_extractor_spark
    spark-submit --py-files engine.zip \\
        -m web_content_extractor_spark.jobs \\
        --input  s3a://corpus/docs/          (or an Iceberg table id) \\
        --output s3a://corpus/spans/ \\
        --metrics s3a://corpus/metrics/ \\
        --resume --content

or locally: ``python -m web_content_extractor_spark.jobs --input ...``.

One driver process builds one logical plan per stage; Catalyst/AQE do
the physical planning.  ``--resume`` uses the file-lineage manifest
(sources/checkpoint.py) so a crashed or re-submitted run processes
exactly the unprocessed remainder; without it the job is a plain
one-shot extract + append.
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid

from web_content_extractor_spark.operators.content import extract_content
from web_content_extractor_spark.operators.errors import doc_errors, write_errors
from web_content_extractor_spark.operators.metrics import partition_metrics
from web_content_extractor_spark.sources.urls import (
    UrlListError,
    read_url_list,
    url_batch,
)
from web_content_extractor_spark.plans.pipeline import extract
from web_content_extractor_spark.session import get_spark
from web_content_extractor_spark.sources.checkpoint import run_resumable_extract
from web_content_extractor_spark.sources.docs import read_docs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="web_content_extractor_spark.jobs")
    p.add_argument("--input", required=True,
                   help="docs path (parquet dir) or Iceberg table id")
    p.add_argument("--output", required=True, help="spans output path")
    p.add_argument("--metrics", default=None, help="metrics table path")
    p.add_argument("--errors", default=None,
                   help="per-doc errors table path (stage/reason per "
                        "dropped candidate)")
    p.add_argument("--urls", default=None,
                   help="URL-list JSON file (blob-trigger parity): "
                        "extract only the listed doc_ids")
    p.add_argument("--content-output", default=None,
                   help="also run the boilerpipe content branch to this path")
    p.add_argument("--variant", choices=("context", "regex"), default="context",
                   help="classifier rule set (CLI vs API parity)")
    p.add_argument("--resume", action="store_true",
                   help="file-lineage resumable mode (skip processed files)")
    p.add_argument("--balance", action="store_true",
                   help="repartitionByRange(doc_id) before the tokenizer "
                        "(skewed input layouts)")
    p.add_argument("--master", default=None,
                   help="override spark master (default: env/local)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.urls and args.resume:
        print(json.dumps({
            "error": "--urls is a one-shot work list; combine it with "
                     "plain mode, not --resume (file-lineage resume "
                     "tracks whole input files)"
        }))
        return 2
    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("wce-extract-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.resume:
        result = run_resumable_extract(
            spark,
            args.input,
            args.output,
            metrics_path=args.metrics,
            errors_path=args.errors,
            variant=args.variant,
            balance=args.balance,
        )
    else:
        run_id = uuid.uuid4().hex[:12]
        docs = read_docs(spark, args.input)
        if args.urls:
            try:
                docs = url_batch(docs, read_url_list(spark, args.urls))
            except UrlListError as e:
                # blob-trigger error-object semantics
                # (extract_blob_trigger.py:56-65)
                print(json.dumps(e.error_object))
                if not preexisting:
                    spark.stop()
                return 1
        extracted = extract(
            docs,
            variant=args.variant,
            balance=args.balance,
            with_stats=True,
            with_errors=bool(args.errors),
        )
        extracted.persist()
        try:
            extracted.select("doc_id", "spans").write.mode("append").parquet(
                args.output
            )
            if args.metrics:
                partition_metrics(extracted, run_id=run_id).write.mode(
                    "append"
                ).parquet(args.metrics)
            if args.errors:
                write_errors(doc_errors(extracted, run_id=run_id), args.errors)
            n_docs = extracted.count()
        finally:
            extracted.unpersist()
        result = {"run_id": run_id, "docs": n_docs}

    if args.content_output:
        docs = read_docs(spark, args.input)
        extract_content(docs).write.mode("append").parquet(args.content_output)
        result["content_output"] = args.content_output

    print(json.dumps(result))
    if not preexisting:  # don't tear down a caller-owned session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
