#!/usr/bin/env python
"""Wildcard-fraction cost probe for the REP evaluator.

``robots_decisions`` routes literal rules (the overwhelming majority
in real robots files) through codegen startswith/equality and only
wildcard rules through ``regexp_like`` — which Spark recompiles per
(row, rule) pair because the pattern column is non-foldable.  That
minority-path cost is fine at real-world wildcard fractions but would
be ruinous if it were the ONLY path; this probe measures decision
wall-clock as the wildcard fraction of an otherwise identical rules
table sweeps 0 -> 1, bounding the regexp path's cost before anyone
meets a wildcard-heavy UT1-scale corpus (VERDICT r4 stretch item).

Every sweep point keeps the SAME rule count per host and the SAME
URL corpus; only the literal/wildcard mix changes, so the measured
delta is purely the evaluation-path cost.  Rules per host defaults
to 8 (a realistic robots body) and is overridable via
``ROBOTS_PROBE_RULES`` to stress the regexp path (BENCH.md records
8 and 64).

Usage:  [ROBOTS_PROBE_RULES=64] python scripts/bench_robots_wildcards.py
Prints one JSON line; results recorded in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import _cpu_stat, _steal_fraction, timed_best  # noqa: E402
from web_content_extractor_spark.operators.crawl import (  # noqa: E402
    robots_decisions,
)
from web_content_extractor_spark.session import get_spark  # noqa: E402

N_HOSTS = 100
RULES_PER_HOST = int(os.environ.get("ROBOTS_PROBE_RULES", "8"))


def build_tables(spark, sf_dir: str, rep: int, wild_frac: float):
    """Rules: per host, RULES_PER_HOST Disallow rules, ``round(R*w)``
    of them wildcard query-targeting rules (`/*?sidK=`), the rest
    literal prefixes (`/litK`).  URLs: documents x rep, half carrying a query
    string that hits a wildcard rule, half a path that hits a literal
    rule, so both paths stay exercised at every fraction."""
    n_wild = round(RULES_PER_HOST * wild_frac)
    lines = ["User-agent: *"]
    for k in range(RULES_PER_HOST):
        if k < n_wild:
            lines.append(f"Disallow: /*?sid{k}=")
        else:
            lines.append(f"Disallow: /lit{k}")
    body = "\n".join(lines) + "\n"

    hosts = spark.range(N_HOSTS).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.lit(body).alias("robots"),
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .select((F.col("doc_id") * rep + F.col("r")).alias("doc_id"))
    )
    i = F.col("doc_id")
    host = F.concat(
        F.lit("h"), (i % N_HOSTS).cast("string"), F.lit(".example.com")
    )
    k = (i % RULES_PER_HOST).cast("string")
    path = (
        # hits a wildcard rule when one exists for k (else no match)
        F.when(i % 2 == 0,
               F.concat(F.lit("/page"), i.cast("string"),
                        F.lit("?sid"), k, F.lit("=x")))
        # hits a literal rule when one exists for k (else no match)
        .otherwise(F.concat(F.lit("/lit"), k, F.lit("/"),
                            i.cast("string")))
    )
    urls = docs.select(
        "doc_id", host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    return hosts, urls


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rep", type=int, default=20)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = p.parse_args()

    spark = get_spark("bench-robots-wildcards")
    spark.sparkContext.setLogLevel("ERROR")

    points = [0.0, 0.125, 0.25, 0.5, 1.0]
    results = []
    n_urls = None
    for w in points:
        robots, urls = build_tables(spark, args.sf_dir, args.rep, w)
        if n_urls is None:
            n_urls = urls.count()
        s0 = _cpu_stat()
        sec = timed_best(
            lambda: robots_decisions(robots, urls).select(
                "doc_id", "allowed"
            )
        )
        steal = _steal_fraction(s0, _cpu_stat())
        results.append({
            "wild_frac": w,
            "n_wild_rules": round(RULES_PER_HOST * w),
            "sec": round(sec, 3),
            "steal_frac": steal,
        })
    base = results[0]["sec"]
    for r in results:
        r["vs_all_literal"] = round(r["sec"] / base, 2)
    print(json.dumps({
        "probe": "robots wildcard-fraction sweep",
        "urls": n_urls,
        "hosts": N_HOSTS,
        "rules_per_host": RULES_PER_HOST,
        "points": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
