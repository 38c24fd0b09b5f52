#!/usr/bin/env python
"""Corpus-size weak-scaling probe: flagship docs/sec vs corpus size.

The executor-scaling bench (bench_scaling.py) fixes the corpus and
scales parallelism; this one fixes parallelism (local[32]) and scales
the CORPUS 64x (sf0.1 replicated x5 -> x320, 25k -> 1.6M docs), the
other axis of the 100 TB extrapolation.  A scale-safe shuffle-free
pipeline should hold or RAISE docs/sec as the corpus grows — fixed
per-job costs (Catalyst, task launch, Arrow worker spin-up) amortize,
and nothing (driver state, collected structures, skewed partitions)
may grow with the input.  A falling curve would expose exactly the
kind of hidden corpus-sized state this repo's plan audits exist to
forbid.

Each level runs in a FRESH JVM (child process) so page cache is the
only shared state; timing is bench.flagship's protocol (untimed warm
pass, then best-of-N steady-state passes, per-pass host-steal
sampled).  Usage:

    python scripts/bench_corpus_sweep.py [--reps 5,20,80,320]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(rep: int, cores: int, sf_dir: str, passes: int) -> None:
    os.environ.setdefault("SPARK_HOME", __import__("pyspark").__path__[0])
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    from bench import corpus_path, flagship, warmup
    from web_content_extractor_spark.session import get_spark

    spark = get_spark(f"corpus-sweep-r{rep}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark, sf_dir)
    n_docs, sec, steal = flagship(spark, sf_dir, rep, passes=passes)
    path = corpus_path(sf_dir, rep)
    nbytes = sum(e.stat().st_size for e in os.scandir(path)
                 if e.name.endswith(".parquet"))
    print(json.dumps({
        "rep": rep, "docs": n_docs, "mb": round(nbytes / 2**20, 1),
        "sec": round(sec, 2), "docs_per_sec": round(n_docs / sec, 1),
        "steal_frac": steal,
    }))
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", default="5,20,80,320")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--passes", type=int, default=4)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--child", type=int, default=None, metavar="REP")
    args = p.parse_args()
    if args.child is not None:
        child(args.child, args.cores, args.sf_dir, args.passes)
        return
    rows = []
    for rep in map(int, args.reps.split(",")):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(rep),
             "--cores", str(args.cores), "--passes", str(args.passes),
             "--sf-dir", args.sf_dir],
            capture_output=True, text=True, check=True, cwd=REPO)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(r)
        print(json.dumps(r), flush=True)
    base = rows[0]["docs_per_sec"]
    print("| docs | corpus (MB) | wall-clock (s) | docs/sec | vs smallest | steal |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['docs']:,} | {r['mb']} | {r['sec']} | "
              f"{r['docs_per_sec']:,} | {r['docs_per_sec'] / base:.2f}x | "
              f"{r['steal_frac']:.1%} |")


if __name__ == "__main__":
    main()
