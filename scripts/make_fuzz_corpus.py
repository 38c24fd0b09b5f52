#!/usr/bin/env python
"""Mutated-corpus generator for oracle-gate fuzzing.

The driver's correctness gate always runs on the same fixed parquet
corpora, so a Spark query and its DuckDB twin could agree there yet
diverge on data the fixed tables never exercise.  This script builds
a schema-identical corpus by resampling the source tables and
perturbing values INSIDE each column's domain (case flips, text
duplication, typo injection, timestamp jitter, embedding noise), so
`scripts/check_oracle.py <out_dir>` re-runs the whole oracle gate (103 twins as of round 5)
on data neither side has seen.  Round-4 result: all oracles green on
the mutated corpus (and the campaign's one red — literal HTML
injected into documents.text — was a premise violation, not a bug:
the content_blocks oracle models text as prose, as the source tables
guarantee; keep mutations inside the column's documented domain).

Usage:
    python scripts/make_fuzz_corpus.py /tmp/sfrand [--seed 0.42]
    python scripts/check_oracle.py /tmp/sfrand
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--src", default="/root/testdata/sf0.01")
    p.add_argument("--seed", type=float, default=0.42)
    args = p.parse_args()
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out)
    con = duckdb.connect()
    con.execute(f"select setseed({args.seed})")
    for t in TABLES:
        src = f"{args.src}/{t}.parquet"
        dst = f"{args.out}/{t}.parquet"
        if t == "documents":
            # re-key after sampling (several queries assume dense ids);
            # the mutation runs in an inner subquery and n_chars is
            # derived OUTSIDE it — a same-select `length(text)` binds
            # to the SOURCE column, not the mutated alias (DuckDB
            # prefers a base column over a lateral alias), which left
            # n_chars stale for duplication-mutated rows and violated
            # the n_chars == length(text) domain mutations must keep
            q = f"""
            copy (
              select row_number() over () - 1 as doc_id,
                     text, lang, source, length(text) as n_chars
              from (
                select case when random() < 0.15 then upper(text)
                            when random() < 0.15 then text || ' ' ||
                                 substr(text, 1, cast(random()*200 as int))
                            when random() < 0.10 then replace(text, 'the', 'teh')
                            else text end as text,
                       lang, source
                from read_parquet('{src}')
                using sample 80 percent (bernoulli, 7)
              )
            ) to '{dst}' (format parquet)"""
        elif t == "embeddings":
            q = f"""
            copy (
              select row_number() over () - 1 as vec_id,
                     list_transform(embedding,
                         x -> cast(x + (random()-0.5)*0.01 as float)) as embedding,
                     label
              from read_parquet('{src}')
              using sample 85 percent (bernoulli, 9)
            ) to '{dst}' (format parquet)"""
        elif t == "events":
            q = f"""
            copy (
              select event_id,
                     ts + to_microseconds(cast((random()-0.5)*2e9 as bigint)) as ts,
                     user_id, event_type,
                     value * (1 + (random()-0.5)*0.1) as value, props
              from read_parquet('{src}')
              using sample 85 percent (bernoulli, 11)
            ) to '{dst}' (format parquet)"""
        else:
            q = (f"copy (select * from read_parquet('{src}') using sample "
                 f"90 percent (bernoulli, 13)) to '{dst}' (format parquet)")
        con.execute(q)
        n = con.execute(
            f"select count(*) from read_parquet('{dst}')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
