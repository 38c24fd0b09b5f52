#!/usr/bin/env python
"""Hot-key as-of join: plain window vs time-bucketed variant.

Manufactures the pathological input for the plain as-of formulation:
ONE key owns almost every event, so the per-key window sort runs in a
single task no matter how many cores exist (AQE cannot split a window
partition).  The bucketed variant windows on (key, hour-bucket) and
patches boundary crossings from the rolled-forward carry — same
result, parallel sort.

Writes the measured numbers to stdout; BENCH.md records them.
Run: python scripts/bench_asof_skew.py  [n_events]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from web_content_extractor_spark.operators.asof import (  # noqa: E402
    asof_join,
    asof_join_bucketed,
)
from web_content_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("bench-asof-skew", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # 97% of events on key 0, spread over ~23 days of seconds; right
    # side = every 8th event
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1700000000 + F.col("id")).alias("ts"),
        F.when(F.col("id") % 32 == 0, F.col("id") % 7 + 1)
        .otherwise(F.lit(0))
        .alias("user_id"),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    left = base.where("event_id % 8 != 0").persist()
    right = base.where("event_id % 8 = 0").persist()
    left.count(), right.count()

    results = {}
    for name, fn in (
        ("plain", lambda: asof_join(left, right)),
        ("bucketed", lambda: asof_join_bucketed(left, right, bucket="hour")),
    ):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn().select(F.sum("lag_us"), F.count("matched_event_id"))
            row = out.collect()[0]
            best = min(best, time.perf_counter() - t0)
        results[name] = (best, row[0], row[1])

    (tp, sp, cp), (tb, sb, cb) = results["plain"], results["bucketed"]
    assert (sp, cp) == (sb, cb), "variants disagree"
    print(
        f"n={n} plain={tp:.2f}s bucketed={tb:.2f}s "
        f"speedup={tp / tb:.2f}x checksum={sp} matches={cp}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
