"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, then compares row count + column set +
order-insensitive value hash.  Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from web_content_extractor_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns the DRIVER's canonicalizer cannot sort/hash (its pandas
    sort_values raises on list/dict/array values — the anchor_index
    err row of round 3).  Our own canon() stringifies them, so without
    this check the local gate passes queries the driver errs on;
    every registry query must emit scalar columns only."""
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype != object:
            continue
        vals = col.dropna()
        if len(vals) and isinstance(
            vals.iloc[0], (list, set, dict, tuple, np.ndarray)
        ):
            bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(
                lambda v: None
                if v is None
                else (repr(sorted(v)) if isinstance(v, (list, set)) else str(v))
            )
        elif "float" in str(col.dtype):
            df[c] = col.round(6).map(lambda v: f"{v:.6f}" if pd.notna(v) else None)
        else:
            df[c] = col.map(lambda v: str(v) if pd.notna(v) else None)
    rows = sorted(
        map(tuple, df.itertuples(index=False, name=None)),
        key=lambda r: tuple((v is None, v) for v in r),  # null-safe sort
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        el = time.time() - t0
        bad = unhashable_cols(sdf)
        if bad:
            print(f"FAIL  {name}: driver-unhashable column(s) {bad}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s) [rows-only]")
            if len(sdf) == 0 and name != "anti_join":
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK   " if ok else "FAIL "
        print(f"{status}{name}: spark {sn} rows {sh} | duckdb {on} rows {oh} ({el:.1f}s)")
        if not ok:
            failures += 1
            if sc != oc:
                print(f"      cols spark={sc} duckdb={oc}")
            if sn == on and sc == oc:
                merged = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
                omerged = odf[sorted(odf.columns)].sort_values(
                    sorted(odf.columns)
                ).reset_index(drop=True)
                for i in range(min(len(merged), 2000)):
                    a = canon(merged.iloc[[i]])[2]
                    b = canon(omerged.iloc[[i]])[2]
                    if a != b:
                        print("      first diff row", i)
                        print("      spark :", merged.iloc[i].to_dict())
                        print("      duckdb:", omerged.iloc[i].to_dict())
                        break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
