#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark output) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same parquet
tables, then compares: column names (sorted), row counts, and exact values
after sorting columns by name and rows by all columns.  Reports per-query
PASS/FAIL plus max float deltas to tune rounding.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        if not Path(spark_path).exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM parquet_scan('{spark_path}/*.parquet')").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"cols got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rows got={len(got)} want={len(want)}")
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                # The driver hashes the serialized frame, so an int64-vs-
                # float64 skew (DuckDB sum→HUGEINT→float, round→DOUBLE)
                # fails there even when values are equal. Mirror that:
                # int-on-one-side + float-on-the-other is a hard FAIL.
                if pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(w) and \
                        pd.api.types.is_numeric_dtype(g) and pd.api.types.is_numeric_dtype(w):
                    probs.append(f"col {c}: dtype skew got={g.dtype} want={w.dtype} (driver hash would fail)")
                elif pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                    ga = pd.to_numeric(g, errors="coerce")
                    wa = pd.to_numeric(w, errors="coerce")
                    d = (ga - wa).abs().max()
                    if not (d == 0 or (isinstance(d, float) and math.isnan(d) and ga.isna().equals(wa.isna()))):
                        if d > 0:
                            probs.append(f"col {c}: max float delta {d}")
                else:
                    eq = g.astype(str).equals(w.astype(str))
                    if not eq:
                        bad = (g.astype(str) != w.astype(str)).idxmax()
                        probs.append(f"col {c}: first diff row {bad}: got={g[bad]!r} want={w[bad]!r}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
