#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

Reads each <out>/<name>/ parquet (Spark result) and runs the matching
SQL from <out>/oracle_sql.json in DuckDB over the same sf tables.
Compares: schema (column names sorted), row count, and exact values
(rows sorted by all columns). Reports per-query PASS/FAIL with diffs.
"""
import sys, os, glob, json
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            # decimals from duckdb -> float-safe string compare via repr
            if len(s) and type(s.iloc[0]).__name__ == "Decimal":
                df[c] = s.astype("float64")
    # sort rows deterministically
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_fail += 1; continue
        spark_df = pq.ParquetDataset(files).read().to_pandas()
        if name not in oracle:
            print(f"[SKIP] {name}: no oracle ({len(spark_df)} rows)"); n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_fail += 1; continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        bad = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if pd.api.types.is_float_dtype(a[c]):
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
                if not eq.all():
                    mx = np.nanmax(np.abs(av - bv))
                    bad.append(f"{c} (maxdiff={mx:g}, {int((~eq).sum())} rows)")
            else:
                eq = (pd.Series(av).astype(str).values == pd.Series(bv).astype(str).values)
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c} (first diff row {i}: {av[i]!r} vs {bv[i]!r})")
        if bad:
            print(f"[FAIL] {name}: value diffs: {'; '.join(bad)}"); n_fail += 1
        else:
            print(f"[PASS] {name} ({len(a)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
