#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views named
after the parquet test tables in <sfDir>, and compares against the Spark
result parquet at <verifyOutDir>/<name>/. Columns are sorted by name before
comparing (like the driver); rows are compared in order (queries must end in
a total ORDER BY). Exits non-zero on any mismatch.
"""
import json
import sys
import glob

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def normalize(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    problems = []
    s, o = normalize(spark_df), normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        return [f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        problems.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            problems.append(f"col {c}: dtype spark={sv.dtype} oracle={ov.dtype}")
        try:
            if sv.dtype.kind == "f":
                a, b = sv.to_numpy(), ov.to_numpy(dtype=sv.dtype)
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
                if not eq.all():
                    i = int(np.argmin(eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} value mismatches, first at row {i}: "
                        f"spark={a[i]!r} oracle={b[i]!r} (diff={a[i]-b[i]!r})")
            else:
                eq = (sv.astype(object).where(sv.notna(), None)
                      == ov.astype(object).where(ov.notna(), None))
                eq = eq | (sv.isna() & ov.isna())
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} value mismatches, first at row {i}: "
                        f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle_sql):
        spark_df = load_spark_result(f"{out_dir}/{name}")
        if spark_df is None:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            oracle_df = con.sql(oracle_sql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
    # flag queries with results but no oracle (rows-only check)
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle_sql:
            df = load_spark_result(f"{out_dir}/{d}")
            print(f"info {d}: rows-only ({0 if df is None else len(df)} rows)")
    print(f"{'FAILED' if n_fail else 'PASSED'}: {n_fail} failures / {len(oracle_sql)} oracle queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
