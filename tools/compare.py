#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet views, and
compares: column names (sorted), row count, and a hash over sorted rows.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare: timestamps → ns, floats stay float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            spark_df = pd.read_parquet(path)
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {e}"
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        # dtype drift is a hash-compare hazard even when values match
        dt = [
            (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
            for c in sorted(spark_df.columns)
            if str(spark_df[c].dtype) != str(duck_df[c].dtype)
        ]
        if dt:
            results[name] = f"DTYPE_MISMATCH {dt}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}"
            continue
        try:
            mismatch_cols = []
            for c in s.columns:
                sv, dv = s[c], d[c]
                if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                    # zero-row frames: .max() is NaN and NaN <= 0 is False —
                    # an empty-but-matching table must compare OK
                    ok = len(sv) == 0 or (
                        (sv.astype(float).fillna(-1e308) - dv.astype(float).fillna(-1e308))
                        .abs()
                        .max()
                        <= 0
                    )
                else:
                    ok = sv.astype(str).equals(dv.astype(str))
                if not ok:
                    mismatch_cols.append(c)
            if mismatch_cols:
                results[name] = f"VALUE_MISMATCH cols={mismatch_cols}"
                ex = None
                for c in mismatch_cols:
                    neq = s[c].astype(str) != d[c].astype(str)
                    idx = neq[neq].index[:3]
                    ex = [(c, list(s[c][idx]), list(d[c][idx]))]
                results[name] += f" examples={ex}"
            else:
                results[name] = f"OK rows={len(s)}"
        except Exception as e:
            results[name] = f"COMPARE_FAIL: {e}"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS_ONLY")) else "!!"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")


if __name__ == "__main__":
    main()
