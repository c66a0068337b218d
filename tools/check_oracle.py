#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in <sfDir> as a DuckDB view, runs every SQL
in <verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
values compared exactly (floats to 1e-9 relative as a diagnostic aid).

This script is a local test harness only; the shipped library has no
Python or DuckDB dependency.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            oracle = load_sorted(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        got = load_sorted(pd.concat([pd.read_parquet(f) for f in files]))
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if list(got.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(got) != len(oracle):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(oracle)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], oracle[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                bad = ~np.isclose(a.astype(float), b.astype(float),
                                  rtol=0, atol=0, equal_nan=True)
                exact_bad = int(bad.sum())
                if exact_bad:
                    close_bad = int((~np.isclose(a.astype(float), b.astype(float),
                                                 rtol=1e-9, equal_nan=True)).sum())
                    mismatch = f"col {c}: {exact_bad} exact diffs ({close_bad} beyond 1e-9 rel)"
                    break
            else:
                if not a.equals(b):
                    mismatch = f"col {c}: {int((a != b).sum())} diffs"
                    break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
