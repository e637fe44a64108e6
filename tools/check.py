#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the tables
in <sfDir>, sorts columns by name, and compares values. Builder-side tool
only; the real gate is driver-run.
"""
import sys, os, json, glob

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_bad = 0
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracles:
            print(f"  ~ {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"  ✗ {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"  ✗ {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True)
            print(f"  ✓ {name} ({len(got)} rows)")
        except AssertionError as e:
            n_bad += 1
            print(f"  ✗ {name}: VALUES differ\n{str(e)[:800]}")
    print(f"{'FAIL' if n_bad else 'OK'}: {len(names) - n_bad}/{len(names)} match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
