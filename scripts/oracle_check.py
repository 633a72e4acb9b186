#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over the sfDir
parquet tables, read the Spark result parquet, sort columns by name and
rows by all columns, and compare values (exact for non-floats; exact
after float64 cast for floats, with a tiny-tolerance fallback report).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].dropna().iloc[0] if len(df[c].dropna()) else None, bytes):
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, only=()) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # trailing argv names restrict the check (local iteration)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        want, got = norm(want), norm(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        mismatch = []
        for c in want.columns:
            a, b = want[c], got[c]
            try:
                if str(a.dtype) != str(b.dtype):
                    a = a.astype("float64") if a.dtype.kind in "ifc" else a.astype(str)
                    b = b.astype("float64") if b.dtype.kind in "ifc" else b.astype(str)
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    mismatch.append((c, int((~eq).sum())))
            except Exception as e:
                mismatch.append((c, f"cmp-error {e}"))
        if mismatch:
            print(f"FAIL {name}: value mismatches {mismatch}")
            for c, _ in mismatch[:2]:
                if not isinstance(_, str):
                    a, b = want[c], got[c]
                    bad = (a != b) & ~(a.isna() & b.isna())
                    print(f"  {c}: want={a[bad].head(3).tolist()} got={b[bad].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    # (no rows-only queries remain: `sketches` carries tolerance verdicts
    # hash-compared against literal TRUE in its oracle SQL)
    print(f"\n{n_pass} pass / {n_fail} fail")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
