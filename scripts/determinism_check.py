#!/usr/bin/env python3
"""Cross-parallelism determinism check: compare two `graft.Verify`
dumps (e.g. SPARK_GRAFT_CPUS=8 vs =4) query by query — every result
must be bit-identical after the canonical sort (columns by name, rows
by all columns), or a query's output depends on partitioning, which
the 1000-executor deployment would surface as run-to-run flapping.

Usage: python3 scripts/determinism_check.py <dirA> <dirB>
"""
import os
import sys

import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(a_dir: str, b_dir: str) -> None:
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    bad = []
    for n in names:
        try:
            a = norm(pd.read_parquet(os.path.join(a_dir, n)))
            b = norm(pd.read_parquet(os.path.join(b_dir, n)))
            if not a.equals(b):
                bad.append(n)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            bad.append(f"{n} (read error: {e})")
    print(f"{len(names) - len(bad)} identical / {len(bad)} mismatched "
          f"of {len(names)}")
    for n in bad:
        print("MISMATCH", n)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
