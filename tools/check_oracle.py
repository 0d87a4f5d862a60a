#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
sfDir), and compares schema + values. Reports per-query PASS/FAIL.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                try:
                    neq = a.astype(object).ne(b.astype(object))
                except Exception:
                    neq = pd.Series([True] * len(a))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c} ({a.dtype} vs {b.dtype}) row {i}: {a[i]!r} vs {b[i]!r} ({int(neq.sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
