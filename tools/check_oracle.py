#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--strict]

Exit codes: 0 all pass; 1 at least one stable failure; 2 no failures
but flake-suspects present (first compare differed, idle rerun matched
-- re-adjudicate on an idle box). --strict folds exit 2 into exit 1
for CI wrappers that treat any nonzero as hard failure.

Loads each <name>.parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
sfDir), and compares schema + values. Reports per-query PASS/FAIL.
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def value_diffs(got: pd.DataFrame, want: pd.DataFrame):
    """Per-column exact compare (floats bit-equal, NaN==NaN)."""
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
            diffs.append(f"col {c} ({a.dtype} vs {b.dtype}) row {i}: "
                         f"{a[i]!r} vs {b[i]!r} ({int(neq.sum())} diffs)")
    return diffs


def wait_near_idle(max_wait: float = 60.0):
    """Block (up to max_wait) until 1-min loadavg drops under the CPU
    count — the flake needs a saturated box, so the retry should not
    run under the same conditions that produced the first reading."""
    cpus = os.cpu_count() or 1
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < cpus:
            return
        time.sleep(5.0)


def main(sf_dir: str, out_dir: str, strict: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    flake_suspects = 0
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
        diffs = value_diffs(got, want)
        if diffs:
            # DuckDB under load returns wrong AGGREGATE VALUES while the
            # Spark parquet on disk is bit-identical to passing runs
            # (adjudicated rounds 10+11; see memory + VERDICT.md). A
            # value-only mismatch therefore gets ONE retry of the ORACLE
            # side after a short idle wait: the Spark result is frozen on
            # disk, so a rerun that now matches convicts the oracle
            # harness, not the engine. Reported distinctly as
            # FLAKE_SUSPECT so stable diffs stay loud.
            time.sleep(3.0)
            wait_near_idle()
            try:
                want2 = norm(con.sql(sql).df())
                diffs2 = value_diffs(got, want2) \
                    if list(got.columns) == list(want2.columns) \
                    and len(got) == len(want2) else ["shape changed on rerun"]
            except Exception as e:
                diffs2 = [f"{type(e).__name__}: {e}"]
            if not diffs2:
                flake_suspects += 1
                print(f"FLAKE_SUSPECT {name}: first compare differed, idle rerun matches"
                      f" ({len(got)} rows) [first: " + "; ".join(diffs) + "]")
            else:
                print(f"FAIL {name}: " + "; ".join(diffs)
                      + " [stable: idle rerun still differs: "
                      + "; ".join(diffs2) + "]")
                failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    # FLAKE_SUSPECT is counted and surfaced separately from failures: a
    # coincidentally-matching rerun of a genuinely nondeterministic
    # oracle must not read as a clean pass — exit code 2 tells the
    # caller to re-adjudicate those queries on an idle box.
    print(f"\n{len(oracle) - failures - flake_suspects}/{len(oracle)} oracle "
          f"queries pass, {flake_suspects} flake-suspect, {failures} fail")
    if failures:
        return 1
    if flake_suspects:
        return 1 if strict else 2
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    sys.exit(main(args[0], args[1], strict="--strict" in sys.argv))
