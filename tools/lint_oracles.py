#!/usr/bin/env python3
"""Lint the verify dump: MATERIALIZED CTE pins + compare-surface width.

Usage: python3 tools/lint_oracles.py <verifyOutDir-or-oracle_sql.json>

Check 1 — MATERIALIZED pins. DuckDB inlines WITH-CTEs per reference, so
any oracle embedding the unrolled BPE round chain (signature: the
`wrapped` symbol column of the training CTEs) re-derives the whole
training history combinatorially many times unless its CTEs are pinned
with `AS MATERIALIZED` (TextQueries.mat). Removing one pin regresses
that oracle alone to ~134 s at sf0.01 — which blows the driver's
correctness-gate budget and can zero a round's artifact.

Check 2 — compare-surface width (needs the dump dir, skipped when given
only oracle_sql.json). The round driver's correctness checker compares
Spark parquet vs DuckDB ONCE, with no idle retry; under host load that
single-shot value compare has flaked exactly on WIDE columns — r16
`sim_ann_opq_drift` (DECIMAL(38,0) masses), r17 `dedup_substring_scrub`
(long-VARCHAR clean_text) — while the engine was bit-exact both times.
The engine rule (VERDICT r17 #1): every driver-compared column must be
narrow; a WIDE value is folded to a 60-bit md5 fingerprint in BOTH
engines, with the raw value pinned by a ScalaTest spec instead. This
lint FAILS on the demonstrated flake classes:
  - any DECIMAL / HUGEINT output column (r16's flake: DECIMAL(38,0)
    masses — up to 39 rendered digits),
  - any VARCHAR column whose max length exceeds MAX_VARCHAR (r17's
    flake: the scrub's multi-KB clean_text; keys and enum-likes pass,
    prose / JSON pages / token streams do not).

DOUBLE/FLOAT are deliberately ALLOWED: they are fixed 8-byte values,
not wide renders — ~60 registered outputs carry doubles (TPC-H sums,
cosines, ratios) and have compared bit-stable across 17 rounds and
thousands of single-shot compares, while both observed flakes were on
genuinely wide surfaces (a 38-digit integer render, a 5 KB string).
Folding them would rewrite TPC-H-semantic columns (rel_q1.sum_qty)
against zero demonstrated risk. If a double column EVER flakes, move
it to the fail set and fold that family.

Exit 0 = clean; 1 = violation.
"""
import json
import os
import sys

MAX_VARCHAR = 64

# The demonstrated wide-render classes. VARCHAR is width-checked
# separately; everything else (BIGINT/INT/BOOLEAN/DOUBLE/DATE/...) is
# a fixed-width value the single-shot compare has never flaked on.
WIDE_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def lint_pins(oracles) -> int:
    bearing = {k: v for k, v in oracles.items() if "wrapped" in v}
    unpinned = sorted(k for k, v in bearing.items()
                      if " AS MATERIALIZED (" not in v)
    print(f"{len(oracles)} oracles; {len(bearing)} carry the BPE chain; "
          f"{len(bearing) - len(unpinned)} pinned")
    if unpinned:
        for k in unpinned:
            print(f"UNPINNED {k}: BPE-chain oracle without AS MATERIALIZED "
                  f"— DuckDB CTE inlining will re-derive the chain "
                  f"combinatorially (measured 134 s for one oracle at "
                  f"sf0.01); restore the TextQueries.mat wrapper")
        return 1
    # a pinned-count floor: the token/mm family is >= 14 oracles — a
    # refactor that silently drops the chain signature (and with it the
    # lint's coverage) must fail here, not pass vacuously
    if len(bearing) < 14:
        print(f"SUSPECT: only {len(bearing)} oracles match the BPE-chain "
              f"signature (expected >= 14) — the signature or the family "
              f"shrank; update the lint alongside the refactor")
        return 1
    print("OK: all BPE-chain oracles pinned")
    return 0


def lint_width(dump_dir: str) -> int:
    import duckdb
    con = duckdb.connect()
    bad = []
    names = sorted(d for d in os.listdir(dump_dir)
                   if os.path.isdir(os.path.join(dump_dir, d)))
    n_cols = 0
    for name in names:
        glob = os.path.join(dump_dir, name, "*.parquet")
        try:
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{glob}')").fetchall()
        except Exception as e:  # noqa: BLE001 — surface as a violation
            bad.append((name, "*", f"unreadable dump: {e}"))
            continue
        for cname, ctype, *_ in cols:
            n_cols += 1
            t = ctype.upper()
            if t == "VARCHAR":
                w = con.execute(
                    f"SELECT COALESCE(MAX(length(\"{cname}\")), 0) "
                    f"FROM read_parquet('{glob}')").fetchone()[0]
                if w > MAX_VARCHAR:
                    bad.append((name, cname,
                                f"VARCHAR max length {w} > {MAX_VARCHAR} — "
                                f"fold to a 60-bit md5 fingerprint "
                                f"(Md5Long60Expr / DuckDB md5-prefix twin) "
                                f"and pin the raw value in a ScalaTest spec"))
            elif any(t.startswith(wt) for wt in WIDE_TYPES):
                bad.append((name, cname,
                            f"type {ctype} — the single-shot DuckDB compare "
                            f"flaked on a wide-integer render under load "
                            f"(r16); fold to BIGINT (exact DIV dials or "
                            f"md5-60 fingerprint)"))
    print(f"width lint: {len(names)} dumps, {n_cols} compare columns")
    for name, cname, why in bad:
        print(f"WIDE {name}.{cname}: {why}")
    if not bad:
        print(f"OK: every compare column is BIGINT/BOOLEAN/short-VARCHAR "
              f"(<= {MAX_VARCHAR} chars)")
    return 1 if bad else 0


def main(path: str) -> int:
    dump_dir = None
    if os.path.isdir(path):
        dump_dir = path
        path = os.path.join(path, "oracle_sql.json")
    with open(path) as f:
        oracles = json.load(f)
    rc = lint_pins(oracles)
    if dump_dir is not None:
        rc = max(rc, lint_width(dump_dir))
    else:
        print("note: width lint skipped (pass the dump DIR to enable)")
    return rc


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
