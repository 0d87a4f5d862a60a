#!/usr/bin/env python3
"""Lint the rendered oracle SQL for the MATERIALIZED CTE pins.

Usage: python3 tools/lint_oracles.py <verifyOutDir-or-oracle_sql.json>

DuckDB inlines WITH-CTEs per reference, so any oracle embedding the
unrolled BPE round chain (signature: the `wrapped` symbol column of
the training CTEs) re-derives the whole training history
combinatorially many times unless its CTEs are pinned with
`AS MATERIALIZED` (TextQueries.mat). Removing one pin regresses that
oracle alone to ~134 s at sf0.01 — which blows the driver's
correctness-gate budget and can zero a round's artifact. This lint
fails loudly if any chain-bearing oracle has lost its pins.

Exit 0 = all pinned; 1 = at least one chain-bearing oracle unpinned.
"""
import json
import os
import sys


def main(path: str) -> int:
    if os.path.isdir(path):
        path = os.path.join(path, "oracle_sql.json")
    with open(path) as f:
        oracles = json.load(f)
    # the unrolled BPE training chain's signature column; every oracle
    # carrying the chain must pin its CTEs
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


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
