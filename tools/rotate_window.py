#!/usr/bin/env python
"""Plan the next round's driver window rotation.

Reads DRIVER_LEDGER.json (regenerate first with tools/ledger_update.py
after the new CORRECTNESS file lands) and the query registry, and
reports: which oracle-backed queries have never been driver-verified
(these MUST take window slots — the guard test enforces it), which
current-window entries are re-verifications that can rotate out, and
how many free slots the next window has.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from big_data_pr_spark.queries import REGISTRY  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    with open(os.path.join(ROOT, "DRIVER_LEDGER.json")) as f:
        ledger = json.load(f)["queries"]
    oracle_backed = {n for n, s in REGISTRY.items() if s.oracle is not None}
    rows_only = set(REGISTRY) - oracle_backed
    never_oracle = sorted(oracle_backed - set(ledger))
    never_rows = sorted(rows_only - set(ledger))
    window = list(entry._FRONT)
    reverify = [n for n in window if n in ledger]

    print(f"registry: {len(REGISTRY)} ({len(oracle_backed)} oracle, "
          f"{len(rows_only)} rows-only); ledger: {len(ledger)} driver-verified")
    print(f"\nnever-verified ORACLE queries ({len(never_oracle)}) — "
          "must occupy window slots (guard-enforced):")
    for n in never_oracle:
        marker = "in-window" if n in window else "** MISSING FROM WINDOW **"
        print(f"  {n}  [{marker}]")
    print(f"\nnever-run ROWS-ONLY queries ({len(never_rows)}) — optional slots:")
    for n in never_rows:
        print(f"  {n}{'  [in-window]' if n in window else ''}")
    print(f"\ncurrent window re-verifications ({len(reverify)}) — rotation "
          "candidates once their families stay covered:")
    for n in reverify:
        kinds = {e["kind"] for e in ledger[n]}
        print(f"  {n}  (verified r{sorted(e['round'] for e in ledger[n])}, "
              f"{'/'.join(sorted(kinds))})")
    free = 50 - len([n for n in window if n not in ledger])
    print(f"\nwindow capacity: 50; never-verified in window: "
          f"{len([n for n in window if n not in ledger])}; "
          f"slots spendable on re-verification/rotation: {free}")


if __name__ == "__main__":
    main()
