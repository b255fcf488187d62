#!/usr/bin/env python
"""Regenerate DRIVER_LEDGER.json from every CORRECTNESS_r*.json at the
repo root.

The driver verifies only the first 50 ``queries()`` entries per round,
so cumulative coverage is tracked here: a query is "driver-verified"
once any round's window recorded it green — ``kind: oracle`` when the
value hash matched, ``kind: rows_only`` when the weaker no-oracle check
ran (driver records spark_rows only). ``__spark_entry__._FRONT`` is
rotated each round so never-verified oracle-backed queries get window
slots first (guard: tests/test_queries_oracle.py::
test_driver_ledger_consistent).

Usage: python tools/ledger_update.py   # run after each round's
                                       # CORRECTNESS file lands
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTE = (
    "Cumulative driver-verified queries: every query name that has "
    "received a green row in a CORRECTNESS_r{N}.json driver window. "
    "kind=oracle means hash_match true; kind=rows_only means the weaker "
    "rows-only check ran (no DuckDB oracle; driver records spark_rows "
    "only). Used to rotate __spark_entry__._FRONT each round so the "
    "50-slot window prioritizes never-verified queries. Regenerate with "
    "tools/ledger_update.py."
)


def build() -> dict:
    green: dict[str, list[dict]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") == "no_oracle":
                ok, kind = rec.get("spark_rows") is not None, "rows_only"
            else:
                ok, kind = bool(rec.get("hash_match")), "oracle"
            if ok:
                entries = green.setdefault(name, [])
                if not any(e["round"] == rnd for e in entries):
                    entries.append({"round": rnd, "kind": kind})
    return {"note": NOTE, "queries": dict(sorted(green.items()))}


def main() -> None:
    ledger = build()
    out = os.path.join(ROOT, "DRIVER_LEDGER.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(ledger['queries'])} driver-verified queries")


if __name__ == "__main__":
    main()
