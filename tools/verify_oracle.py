#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle on the same parquet fixtures; compare
row-count, column names, and order-insensitive values.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from big_data_pr_spark.queries import REGISTRY  # noqa: E402
from big_data_pr_spark.session import get_spark  # noqa: E402
from big_data_pr_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    """Normalize a cell for comparison (timestamps/dates → isoformat str)."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent with enough digits
        return repr(v + 0.0)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    spec = REGISTRY[name]
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    scols = sdf.columns
    t_spark = time.time() - t0
    if spec.oracle is None:
        return True, f"rows-only ({len(srows)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    try:
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    except Exception as e:  # noqa: BLE001
        return False, f"ORACLE ERROR: {e}"
    t_duck = time.time() - t0
    if len(srows) != len(orows):
        return False, f"row count: spark={len(srows)} duckdb={len(orows)}"
    if sorted(scols) != sorted(ocols):
        return False, f"columns: spark={scols} duckdb={ocols}"
    # driver sorts columns by name before hashing — replicate
    s_idx = [scols.index(c) for c in sorted(scols)]
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_sorted = sorted((tuple(r[i] for i in s_idx) for r in srows), key=repr)
    o_sorted = sorted((tuple(r[i] for i in o_idx) for r in orows), key=repr)
    if s_sorted != o_sorted:
        ndiff = sum(1 for a, b in zip(s_sorted, o_sorted) if a != b)
        for a, b in zip(s_sorted, o_sorted):
            if a != b:
                return False, (
                    f"values differ ({ndiff}/{len(s_sorted)} rows)\n"
                    f"    spark : {a}\n    duckdb: {b}"
                )
    return True, f"OK ({len(srows)} rows, spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args or sorted(REGISTRY)
    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"SPARK ERROR: {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
