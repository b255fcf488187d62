#!/usr/bin/env python
"""Per-query phase profiler (r13 optimization round).

Splits each query's bench time into its observable phases so the
optimization target is explicit before any change (guide §1.1):

- build_sec:  REGISTRY[name].fn(spark, sf_dir) — pure driver-side
  DataFrame construction (py4j round-trips, expression-tree size,
  any eager gate jobs the builder runs).
- exec_sec:   .count() on the built frame — analysis + optimization +
  job execution (the driver methodology's timed action).
- jobs:       Spark jobs submitted during build+exec (statusTracker
  delta) — a high count means driver round-trips / iterative loops,
  not one big scan.

Usage:
  python tools/phase_profile.py [sf_dir] query [query ...] [--reps N]
  python tools/phase_profile.py [sf_dir] --top N     # N slowest from BENCH_LOCAL.json
  python tools/phase_profile.py [sf_dir] --all       # whole registry

One JSON line per query (warm: min over reps, after one cold rep).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    argv = sys.argv[1:]
    reps = 2
    top_n = 0
    run_all = False
    names: list[str] = []
    sf_dir = "/root/testdata/sf0.1"
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif a == "--top":
            top_n = int(argv[i + 1]); i += 2
        elif a == "--all":
            run_all = True; i += 1
        elif os.path.isdir(a):
            sf_dir = a; i += 1
        else:
            names.append(a); i += 1

    from big_data_pr_spark.queries import REGISTRY
    from big_data_pr_spark.session import get_spark
    import bench

    if top_n:
        with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
            prev = json.load(f)["queries"]
        names = [n for n, _ in sorted(prev.items(), key=lambda kv: -kv[1])[:top_n]]
    elif run_all:
        names = [n for n in bench.HEADLINE if n in REGISTRY]
    if not names:
        print("usage: phase_profile.py [sf_dir] query... | --top N | --all",
              file=sys.stderr)
        return 2

    spark = get_spark("phase_profile")
    tracker = spark.sparkContext.statusTracker
    REGISTRY["q1_pricing"].fn(spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        if name not in REGISTRY:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        rows = []
        for _ in range(reps + 1):  # first rep is cold, dropped from mins
            j0 = tracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            j1 = tracker().getJobIdsForGroup(None)
            rows.append((t1 - t0, t2 - t1, len(set(j1) - set(j0))))
        warm = rows[1:]
        print(json.dumps({
            "query": name,
            "build_sec": round(min(r[0] for r in warm), 3),
            "exec_sec": round(min(r[1] for r in warm), 3),
            "total_sec": round(min(r[0] + r[1] for r in warm), 3),
            "cold_sec": round(rows[0][0] + rows[0][1], 3),
            "jobs": warm[-1][2],
        }), flush=True)
    print(json.dumps({"canary": bench.host_canary()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
