#!/usr/bin/env python
"""Standardized warm-floor probe (r12 verdict #3/#4).

Prior rounds measured warm floors with ad-hoc snippets; this pins the
methodology in one place so every SCALE.md floor row is reproducible:
ONE tuned session, cold first rep recorded separately, then ``--reps``
warm repetitions per query; the floor is the MIN, the median shows the
noise band. Host canary scalars from bench.py are stamped alongside so
a floor row carries its own host-speed context (r12 verdict #3: driver
readings are gradeable against floors + canary in one pass).

Usage:
  python tools/warm_floor.py [sf_dir] query [query ...] [--reps N]

Prints one JSON line per query plus a canary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 10
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1]
            )
    args = [a for a in args if not a.isdigit()]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"

    from big_data_pr_spark.queries import REGISTRY
    from big_data_pr_spark.session import get_spark
    import bench

    names = args or []
    if not names:
        print("usage: warm_floor.py [sf_dir] query [query ...]", file=sys.stderr)
        return 2
    spark = get_spark("warm_floor")
    # same warmups as bench.py so rep 1 is 'cold query', not 'cold JVM'
    REGISTRY["q1_pricing"].fn(spark, sf_dir).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            warm.append(time.perf_counter() - t0)
        print(json.dumps({
            "query": name,
            "sf_dir": sf_dir,
            "cold_sec": round(cold, 3),
            "warm_floor_sec": round(min(warm), 3),
            "warm_median_sec": round(statistics.median(warm), 3),
            "reps": reps,
        }))
    print(json.dumps({"canary": bench.host_canary()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
