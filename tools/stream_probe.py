#!/usr/bin/env python
"""Probe the streaming per-trigger floor (r7 verdict #6).

BENCH_LOCAL's `streaming_breakdown` shows ~4.6-7 s warm wall-clock for
200 k rows through the three-query topology with `addBatch` dominating.
This probe measures the same warm topology (identical input builder to
bench.streaming_rows_per_sec) under the three knobs the verdict names:

- `spark.sql.shuffle.partitions` for the stateful queries (each state
  partition pays store open/commit per micro-batch; at this state size
  fewer partitions may beat 32),
- HDFS-backed (default) vs RocksDB state store provider,
- foreachBatch write parallelism (coalesce before the keyed sinks).

Each variant runs on a FRESH SparkSession (state-store provider and the
streaming shuffle-partition binding are fixed at first batch, and a
session-level conf leak would contaminate the next variant). Prints one
JSON line per variant; paste the curve into SCALE.md.

Usage: python tools/stream_probe.py [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def build_input(spark, sf_dir: str, rows: int, out: str) -> int:
    from pyspark.sql import functions as F

    from big_data_pr_spark.timeutil import epoch_millis

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_avail = ev.count()
    if 0 < n_avail < rows:
        mult = -(-rows // n_avail)
        ev = ev.crossJoin(
            spark.range(mult).withColumnRenamed("id", "__rep")
        ).drop("__rep")
    msgs = ev.limit(rows).select(
        F.to_json(
            F.struct(
                epoch_millis("ts").alias("timestamp"),
                F.col("event_type").alias("symbol"),
                F.lit("1m").alias("timeframe"),
                (F.col("value") - 0.5).alias("open"),
                (F.col("value") + 1.0).alias("high"),
                (F.col("value") - 1.0).alias("low"),
                F.col("value").alias("close"),
                F.lit(1.0).alias("volume"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "datetime_str"
                ),
            )
        ).alias("value")
    )
    msgs.repartition(8).write.mode("overwrite").text(out)
    return spark.read.text(out).count()


def run_variant(name: str, confs: dict, rows: int, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    from big_data_pr_spark.streaming import pipeline

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stream-probe-{name}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
    )
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    work = tempfile.mkdtemp(prefix=f"probe_{name}_")
    try:
        in_dir = os.path.join(work, "in")
        n_rows = build_input(spark, sf_dir, rows, in_dir)
        # warm: first streaming run pays state-store/sink/codegen
        # first-touch (~9 s); per-trigger floor is the warm number
        warm_in = os.path.join(work, "warm_in")
        spark.read.text(in_dir).limit(1000).write.mode("overwrite").text(
            warm_in
        )
        for q in pipeline.start_three_queries(
            pipeline.file_source(spark, warm_in),
            os.path.join(work, "warm_out"),
            os.path.join(work, "warm_cp"),
        ):
            q.awaitTermination(300)
        t0 = time.time()
        queries = pipeline.start_three_queries(
            pipeline.file_source(spark, in_dir),
            os.path.join(work, "out"),
            os.path.join(work, "cp"),
        )
        for q in queries:
            q.awaitTermination(600)
        wall = time.time() - t0
        add_batch = {}
        for q in queries:
            p = q.lastProgress
            if p:
                add_batch[p["name"]] = p["durationMs"].get("addBatch")
        return {
            "variant": name,
            "rows": n_rows,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n_rows / wall, 1),
            "addBatch_ms": add_batch,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


VARIANTS: list[tuple[str, dict]] = [
    ("baseline_hdfs_sp32", {}),
    ("hdfs_sp8", {"spark.sql.shuffle.partitions": "8"}),
    ("hdfs_sp4", {"spark.sql.shuffle.partitions": "4"}),
    ("hdfs_sp16", {"spark.sql.shuffle.partitions": "16"}),
    ("rocksdb_sp32", {"spark.sql.streaming.stateStore.providerClass": ROCKSDB}),
    ("rocksdb_sp8", {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB,
        "spark.sql.shuffle.partitions": "8",
    }),
    # the watermark-advance no-data batch costs a full trigger cycle on
    # the stateful query; this topology (complete/update modes +
    # stateless append) emits everything on data batches already
    ("hdfs_sp8_nodata_off", {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    }),
]


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name, confs in VARIANTS:
        try:
            res = run_variant(name, confs, rows, sf_dir)
        except Exception as exc:  # keep probing the remaining variants
            res = {"variant": name, "error": str(exc)[:300]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
