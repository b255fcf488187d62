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


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run_sustained(
    rows: int,
    sf_dir: str,
    n_batches: int = 12,
    bootstrap_tail_minutes: int | None = None,
) -> dict:
    """Sustained multi-batch run (r8 verdict #4: the driver bench's
    `batches: 1` measures one trigger; state accumulation in complete
    mode and checkpoint growth need a curve). The input is split into
    ``n_batches`` single-file chunks and the SAME three-query topology
    consumes them under ``maxFilesPerTrigger=1`` + availableNow, so
    each chunk is exactly one micro-batch. Per-batch trigger wall,
    input rows and stateOperators row counts come from recentProgress;
    checkpoint size is measured at the end (monotone by construction —
    commit/offset logs append per batch).

    ``bootstrap_tail_minutes`` exercises the r9 bootstrap rule as code
    (pipeline.start_three_queries(bootstrap_watermark=...)): the
    stream owns only the last N event-time minutes of the replayed
    history — everything older is the batch backfill's job — so the
    batch-0 state spike (state ∝ history span when chunks span the
    whole time range) must disappear. Throughput is reported over
    SCANNED rows, so compare state curves, not rows/s, across the
    bootstrap and plain variants."""
    from pyspark.sql import SparkSession

    from big_data_pr_spark.streaming import pipeline

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-probe-sustained")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the r8 winning pair (SCALE.md round-8 curve)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="probe_sustained_")
    try:
        staged = os.path.join(work, "staged")
        n_rows = build_input(spark, sf_dir, rows, staged)
        # re-chunk: one file per batch, so maxFilesPerTrigger=1 gives a
        # deterministic batch count
        full = spark.read.text(staged)
        per = -(-n_rows // n_batches)
        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        from pyspark.sql import functions as F

        # SEQUENTIAL chunks (coalesce(1) makes the ids contiguous):
        # each batch advances event time like a real stream — chunking
        # by id % n would make every batch span the full time range, so
        # the watermark set by batch 0 late-drops most of batches 1..n
        chunked = full.coalesce(1).withColumn(
            "__chunk",
            F.least(
                F.lit(n_batches - 1),
                (F.monotonically_increasing_id() / per).cast("int"),
            ),
        )
        for i in range(n_batches):
            chunked.filter(F.col("__chunk") == i).drop("__chunk").coalesce(
                1
            ).write.mode("overwrite").text(os.path.join(in_dir, f"b{i:03d}"))
        # warm run (state-store/sink/codegen first-touch)
        warm_in = os.path.join(work, "warm_in")
        full.limit(1000).write.mode("overwrite").text(warm_in)
        for q in pipeline.start_three_queries(
            pipeline.file_source(spark, warm_in),
            os.path.join(work, "warm_out"),
            os.path.join(work, "warm_cp"),
        ):
            q.awaitTermination(300)
        source = (
            spark.readStream.schema("value STRING")
            .format("text")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .load(in_dir)
        )
        cp = os.path.join(work, "cp")
        bootstrap = None
        if bootstrap_tail_minutes is not None:
            max_ts = (
                full.select(
                    F.get_json_object("value", "$.timestamp")
                    .cast("long")
                    .alias("t")
                )
                .agg(F.max("t"))
                .collect()[0][0]
            )
            import datetime as dt

            bootstrap = dt.datetime.fromtimestamp(
                max_ts / 1000 - bootstrap_tail_minutes * 60, dt.timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S")
        t0 = time.time()
        queries = pipeline.start_three_queries(
            source, os.path.join(work, "out"), cp, bootstrap_watermark=bootstrap
        )
        for q in queries:
            q.awaitTermination(1200)
        wall = time.time() - t0
        per_query: dict[str, dict] = {}
        steady: list[float] = []
        for q in queries:
            batches = []
            for p in q.recentProgress:
                if p.get("numInputRows", 0) == 0 and not batches:
                    continue  # leading empty batch
                state = [
                    so.get("numRowsTotal") for so in p.get("stateOperators", [])
                ]
                batches.append(
                    {
                        "batch": p["batchId"],
                        "rows": p["numInputRows"],
                        "trigger_ms": p["durationMs"].get("triggerExecution"),
                        "addBatch_ms": p["durationMs"].get("addBatch"),
                        "state_rows": state,
                    }
                )
            name = batches and q.lastProgress and q.lastProgress["name"] or q.name
            per_query[q.name] = {
                "n_batches": len(batches),
                "batches": batches,
            }
            steady += [
                b["trigger_ms"] / 1000.0
                for b in batches[2:]
                if b["trigger_ms"] is not None
            ]
        steady_med = sorted(steady)[len(steady) // 2] if steady else None
        return {
            "variant": (
                f"sustained_{n_batches}x{per}"
                + (
                    f"_bootstrap{bootstrap_tail_minutes}m"
                    if bootstrap_tail_minutes is not None
                    else ""
                )
            ),
            "bootstrap_watermark": bootstrap,
            "rows": n_rows,
            "n_batches": n_batches,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n_rows / wall, 1),
            "steady_trigger_s_median": round(steady_med, 3) if steady_med else None,
            "checkpoint_bytes": _dir_bytes(cp),
            "per_query": per_query,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    if "--bootstrap" in sys.argv and "--sustained" not in sys.argv:
        sys.exit("usage: --bootstrap N requires --sustained")
    if "--sustained" in sys.argv:
        tail = None
        if "--bootstrap" in sys.argv:
            i = sys.argv.index("--bootstrap")
            if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
                sys.exit("usage: --bootstrap <tail-minutes> (integer)")
            tail = int(sys.argv[i + 1])
            del sys.argv[i : i + 2]
        args = [a for a in sys.argv[1:] if a != "--sustained"]
        rows = int(args[0]) if args else 200_000
        n_batches = int(args[1]) if len(args) > 1 else 12
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(
            json.dumps(run_sustained(rows, sf_dir, n_batches, tail)), flush=True
        )
        return
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
