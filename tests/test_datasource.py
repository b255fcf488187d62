"""Custom Python DataSource (sources/ohlcv_source.py): batch split
planning, deterministic values, streaming offsets, and checkpoint-
restart exactly-once."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from big_data_pr_spark.sources import register_sources
from big_data_pr_spark.sources.ohlcv_source import (
    DEFAULT_START_MS,
    HOUR_MS,
    synth_candle,
)


def _read(spark, **opts):
    register_sources(spark)
    r = spark.read.format("ohlcv_rest")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_partitions_per_symbol_page(spark):
    df = _read(spark, n_candles=250, page=100)
    # 3 symbols × ceil(250/100)=3 pages = 9 splits planned
    assert df.count() == 750
    assert (
        df.groupBy("symbol").count().filter(F.col("count") != 250).count() == 0
    )


def test_batch_values_deterministic_and_match_generator(spark):
    df = _read(spark, n_candles=10)
    rows = {
        (r["symbol"], r["timestamp"]): r
        for r in df.collect()
    }
    for s_idx, sym in enumerate(["BTC_USDT", "ETH_USDT", "SOL_USDT"]):
        for i in range(10):
            want = synth_candle(s_idx, sym, i, DEFAULT_START_MS, "1h")
            got = rows[(sym, DEFAULT_START_MS + i * HOUR_MS)]
            assert (
                got["open"], got["high"], got["low"], got["close"],
                got["volume"], got["datetime_str"],
            ) == (want[3], want[4], want[5], want[6], want[7], want[8])


def test_high_low_envelope_invariant(spark):
    df = _read(spark, n_candles=100)
    bad = df.filter(
        (F.col("high") < F.greatest("open", "close"))
        | (F.col("low") > F.least("open", "close"))
    )
    assert bad.count() == 0


def _drain_stream(spark, out_dir, ckpt, batch_candles=5, n_candles=15, timeout_s=60):
    register_sources(spark)
    stream = (
        spark.readStream.format("ohlcv_rest")
        .option("batch_candles", str(batch_candles))
        .option("n_candles", str(n_candles))
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        want = n_candles * 3
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= want:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_offsets_advance_and_bound(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain_stream(spark, out, ckpt, batch_candles=4, n_candles=12)
    got = spark.read.parquet(out)
    # every symbol got exactly n_candles rows, no duplicates
    assert got.count() == 36
    assert got.select("symbol", "timestamp").distinct().count() == 36


def test_stream_restart_resumes_exactly_once(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # first run: stop early (small timeout ⇒ partial drain is fine)
    _drain_stream(spark, out, ckpt, batch_candles=2, n_candles=10, timeout_s=8)
    first = spark.read.parquet(out).count()
    # second run from the SAME checkpoint must complete without dupes
    _drain_stream(spark, out, ckpt, batch_candles=2, n_candles=10)
    got = spark.read.parquet(out)
    assert got.count() >= first
    assert got.count() == got.select("symbol", "timestamp").distinct().count()
    assert got.count() == 30  # fully drained, exactly once


def test_source_feeds_three_query_topology_contract(spark, tmp_path):
    """The fully broker-less speed layer: custom streaming source →
    Kafka message contract (to_kafka_messages) → parse_stream →
    latest-snapshot aggregation, end-to-end in micro-batches. Verifies
    the source satisfies the same `value` payload contract the Kafka
    topic would carry, and the snapshot converges to each symbol's
    last generated candle."""
    from pyspark.sql import functions as F

    from big_data_pr_spark.sources.ohlcv_source import (
        DEFAULT_START_MS,
        HOUR_MS,
        synth_candle,
    )
    from big_data_pr_spark.streaming import pipeline as P

    register_sources(spark)
    n_candles = 8
    stream = (
        spark.readStream.format("ohlcv_rest")
        .option("batch_candles", "3")
        .option("n_candles", str(n_candles))
        .load()
        .withColumnRenamed("timestamp", "timestamp_ms")
    )
    parsed = P.parse_stream(P.to_kafka_messages(stream))
    snap = P.latest_snapshot(parsed)
    q = (
        snap.writeStream.outputMode("complete")
        .format("memory")
        .queryName("__src_snap")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        want_ts = DEFAULT_START_MS + (n_candles - 1) * HOUR_MS
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM __src_snap").collect()
            if len(rows) == 3 and all(r["timestamp_ms"] == want_ts for r in rows):
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = {r["symbol"]: r for r in spark.sql("SELECT * FROM __src_snap").collect()}
    assert set(got) == {"BTC_USDT", "ETH_USDT", "SOL_USDT"}
    for s_idx, sym in enumerate(sorted(got)):
        want = synth_candle(s_idx, sym, n_candles - 1, DEFAULT_START_MS, "1h")
        assert got[sym]["timestamp_ms"] == want[0]
        assert abs(got[sym]["current_price"] - want[6]) < 1e-9
