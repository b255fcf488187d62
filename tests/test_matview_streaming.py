"""Streaming continuous aggregate (streaming/matview_sink.py):
stream-fold ≡ batch recompute, and watermark-guarded replay idempotency
across checkpoint restart."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from big_data_pr_spark.operators import matview, versioned
from big_data_pr_spark.sources import register_sources
from big_data_pr_spark.streaming.matview_sink import start_matview_refresh

AGGS = {"n": ("count", "*"), "vol": ("sum", "volume")}


def _mk_stream(spark, n_candles, batch_candles):
    register_sources(spark)
    return (
        spark.readStream.format("ohlcv_rest")
        .option("n_candles", str(n_candles))
        .option("batch_candles", str(batch_candles))
        .load()
        .withColumn("ts_event", F.timestamp_millis(F.col("timestamp")))
    )


def _batch_equiv(spark, n_candles):
    register_sources(spark)
    return (
        spark.read.format("ohlcv_rest")
        .option("n_candles", str(n_candles))
        .load()
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("volume").alias("vol"))
    )


def _create_empty_mv(spark, d):
    empty = (
        spark.createDataFrame(
            [], "symbol string, volume double, ts_event timestamp"
        )
    )
    matview.create(empty, d, ["symbol"], AGGS, "ts_event")


def _run_until_folded(spark, d, ckpt, n_candles, batch_candles, timeout_s=90):
    """availableNow only drains the Simple reader's first prefetched
    range, so run with a processingTime trigger and poll the MV until
    every candle is folded (n per symbol == n_candles)."""
    q = start_matview_refresh(
        _mk_stream(spark, n_candles, batch_candles),
        d,
        ckpt,
        trigger="1 second",
    )
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            rows = matview.read(spark, d).collect()
            if rows and all(r["n"] == n_candles for r in rows):
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_fold_equals_batch_recompute(spark, tmp_path):
    d = str(tmp_path / "mv")
    _create_empty_mv(spark, d)
    _run_until_folded(spark, d, str(tmp_path / "ckpt"), 12, 5)
    got = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in matview.read(spark, d).collect()
    }
    want = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in _batch_equiv(spark, 12).collect()
    }
    assert got == want
    # one MVCC version per non-empty micro-batch: the epoch history
    assert versioned.current_version(d) >= 2


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-delivering an already-folded micro-batch (what Structured
    Streaming does after a crash) must no-op via the watermark gate."""
    d = str(tmp_path / "mv")
    _create_empty_mv(spark, d)
    _run_until_folded(spark, d, str(tmp_path / "ckpt"), 9, 3)
    v = versioned.current_version(d)
    before = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in matview.read(spark, d).collect()
    }
    # replay the FULL already-folded stream content as one batch
    register_sources(spark)
    replay = (
        spark.read.format("ohlcv_rest")
        .option("n_candles", "9")
        .load()
        .withColumn("ts_event", F.timestamp_millis(F.col("timestamp")))
    )
    res = matview.refresh(spark, d, replay)
    assert res == {"refreshed": False, "delta_rows": 0, "version": v}
    after = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in matview.read(spark, d).collect()
    }
    assert after == before


def test_restart_from_checkpoint_no_double_count(spark, tmp_path):
    d = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    _create_empty_mv(spark, d)
    # first run: stop mid-stream (short timeout ⇒ partial fold is fine)
    _run_until_folded(spark, d, ckpt, 10, 2, timeout_s=6)
    # restart from the same checkpoint: Structured Streaming re-delivers
    # the in-flight batch; rows at/below the committed watermark no-op
    _run_until_folded(spark, d, ckpt, 10, 2)
    got = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in matview.read(spark, d).collect()
    }
    want = {
        r["symbol"]: (r["n"], round(r["vol"], 6))
        for r in _batch_equiv(spark, 10).collect()
    }
    assert got == want
