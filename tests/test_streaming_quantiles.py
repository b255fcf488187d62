"""Streaming DDSketch quantiles: relative-error guarantee, merge
algebra, batch/stream agreement, exactly-once under replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import versioned
from big_data_pr_spark.streaming.quantile_sink import (
    ALPHA,
    batch_buckets,
    current_quantiles,
    estimate_quantiles,
    fold_batch,
    merge_buckets,
    start_quantile_stream,
)

QS = [0.5, 0.9, 0.99]


def _vals(spark, lo, hi):
    # deterministic positively-skewed values incl. zeros and negatives
    return spark.range(lo, hi).select(
        (
            F.when(F.col("id") % 50 == 0, F.lit(0.0))
            .when(F.col("id") % 7 == 0, -(F.col("id") % 97) - 1.0)
            .otherwise(F.pow(F.col("id") % 1000 + 1, 1.5))
        ).alias("value")
    )


def test_relative_error_guarantee(spark):
    df = _vals(spark, 0, 20_000)
    est = estimate_quantiles(batch_buckets(df, "value"), QS)
    exact = {
        q: df.selectExpr(f"percentile(value, {q}) AS p").first()["p"]
        for q in QS
    }
    for q in QS:
        t = exact[q]
        assert abs(est[q] - t) <= ALPHA * abs(t) + 1e-9, (q, est[q], t)


def test_merge_matches_single_pass(spark):
    a = _vals(spark, 0, 5_000)
    b = _vals(spark, 5_000, 12_000)
    merged = merge_buckets(batch_buckets(a, "value"), batch_buckets(b, "value"))
    whole = batch_buckets(a.unionByName(b), "value")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_stream_matches_batch_and_replay_is_fenced(spark, tmp_path):
    in_dir, state, cp = (
        str(tmp_path / "in"),
        str(tmp_path / "state"),
        str(tmp_path / "cp"),
    )
    for lo, hi in ((0, 4_000), (4_000, 9_000), (9_000, 15_000)):
        _vals(spark, lo, hi).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_quantile_stream(stream, "value", state, cp)
    q.awaitTermination(120)

    got = current_quantiles(spark, state, QS)
    whole = _vals(spark, 0, 15_000)
    want = estimate_quantiles(batch_buckets(whole, "value"), QS)
    assert got == want  # identical sketch, not merely close
    assert versioned.manifest(state)["extra"]["n_total"] == 15_000

    # crash-replay: folding an already-committed epoch must no-op
    before = sorted(map(tuple, versioned.read_version(spark, state).collect()))
    last_epoch = versioned.manifest(state)["extra"]["epoch_id"]
    fold_batch(_vals(spark, 0, 4_000), last_epoch, "value", state)
    after = sorted(map(tuple, versioned.read_version(spark, state).collect()))
    assert before == after
    assert versioned.manifest(state)["extra"]["n_total"] == 15_000


def test_empty_state_returns_nan(spark):
    empty = batch_buckets(_vals(spark, 0, 0), "value")
    est = estimate_quantiles(empty, [0.5])
    assert est[0.5] != est[0.5]  # NaN


def test_negative_and_zero_ordering(spark):
    df = spark.createDataFrame(
        [(-100.0,), (-1.0,), (0.0,), (1.0,), (100.0,)], "value double"
    )
    est = estimate_quantiles(batch_buckets(df, "value"), [0.0, 0.5, 1.0])
    assert est[0.5] == 0.0
    assert est[0.0] == pytest.approx(-100.0, rel=ALPHA)
    assert est[1.0] == pytest.approx(100.0, rel=ALPHA)


def test_restart_continuity(spark, tmp_path):
    """Stop after the first drain, append new files, start a NEW query
    on the same checkpoint+state: the sketch must continue (not
    refold old batches, not miss new ones)."""
    in_dir, state, cp = (
        str(tmp_path / "in"),
        str(tmp_path / "state"),
        str(tmp_path / "cp"),
    )

    def drain():
        stream = (
            spark.readStream.schema("value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = start_quantile_stream(stream, "value", state, cp)
        q.awaitTermination(120)

    _vals(spark, 0, 6_000).coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    _vals(spark, 6_000, 10_000).coalesce(1).write.mode("append").parquet(in_dir)
    _vals(spark, 10_000, 14_000).coalesce(1).write.mode("append").parquet(in_dir)
    drain()

    got = current_quantiles(spark, state, QS)
    want = estimate_quantiles(
        batch_buckets(_vals(spark, 0, 14_000), "value"), QS
    )
    assert got == want
    assert versioned.manifest(state)["extra"]["n_total"] == 14_000
