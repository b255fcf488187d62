"""Streaming PSI drift monitor: reference pin, PSI math, alarm streak,
replay no-op, end-to-end stream drive."""

from __future__ import annotations

import math

from big_data_pr_spark.operators import versioned
from big_data_pr_spark.streaming.psi_sink import fold_batch, start_psi_stream


def _vals(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "v double")


def _uniform(n, lo=0.0, hi=100.0):
    return [lo + (hi - lo) * (i + 0.5) / n for i in range(n)]


def test_reference_pin_and_psi_math(spark, tmp_path):
    state = str(tmp_path / "state")
    ref = _uniform(1000)
    fold_batch(_vals(spark, ref), 0, "v", state)
    extra = versioned.manifest(state)["extra"]
    assert extra["psi"] == 0.0 and not extra["alarm"]
    # identical distribution -> PSI ~ 0
    fold_batch(_vals(spark, ref), 1, "v", state)
    extra = versioned.manifest(state)["extra"]
    assert abs(extra["psi"]) < 1e-6
    # all mass into the top decile -> huge PSI, alarm
    fold_batch(_vals(spark, [95.0] * 1000), 2, "v", state)
    extra = versioned.manifest(state)["extra"]
    assert extra["psi"] > 0.2 and extra["alarm"]
    assert extra["alarm_streak"] == 1
    fold_batch(_vals(spark, [95.0] * 1000), 3, "v", state)
    assert versioned.manifest(state)["extra"]["alarm_streak"] == 2
    # recovery resets the streak
    fold_batch(_vals(spark, ref), 4, "v", state)
    extra = versioned.manifest(state)["extra"]
    assert extra["alarm_streak"] == 0 and abs(extra["psi"]) < 1e-6


def test_psi_replay_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    fold_batch(_vals(spark, _uniform(500)), 0, "v", state)
    fold_batch(_vals(spark, [95.0] * 500), 1, "v", state)
    v = versioned.current_version(state)
    psi = versioned.manifest(state)["extra"]["psi"]
    fold_batch(_vals(spark, [95.0] * 500), 1, "v", state)  # replay
    assert versioned.current_version(state) == v
    assert versioned.manifest(state)["extra"]["psi"] == psi


def test_psi_stream_drive(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    state, cp = str(tmp_path / "state"), str(tmp_path / "cp")
    _vals(spark, _uniform(800)).coalesce(1).write.mode("append").parquet(in_dir)
    _vals(spark, [95.0] * 800).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_psi_stream(stream, "v", state, cp)
    q.awaitTermination(120)
    extra = versioned.manifest(state)["extra"]
    assert extra["alarm"] and extra["psi"] > 0.2
    # reference stayed pinned to epoch 0's edges
    ref = versioned.read_version(spark, state).orderBy("bin").collect()
    assert len(ref) == 10
    assert abs(sum(r["p_ref"] for r in ref) - 1.0) < 1e-9
