"""Streaming SPRT monitor: LLR fold correctness, decision latch,
replay idempotency, end-to-end stream drive."""

from __future__ import annotations

import math

from big_data_pr_spark.operators import versioned
from big_data_pr_spark.streaming.sprt_sink import fold_batch, start_sprt_stream

P0, P1 = 0.25, 0.30


def _trials(spark, successes, failures):
    rows = [(True,)] * successes + [(False,)] * failures
    return spark.createDataFrame(rows, "y boolean")


def _llr(k, n):
    return k * math.log(P1 / P0) + (n - k) * math.log((1 - P1) / (1 - P0))


def test_fold_matches_closed_form_and_replay_noops(spark, tmp_path):
    state = str(tmp_path / "state")
    fold_batch(_trials(spark, 30, 70), 0, "y", state, P0, P1)
    row = versioned.read_version(spark, state).collect()[0]
    assert abs(row["cum_llr"] - _llr(30, 100)) < 1e-9
    assert row["n_total"] == 100 and row["k_total"] == 30
    v1 = versioned.current_version(state)
    fold_batch(_trials(spark, 30, 70), 0, "y", state, P0, P1)  # replay
    assert versioned.current_version(state) == v1
    fold_batch(_trials(spark, 10, 90), 1, "y", state, P0, P1)
    row = versioned.read_version(spark, state).collect()[0]
    assert abs(row["cum_llr"] - (_llr(30, 100) + _llr(10, 100))) < 1e-9
    assert row["n_total"] == 200


def test_decision_latches_at_boundary(spark, tmp_path):
    state = str(tmp_path / "state")
    # heavy success run crosses the upper boundary ln(19) ~ 2.944
    fold_batch(_trials(spark, 500, 500), 0, "y", state, P0, P1)
    row = versioned.read_version(spark, state).collect()[0]
    assert row["cum_llr"] > math.log(19.0)
    assert row["decision"] == "accept_h1"
    # contradicting data later must NOT un-decide a stopped test
    fold_batch(_trials(spark, 0, 2000), 1, "y", state, P0, P1)
    row = versioned.read_version(spark, state).collect()[0]
    assert row["decision"] == "accept_h1"
    assert row["cum_llr"] < math.log(19.0)  # LLR keeps tracking


def test_stream_drive_end_to_end(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    state, cp = str(tmp_path / "state"), str(tmp_path / "cp")
    for i, (s, f) in enumerate([(40, 60), (45, 55)]):
        _trials(spark, s, f).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("y boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_sprt_stream(stream, "y", state, cp, P0, P1)
    q.awaitTermination(120)
    row = versioned.read_version(spark, state).collect()[0]
    assert row["n_total"] == 200
    assert abs(row["cum_llr"] - _llr(85, 200)) < 1e-9
