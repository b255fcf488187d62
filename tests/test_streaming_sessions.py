"""Streaming sessionization (streaming/session_sink.py): session-merge
on late-but-in-horizon events, watermark-driven finalization, and
replay-idempotent keyed output."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_pr_spark.streaming.session_sink import (
    sessionize_stream,
    start_session_stream,
)

T0 = 1_700_000_000_000  # fixed epoch-ms origin

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _msg(user: str, minute: int, value: float = 1.0) -> dict:
    # JSON timestamp readable by TimestampType: ISO via epoch seconds
    return {
        "user_id": user,
        "event_time": (T0 + minute * 60_000) // 1000,
        "value": value,
    }


def _write_batch(input_dir, name: str, msgs: list[dict]) -> None:
    rows = []
    for m in msgs:
        m = dict(m)
        m["event_time"] = __import__("datetime").datetime.utcfromtimestamp(
            m["event_time"]
        ).strftime("%Y-%m-%dT%H:%M:%S")
        rows.append(json.dumps(m))
    (input_dir / name).write_text("\n".join(rows) + "\n")


def _run(spark, input_dir, out, cp, gap="30 minutes", watermark="10 minutes"):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(input_dir))
    )
    q = start_session_stream(
        stream, str(out), str(cp), gap=gap, watermark=watermark
    )
    q.awaitTermination(120)


def test_sessions_merge_and_finalize(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out, cp = tmp_path / "sessions", tmp_path / "cp"

    # batch 1: user A at minutes 0 and 5; user B at minute 0
    _write_batch(input_dir, "b1.json", [_msg("A", 0), _msg("A", 5), _msg("B", 0, 2.0)])
    _run(spark, input_dir, out, cp)

    # batch 2: A at minute 20 — within the 30-min gap of the open
    # session, must MERGE (extends end to minute 50), not start a new one
    _write_batch(input_dir, "b2.json", [_msg("A", 20, 3.0)])
    _run(spark, input_dir, out, cp)

    # batch 3: far-future event pushes the watermark past every open
    # session end → A(0-50) and B(0-30) finalize
    _write_batch(input_dir, "b3.json", [_msg("A", 240)])
    _run(spark, input_dir, out, cp)
    _write_batch(input_dir, "b4.json", [_msg("A", 480)])
    _run(spark, input_dir, out, cp)

    rows = {
        (r["user_id"], r["session_start"].timestamp() * 1000): r
        for r in spark.read.parquet(str(out)).collect()
    }
    a = rows[("A", float(T0))]
    assert a["n_events"] == 3  # 0, 5, 20 merged into one session
    assert a["session_end"].timestamp() * 1000 == T0 + 50 * 60_000
    assert a["duration_s"] == 50 * 60
    assert a["total_value"] == 5.0
    b = rows[("B", float(T0))]
    assert b["n_events"] == 1
    assert b["session_end"].timestamp() * 1000 == T0 + 30 * 60_000

    # output is key-unique (upsert, not blind append)
    df = spark.read.parquet(str(out))
    assert df.count() == df.select("doc_id").distinct().count()


def test_streaming_matches_batch_session_window(spark, tmp_path):
    """Finalized streaming sessions == batch session_window over the
    same (non-late) events."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out, cp = tmp_path / "sessions", tmp_path / "cp"
    msgs = [
        _msg("A", 0), _msg("A", 10), _msg("A", 90),
        _msg("B", 5), _msg("B", 50, 4.0),
    ]
    _write_batch(input_dir, "b1.json", msgs)
    _run(spark, input_dir, out, cp)
    _write_batch(input_dir, "b2.json", [_msg("C", 600)])  # flush watermark
    _run(spark, input_dir, out, cp)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(str(out)).collect()
        if r["user_id"] in ("A", "B")
    }
    batch_df = spark.createDataFrame(
        [
            (
                m["user_id"],
                __import__("datetime").datetime.utcfromtimestamp(m["event_time"]),
                m["value"],
            )
            for m in msgs
        ],
        _SCHEMA,
    )
    expect = {
        (r["user_id"], r["session_window"]["start"], r["session_window"]["end"], r["n"])
        for r in batch_df.groupBy(
            F.session_window("event_time", "30 minutes"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect


def test_session_upsert_replay_idempotent(spark, tmp_path):
    """Re-writing a finalized batch (crash replay) leaves the output
    unchanged."""
    from big_data_pr_spark.streaming.session_sink import _upsert_sessions

    sessions = spark.createDataFrame(
        [
            ("A", "2024-01-01 00:00:00", "2024-01-01 00:30:00", 1800, 2, 5.0,
             "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
        ],
        "user_id string, session_start string, session_end string, "
        "duration_s long, n_events long, total_value double, "
        "first_event string, last_event string",
    ).withColumn("session_start", F.to_timestamp("session_start"))
    path = str(tmp_path / "s")
    _upsert_sessions(sessions, path, "user_id")
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    _upsert_sessions(sessions, path, "user_id")  # replay
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second


def test_session_upsert_read_failure_does_not_wipe(spark, tmp_path):
    """ADVICE round 6: a transient read failure on an EXISTING sessions
    table must fail the micro-batch (so it retries) — the old bare
    ``except Exception`` treated any read error as first-write and
    overwrote the table with just the current batch, permanently
    destroying previously finalized sessions (append-mode emissions are
    never replayed)."""
    import os

    from big_data_pr_spark.streaming.session_sink import _upsert_sessions

    sessions = spark.createDataFrame(
        [
            ("A", "2024-01-01 00:00:00", "2024-01-01 00:30:00", 1800, 2, 5.0,
             "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
        ],
        "user_id string, session_start string, session_end string, "
        "duration_s long, n_events long, total_value double, "
        "first_event string, last_event string",
    ).withColumn("session_start", F.to_timestamp("session_start"))
    path = str(tmp_path / "s")
    _upsert_sessions(sessions, path, "user_id")
    # corrupt every parquet footer: the path EXISTS but cannot be read
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            with open(os.path.join(path, name), "wb") as f:
                f.write(b"not a parquet file")
    with pytest.raises(Exception):
        _upsert_sessions(sessions, path, "user_id")
    # the corrupt files are still there — nothing was overwritten
    assert any(
        open(os.path.join(path, n), "rb").read() == b"not a parquet file"
        for n in os.listdir(path) if n.endswith(".parquet")
    )


def test_fs_exists_probes_path_scheme(spark, tmp_path):
    """ADVICE round 7: first-write detection must probe the path's OWN
    filesystem (Hadoop FileSystem API), not the driver's local disk —
    os.path.exists on an hdfs:///s3a:// URI always reports absence, so
    every micro-batch would take the first-write overwrite and destroy
    finalized sessions. fs_exists must agree with the local check on
    plain paths AND resolve explicit file:// URIs."""
    from big_data_pr_spark.fsutil import fs_exists

    d = tmp_path / "t"
    assert fs_exists(spark, str(d)) is False
    d.mkdir()
    (d / "part-0").write_text("x")
    assert fs_exists(spark, str(d)) is True
    # explicit scheme resolves through the same FS factory path the
    # write uses (an os.path.exists check would also pass here, but
    # hdfs://... would not — this pins the API, the real-cluster claim
    # is the FileSystem.get contract)
    assert fs_exists(spark, "file://" + str(d)) is True
    assert fs_exists(spark, "file://" + str(tmp_path / "nope")) is False


def test_session_upsert_uses_hadoop_fs_for_file_uri(spark, tmp_path):
    """_upsert_sessions with a file:// URI takes the merge branch on the
    second write (the os.path.exists version still worked for file://,
    but the path now flows through the Hadoop FS probe end-to-end)."""
    from big_data_pr_spark.streaming.session_sink import _upsert_sessions

    mk = lambda uid, start: spark.createDataFrame(  # noqa: E731
        [
            (uid, start, "2024-01-01 01:00:00", 1800, 2, 5.0,
             "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
        ],
        "user_id string, session_start string, session_end string, "
        "duration_s long, n_events long, total_value double, "
        "first_event string, last_event string",
    ).withColumn("session_start", F.to_timestamp("session_start"))
    uri = "file://" + str(tmp_path / "s")
    _upsert_sessions(mk("A", "2024-01-01 00:00:00"), uri, "user_id")
    _upsert_sessions(mk("B", "2024-01-01 00:10:00"), uri, "user_id")
    got = spark.read.parquet(uri)
    assert got.count() == 2  # second batch merged, not overwritten


def test_require_local_rejects_remote_sink_paths(spark, tmp_path):
    """The os-rename swap sinks must fail LOUDLY on non-local URIs
    instead of silently mis-detecting first-write (ADVICE round 7)."""
    import pytest as _pytest

    from big_data_pr_spark.fsutil import require_local
    from big_data_pr_spark.ohlcv.batch import upsert_parquet

    require_local(str(tmp_path / "x"), "t")  # plain local: fine
    require_local("file:///tmp/x", "t")  # file scheme: fine
    with _pytest.raises(ValueError, match="s3a"):
        require_local("s3a://bucket/table", "t")
    df = spark.range(1).selectExpr(
        "'a' AS doc_id", "'BTC' AS symbol", "'1h' AS timeframe", "1.0 AS close"
    )
    with _pytest.raises(ValueError, match="upsert_parquet"):
        upsert_parquet(spark, df, "hdfs://nn/warehouse/candles")
