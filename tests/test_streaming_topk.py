"""Streaming Misra-Gries heavy hitters: bounded state, MG guarantees
over the whole stream, exactly-once under replay, restart continuity."""

from __future__ import annotations

from big_data_pr_spark.operators import versioned
from big_data_pr_spark.streaming.topk_sink import start_heavy_hitters_stream

K = 8


def _write_keys(spark, path, keys):
    spark.createDataFrame([(k,) for k in keys], "key string").coalesce(
        1
    ).write.mode("append").parquet(path)


def _skewed(n, tag=""):
    out = []
    for i in range(n):
        if i % 100 < 60:
            out.append("hot")
        elif i % 100 < 80:
            out.append("warm")
        else:
            out.append(f"cold{tag}{i}")
    return out


def _drain(spark, in_dir, state, cp):
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_heavy_hitters_stream(stream, "key", K, state, cp)
    q.awaitTermination(120)


def test_streaming_mg_guarantees_and_restart(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    state, cp = str(tmp_path / "state"), str(tmp_path / "cp")
    batches = [_skewed(2000, "a"), _skewed(2000, "b"), _skewed(2000, "c")]
    for i, b in enumerate(batches[:2]):
        _write_keys(spark, in_dir, b)
    _drain(spark, in_dir, state, cp)

    # restart continuity: a later file is picked up by a NEW query on
    # the same checkpoint and folds into the same state
    _write_keys(spark, in_dir, batches[2])
    _drain(spark, in_dir, state, cp)

    all_keys = [k for b in batches for k in b]
    n = len(all_keys)
    exact: dict[str, int] = {}
    for kk in all_keys:
        exact[kk] = exact.get(kk, 0) + 1

    est = {
        r["key"]: r["c"]
        for r in versioned.read_version(spark, state).collect()
    }
    assert len(est) <= K - 1  # bounded state forever
    man = versioned.manifest(state)["extra"]
    assert man["n_total"] == n
    for key, c in est.items():
        assert c <= exact[key]
        assert c >= exact[key] - n / K
    for key, c in exact.items():
        if c > n / K:
            assert key in est, key


def test_streaming_mg_replay_is_noop(spark, tmp_path):
    from big_data_pr_spark.streaming.topk_sink import fold_batch

    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(k,) for k in _skewed(500)], "key string"
    )

    fold_batch(batch, 0, "key", K, state)
    v1 = versioned.current_version(state)
    n1 = versioned.manifest(state)["extra"]["n_total"]
    fold_batch(batch, 0, "key", K, state)  # replayed epoch must no-op
    assert versioned.current_version(state) == v1
    assert versioned.manifest(state)["extra"]["n_total"] == n1
    fold_batch(batch, 1, "key", K, state)  # the next epoch still folds
    assert versioned.current_version(state) == v1 + 1
    assert versioned.manifest(state)["extra"]["n_total"] == n1 + 500
