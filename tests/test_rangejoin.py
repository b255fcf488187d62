"""Unit tests for the bucketized point-in-interval join, including the
sub-second bucket-coverage regression (ADVICE round 4: second-truncated
coverage dropped the final bucket of an interval whose end carries a
fractional-second component)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators.rangejoin import point_in_interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frac_second_data(spark):
    # interval extends 500 ms past the hour boundary: bucket coverage
    # truncated to whole seconds stops at bucket 0 and silently drops
    # the 01:00:00.200 point
    intervals = spark.createDataFrame(
        [("iv1", _ts("2024-01-01 00:30:00"), _ts("2024-01-01 01:00:00.500"))],
        "iv_id string, start timestamp_ntz, end timestamp_ntz",
    )
    points = spark.createDataFrame(
        [
            ("p_in_first", _ts("2024-01-01 00:45:00")),
            ("p_in_frac", _ts("2024-01-01 01:00:00.200")),
            ("p_at_end", _ts("2024-01-01 01:00:00.500")),  # end-exclusive
            ("p_out", _ts("2024-01-01 01:00:01")),
        ],
        "p_id string, ts timestamp_ntz",
    )
    return intervals, points


def test_subsecond_end_covers_last_bucket(frac_second_data):
    intervals, points = frac_second_data
    got = point_in_interval_join(intervals, points, bucket_width_s=3600)
    matched = sorted(r.p_id for r in got.collect())
    assert matched == ["p_in_first", "p_in_frac"]


def test_subsecond_interval_within_one_bucket(spark):
    # both bounds fractional, interval shorter than a bucket
    intervals = spark.createDataFrame(
        [("iv", _ts("2024-01-01 00:00:00.100"), _ts("2024-01-01 00:00:00.900"))],
        "iv_id string, start timestamp_ntz, end timestamp_ntz",
    )
    points = spark.createDataFrame(
        [
            ("before", _ts("2024-01-01 00:00:00.050")),
            ("inside", _ts("2024-01-01 00:00:00.500")),
            ("at_end", _ts("2024-01-01 00:00:00.900")),
        ],
        "p_id string, ts timestamp_ntz",
    )
    got = point_in_interval_join(intervals, points, bucket_width_s=1)
    assert [r.p_id for r in got.collect()] == ["inside"]


def test_matches_naive_overlap_join(spark):
    # randomized-ish grid: bucketized result == naive range-predicate join
    intervals = spark.range(20).select(
        F.col("id").alias("iv_id"),
        F.timestamp_seconds(F.col("id") * 137).cast("timestamp_ntz").alias("start"),
        F.timestamp_seconds(F.col("id") * 137 + 400).cast("timestamp_ntz").alias("end"),
    )
    points = spark.range(300).select(
        F.col("id").alias("p_id"),
        F.timestamp_seconds(F.col("id") * 11).cast("timestamp_ntz").alias("ts"),
    )
    got = point_in_interval_join(
        intervals, points, bucket_width_s=300
    ).select("iv_id", "p_id")
    naive = intervals.join(
        points,
        (points.ts >= intervals.start) & (points.ts < intervals.end),
    ).select("iv_id", "p_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_left_join_unmatched_needs_interval_agg(spark):
    # documented contract: an unmatched k-bucket interval returns k
    # null-padded rows under how='left'; aggregating by the interval key
    # collapses them
    intervals = spark.createDataFrame(
        [("iv", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00"))],
        "iv_id string, start timestamp_ntz, end timestamp_ntz",
    )
    points = spark.createDataFrame([], "p_id string, ts timestamp_ntz")
    got = point_in_interval_join(intervals, points, bucket_width_s=3600, how="left")
    assert got.count() == 3  # one per covered bucket, all null-padded
    agg = got.groupBy("iv_id").agg(F.count("ts").alias("n"))
    assert [(r.iv_id, r.n) for r in agg.collect()] == [("iv", 0)]


def test_degenerate_interval_no_fanout(spark):
    """ADVICE round 6: F.sequence(a, b) with b < a steps -1 and yields a
    DESCENDING bucket array, so an inverted interval (end <= start, e.g.
    a zeroed-out end epoch) fanned out into one exploded row per bucket
    between epoch 0 and start. The guard clamps such rows to their
    single start bucket."""
    intervals = spark.createDataFrame(
        [
            ("empty", _ts("2024-01-01 05:00:00"), _ts("2024-01-01 05:00:00")),
            ("inverted", _ts("2024-01-01 05:00:00"), _ts("2024-01-01 02:00:00")),
            # badly inverted: end at epoch 0, ~473k 1h buckets before start
            ("epoch0", _ts("2024-01-01 05:00:00"), _ts("1970-01-01 00:00:00")),
            ("normal", _ts("2024-01-01 04:30:00"), _ts("2024-01-01 05:30:00")),
        ],
        "iv_id string, start timestamp_ntz, end timestamp_ntz",
    )
    points = spark.createDataFrame(
        [("p1", _ts("2024-01-01 05:00:00")), ("p2", _ts("2024-01-01 03:00:00"))],
        "p_id string, ts timestamp_ntz",
    )
    inner = point_in_interval_join(intervals, points, bucket_width_s=3600)
    rows = [(r.iv_id, r.p_id) for r in inner.collect()]
    # no point satisfies start <= ts < end for any malformed interval
    assert sorted(rows) == [("normal", "p1")]
    # left join: each malformed interval survives as EXACTLY ONE
    # null-padded row (single clamped bucket), not one per bucket
    left = point_in_interval_join(intervals, points, bucket_width_s=3600, how="left")
    by_iv = {}
    for r in left.collect():
        by_iv.setdefault(r.iv_id, []).append(r.p_id)
    assert by_iv["empty"] == [None]
    assert by_iv["inverted"] == [None]
    assert by_iv["epoch0"] == [None]
    # "normal" spans 2 buckets: the matching bucket row plus the
    # documented per-unmatched-bucket null row (callers aggregate)
    assert sorted(by_iv["normal"], key=str) == [None, "p1"]


def test_overlap_join_inverted_interval_no_fanout(spark):
    from big_data_pr_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 05:00:00"), _ts("1970-01-01 00:00:00")),
            ("b", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00")),
        ],
        "l_id string, sess_start timestamp_ntz, sess_end timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("r1", _ts("2024-01-01 01:30:00"), _ts("2024-01-01 03:00:00"))],
        "r_id string, sess_start timestamp_ntz, sess_end timestamp_ntz",
    )
    got = interval_overlap_join(left, right)
    pairs = sorted((r["l_id"], r["__r_r_id"]) for r in got.collect())
    assert pairs == [("b", "r1")]
