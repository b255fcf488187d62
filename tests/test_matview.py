"""Continuous aggregates (operators/matview.py): incremental refresh ≡
full recompute, O(delta) refresh input, no-op on no new data, version
history and reader atomicity via the MVCC commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import matview, versioned
from big_data_pr_spark.tables import load
from big_data_pr_spark.timeutil import epoch_micros

AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "value"),
    "vmax": ("max", "value"),
}


def _split(ev, frac_ts):
    cut = ev.agg(
        F.percentile_approx(epoch_micros(F.col("ts")), frac_ts, 10000)
    ).collect()[0][0]
    early = ev.filter(epoch_micros(F.col("ts")) <= cut)
    late = ev.filter(epoch_micros(F.col("ts")) > cut)
    return early, late


def _full(ev):
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("vmax"),
    )


def _assert_same(a, b):
    rows_a = {
        r["event_type"]: (r["n"], round(r["total"], 6), r["vmax"])
        for r in a.collect()
    }
    rows_b = {
        r["event_type"]: (r["n"], round(r["total"], 6), r["vmax"])
        for r in b.collect()
    }
    assert rows_a == rows_b


@pytest.fixture()
def mv(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    early, late = _split(ev, 0.6)
    d = str(tmp_path / "mv")
    matview.create(early, d, ["event_type"], AGGS, "ts")
    return d, ev, early, late


def test_refresh_equals_full_recompute(spark, mv):
    d, ev, early, late = mv
    res = matview.refresh(spark, d, ev)
    assert res["refreshed"] and res["delta_rows"] == late.count()
    _assert_same(matview.read(spark, d), _full(ev))


def test_refresh_reads_only_delta(spark, mv):
    d, ev, early, late = mv
    res = matview.refresh(spark, d, ev)
    # O(delta): only rows above the watermark were folded
    assert res["delta_rows"] == late.count() < ev.count()


def test_noop_refresh_creates_no_version(spark, mv):
    d, ev, _, _ = mv
    matview.refresh(spark, d, ev)
    v_before = versioned.current_version(d)
    res = matview.refresh(spark, d, ev)
    assert not res["refreshed"]
    assert versioned.current_version(d) == v_before


def test_history_retains_pre_refresh_state(spark, mv):
    d, ev, early, _ = mv
    v0 = versioned.current_version(d)
    matview.refresh(spark, d, ev)
    # time travel: version v0 is still the early-only aggregate
    _assert_same(versioned.read_version(spark, d, version=v0), _full(early))
    _assert_same(matview.read(spark, d), _full(ev))


def test_crash_before_commit_is_replayable(spark, mv, monkeypatch):
    """A refresh that dies before the version commit leaves the old
    state + watermark intact, so re-running folds the same delta."""
    d, ev, early, _ = mv

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(versioned, "write_version", boom)
    with pytest.raises(RuntimeError):
        matview.refresh(spark, d, ev)
    monkeypatch.undo()
    _assert_same(matview.read(spark, d), _full(early))  # untouched
    res = matview.refresh(spark, d, ev)
    assert res["refreshed"]
    _assert_same(matview.read(spark, d), _full(ev))


def test_watermark_commits_atomically_with_state(spark, mv):
    """ADVICE r5 (medium): the watermark must live in the version
    manifest the pointer swap publishes — never in a separately-written
    side file — so a crash between state commit and watermark write
    cannot leave merged state + stale watermark (which would re-fold
    the same delta and double-count on replay)."""
    import json
    import os

    d, ev, early, _ = mv
    # create() already committed the watermark inside the manifest
    wm0 = versioned.manifest(d)["extra"]["watermark_us"]
    assert wm0 > 0
    # the side meta file carries ONLY the static view definition
    with open(os.path.join(d, "_mv.json")) as f:
        meta = json.load(f)
    assert "watermark_us" not in meta
    matview.refresh(spark, d, ev)
    wm1 = versioned.manifest(d)["extra"]["watermark_us"]
    assert wm1 > wm0
    # a stale legacy watermark in _mv.json must be ignored in favor of
    # the manifest (simulates the old crash window / legacy layout)
    with open(os.path.join(d, "_mv.json"), "w") as f:
        json.dump({**meta, "watermark_us": -1}, f)
    res = matview.refresh(spark, d, ev)
    assert not res["refreshed"]  # manifest watermark wins → no re-fold
    _assert_same(matview.read(spark, d), _full(ev))
