"""Count-min sketch guarantees: one-sided overestimate, ε-accuracy,
mergeability, and heavy-hitter recovery."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_pr_spark.operators.sketch import cms_build, cms_estimate, cms_merge
from big_data_pr_spark.tables import load


def test_cms_overestimates_within_epsilon(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type")
    width, depth = 256, 4
    sketch = cms_build(ev, "event_type", width, depth)
    truth = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    keys = ev.select("event_type").distinct()
    est = {
        r["event_type"]: r["est_count"]
        for r in cms_estimate(sketch, keys, "event_type", width, depth).collect()
    }
    n = sum(truth.values())
    eps_bound = (2.718 / width) * n
    for k, true_n in truth.items():
        assert est[k] >= true_n, (k, est[k], true_n)  # never underestimates
        assert est[k] - true_n <= eps_bound, (k, est[k], true_n)
    # sketch is d*w cells at most, regardless of input size
    assert sketch.count() <= width * depth


def test_cms_merge_equals_single_build(spark):
    rows = [(i, f"k{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "i long, k string")
    full = cms_build(df, "k", 64, 3)
    halves = [
        cms_build(df.filter(F.col("i") < 250), "k", 64, 3),
        cms_build(df.filter(F.col("i") >= 250), "k", 64, 3),
    ]
    merged = cms_merge(*halves)
    a = {(r["row"], r["bucket"]): r["c"] for r in full.collect()}
    b = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    assert a == b


def test_cms_heavy_hitter_ranks_first(spark):
    rows = [("hot",)] * 400 + [(f"cold{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    sketch = cms_build(df, "k", 128, 4)
    est = cms_estimate(sketch, df.select("k").distinct(), "k", 128, 4)
    top = est.orderBy(F.desc("est_count"), "k").limit(1).collect()[0]
    assert top["k"] == "hot"
    assert top["est_count"] >= 400
