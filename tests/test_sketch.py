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


def test_mg_never_overcounts_and_bounds_undercount(spark, sf_dir):
    from big_data_pr_spark.operators.sketch import mg_topk
    from big_data_pr_spark.tables import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    n = ev.count()
    k = 32
    est = {r["key"]: r["est_count"] for r in mg_topk(ev, "user_id", k).collect()}
    exact = {
        str(r["user_id"]): r["c"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    for key, e in est.items():
        assert e <= exact[key]
        assert e >= exact[key] - n / k
    # capture guarantee: every key with true freq > n/k is present
    for key, c in exact.items():
        if c > n / k:
            assert key in est, key


def test_mg_merge_matches_repartitioned_build(spark):
    """The summary's guarantees hold regardless of partitioning — the
    certificate properties survive an adversarial 16-way shuffle."""
    from big_data_pr_spark.operators.sketch import mg_topk
    from pyspark.sql import functions as F

    df = spark.range(10000).select(
        F.when(F.col("id") % 100 < 60, F.lit("hot"))
        .when(F.col("id") % 100 < 80, F.lit("warm"))
        .otherwise(F.concat(F.lit("cold"), F.col("id")))
        .alias("key")
    )
    for parts in (1, 16):
        est = {
            r["key"]: r["est_count"]
            for r in mg_topk(df.repartition(parts), "key", 8).collect()
        }
        assert "hot" in est and "warm" in est
        assert est["hot"] <= 6000 and est["hot"] >= 6000 - 10000 / 8
