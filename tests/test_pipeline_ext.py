"""Behavioral tests for the round-6 pipeline-extension operators that
need synthetic shapes the fixture corpus doesn't exercise (waterfill
saturation) plus invariants of the registry queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pr_spark.operators import sampling


def _waterfill(spark, rows, budget):
    df = spark.createDataFrame(
        rows, "lang string, cap long, w double"
    ).withColumn("b", F.lit(budget).cast("long"))
    return {r["lang"]: r for r in sampling.waterfill(df).collect()}


def test_waterfill_no_saturation_is_proportional(spark):
    out = _waterfill(
        spark, [("a", 1000, 1.0), ("b", 1000, 3.0)], budget=400
    )
    assert abs(out["a"]["alloc"] - 100.0) < 1e-9
    assert abs(out["b"]["alloc"] - 300.0) < 1e-9
    assert not out["a"]["saturated"] and not out["b"]["saturated"]


def test_waterfill_saturation_reflows_budget(spark):
    """A tiny group saturates at its cap; the freed budget re-flows to
    the others proportionally to their weights."""
    out = _waterfill(
        spark,
        [("tiny", 50, 2.0), ("big1", 10_000, 1.0), ("big2", 10_000, 1.0)],
        budget=4050,
    )
    assert out["tiny"]["saturated"] and out["tiny"]["alloc"] == 50.0
    # remaining 4000 split evenly across equal weights
    assert abs(out["big1"]["alloc"] - 2000.0) < 1e-6
    assert abs(out["big2"]["alloc"] - 2000.0) < 1e-6


def test_waterfill_cascading_saturation(spark):
    """Saturation can cascade: freeing budget can saturate the next
    group in ratio order too."""
    out = _waterfill(
        spark,
        [("s1", 10, 5.0), ("s2", 100, 5.0), ("big", 100_000, 1.0)],
        budget=10_000,
    )
    assert out["s1"]["saturated"] and out["s1"]["alloc"] == 10.0
    assert out["s2"]["saturated"] and out["s2"]["alloc"] == 100.0
    assert abs(out["big"]["alloc"] - 9890.0) < 1e-6


def test_waterfill_budget_exceeds_capacity(spark):
    """Budget above total capacity: everyone saturates, allocation ==
    capacity (the capsum_k/wsum_k pivot is NULL and unused)."""
    out = _waterfill(
        spark, [("a", 100, 1.0), ("b", 200, 9.0)], budget=10_000
    )
    assert out["a"]["alloc"] == 100.0 and out["a"]["saturated"]
    assert out["b"]["alloc"] == 200.0 and out["b"]["saturated"]


def test_waterfill_invariants_random(spark):
    """sum(alloc) == min(B, sum(cap)) and 0 <= alloc <= cap on a
    deterministic pseudo-random instance."""
    import random

    rng = random.Random(7)
    rows = [
        (f"g{i}", rng.randrange(10, 5000), rng.uniform(0.1, 4.0))
        for i in range(20)
    ]
    budget = 15_000
    out = _waterfill(spark, rows, budget)
    total_cap = sum(c for _, c, _ in rows)
    got = sum(r["alloc"] for r in out.values())
    assert abs(got - min(budget, total_cap)) < 1e-4
    for _, c, _ in rows:
        pass
    for r in out.values():
        assert -1e-9 <= r["alloc"] <= r["cap"] + 1e-9
