"""Behavioral tests for the round-6 pipeline-extension operators that
need synthetic shapes the fixture corpus doesn't exercise (waterfill
saturation) plus invariants of the registry queries."""

from __future__ import annotations

import pytest
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


def test_pq_roundtrip_compression(spark, sf_dir):
    """PQ encode: m small codes per vector; trained codebooks must cut
    reconstruction error vs the unrefined init, and ADC top-k with
    re-rank must beat raw ADC recall."""
    from pyspark.sql import functions as F

    from big_data_pr_spark.operators import similarity as sim
    from big_data_pr_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    init = sim.pq_init_codebooks(emb, dim=64, m=4, k=8)
    trained = sim.pq_train(emb, dim=64, m=4, k=8, iters=2)
    assert len(trained) == 4 and all(len(b) == 8 for b in trained)

    def mse(books):
        enc = sim.pq_encode(emb, 64, books)
        err = F.lit(0.0)
        for j in range(4):
            pairs = F.array(
                *[
                    F.struct(
                        sim._sq_dist_slice_to_literal(
                            F.col("embedding"), j * 16, 16, c
                        ).alias("dist"),
                        F.lit(ci).alias("cid"),
                    )
                    for ci, c in enumerate(books[j])
                ]
            )
            err = err + F.array_min(pairs)["dist"]
        return enc.select(err.alias("e")).agg(F.avg("e")).collect()[0][0]

    assert mse(trained) < mse(init)  # Lloyd refinement helps

    codes = sim.pq_encode(emb, 64, trained).select("codes").first()["codes"]
    assert len(codes) == 4 and all(0 <= c < 8 for c in codes)

    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {
        r["vec_id"]
        for r in rest.select(
            "vec_id",
            sim._sq_dist_to_literal(F.col("embedding"), qvec).alias("d"),
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    raw = {
        r["vec_id"]
        for r in sim.pq_adc_topk(rest, 64, trained, qvec, k=10).collect()
    }
    rr = {
        r["vec_id"]
        for r in sim.pq_adc_topk(
            rest, 64, trained, qvec, k=10, rerank=50
        ).collect()
    }
    assert len(rr & exact) >= len(raw & exact)
    assert rr <= exact | rr  # sanity: 10 rows
    assert len(rr) == 10


def test_pq_refine_round_matches_numpy_lloyd_step(spark, sf_dir):
    """r8 twin support: pq_refine_round (one Lloyd iteration, centroids
    rounded JVM-side to 6 dp) must equal a naive numpy recompute —
    per-subspace argmin assignment against the md5-sampled init, mean
    per (subspace, cluster, dim), rounded half-up. Empty clusters keep
    the rounded init centroid."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from big_data_pr_spark.operators import similarity as sim
    from big_data_pr_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    books = sim.pq_sample_codebooks_md5(emb, dim=64, m=4, k=8)
    got = sim.pq_refine_round(emb, dim=64, books=books)

    X = np.array(
        [[float(x) for x in r[0]] for r in emb.select("embedding").collect()]
    )

    def r6(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )

    for j in range(4):
        sub = X[:, j * 16 : (j + 1) * 16]
        cents = np.array(books[j])
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # numpy argmin ties -> lowest index
        for c in range(8):
            members = sub[assign == c]
            if len(members):
                want = [r6(v) for v in members.mean(axis=0)]
            else:
                want = [r6(v) for v in books[j][c]]
            assert got[j][c] == pytest.approx(want, abs=2e-6), (j, c)


def test_pq_sample_codebooks_md5_matches_duckdb_order(spark, sf_dir):
    """The md5-keyed init sample must pick exactly the vectors DuckDB's
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT k picks."""
    import os

    import duckdb

    from big_data_pr_spark.operators import similarity as sim
    from big_data_pr_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    books = sim.pq_sample_codebooks_md5(emb, dim=64, m=4, k=8)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT embedding FROM read_parquet(?) "
        "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8",
        [os.path.join(sf_dir, "embeddings.parquet")],
    ).fetchall()
    want = [[float(x) for x in r[0]] for r in rows]
    for ci, v in enumerate(want):
        for j in range(4):
            assert books[j][ci] == pytest.approx(v[j * 16 : (j + 1) * 16])
