"""Behavioral invariants for the recommendation / representation family
(queries/recsys_queries.py) and the intermittent-demand forecasters —
properties the value-hash oracle can't express (monotonicity, baseline
dominance)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_pr_spark.queries import REGISTRY
from big_data_pr_spark.tables import load


def test_mrl_energy_fraction_monotonic(spark, sf_dir):
    rows = REGISTRY["mrl_norm_fraction"].fn(spark, sf_dir).collect()
    dims = [r["prefix_dim"] for r in rows]
    assert dims == sorted(dims)
    fracs = [r["avg_energy_fraction"] for r in rows]
    # energy captured can only grow with the prefix, and the full
    # 64-dim prefix is the whole vector
    assert all(a <= b + 1e-9 for a, b in zip(fracs, fracs[1:]))
    assert math.isclose(fracs[-1], 1.0, abs_tol=1e-6)
    assert all(0.0 < f <= 1.0 + 1e-9 for f in fracs)


def test_als_beats_unit_factor_baseline(spark, sf_dir):
    out = REGISTRY["als_rank1_factors"].fn(spark, sf_dir)
    rmse = out.select("rmse").first()["rmse"]
    # baseline: all user/item factors left at init (prediction == 1.0)
    r = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("double").alias("rt"))
    )
    rmse0 = r.agg(
        F.sqrt(F.avg((F.col("rt") - 1.0) * (F.col("rt") - 1.0)))
    ).first()[0]
    assert rmse < rmse0


def test_item_item_cosine_bounds(spark, sf_dir):
    rows = REGISTRY["item_item_cosine"].fn(spark, sf_dir).collect()
    assert rows, "no item pairs"
    for r in rows:
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_textrank_scores_positive_sorted(spark, sf_dir):
    rows = REGISTRY["textrank_keywords"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    scores = [r["textrank"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # damping floor: every stationary score >= (1 - d) = 0.15
    assert all(s >= 0.15 - 1e-9 for s in scores)


def test_theta_forecast_shape(spark, sf_dir):
    rows = REGISTRY["theta_forecast_daily"].fn(spark, sf_dir).collect()
    assert [r["h"] for r in rows] == list(range(1, 8))
    drift = rows[0]["drift_per_step"]
    # successive horizons differ by exactly the drift (rounding aside)
    for a, b in zip(rows, rows[1:]):
        assert math.isclose(b["forecast"] - a["forecast"], drift, abs_tol=0.02)


def test_croston_rate_positive(spark, sf_dir):
    rows = REGISTRY["croston_demand_rate"].fn(spark, sf_dir).collect()
    assert rows, "no intermittent series found"
    for r in rows:
        assert r["z_hat"] > 0
        assert r["p_hat"] >= 1.0 - 1e-9  # intervals are >= 1 day
        assert math.isclose(
            r["demand_rate"], r["z_hat"] / r["p_hat"], rel_tol=5e-3
        )


def test_label_propagation_partitions_nodes(spark, sf_dir):
    from big_data_pr_spark.queries.graph_ext import _ps_edges, _LPA_MIN_SHARED

    out = REGISTRY["label_propagation_communities"].fn(spark, sf_dir).collect()
    assert out, "no communities"
    # members sum to the number of graph nodes (every node labeled once)
    ps = _ps_edges(spark, sf_dir)
    a = ps.select("pk", F.col("sk").alias("u"))
    b = ps.select("pk", F.col("sk").alias("v"))
    n_nodes = (
        a.join(b, "pk")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= _LPA_MIN_SHARED)
        .select(F.explode(F.array("u", "v")).alias("n"))
        .distinct()
        .count()
    )
    assert sum(r["members"] for r in out) == n_nodes
    # every community's representative belongs to it (label is a member
    # id only at init; after voting min_member just has to be a node)
    assert all(r["members"] >= 1 for r in out)


def test_kmeans_silhouette_bounds(spark, sf_dir):
    rows = REGISTRY["kmeans_silhouette"].fn(spark, sf_dir).collect()
    assert rows, "no clusters"
    for r in rows:
        # a = nearest centroid, b = second nearest => a <= b => s in [0, 1]
        assert 0.0 <= r["silhouette"] <= 1.0
        assert r["avg_intra"] <= r["avg_nearest_other"] + 1e-9
        assert r["n"] >= 1


def test_mmd_label_drift_kernel_bounds(spark, sf_dir):
    r = REGISTRY["mmd_label_drift"].fn(spark, sf_dir).first()
    assert r["n_x"] > 0 and r["n_y"] > 0
    for c in ("kxx_mean", "kyy_mean", "kxy_mean"):
        assert 0.0 < r[c] <= 1.0
    # unbiased-style estimate may dip slightly below 0, never far
    assert -0.05 <= r["mmd2"] <= 2.0


def test_hits_scores_normalized_and_positive(spark, sf_dir):
    rows = REGISTRY["hits_event_transitions"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    h2 = sum(r["hub"] ** 2 for r in rows)
    a2 = sum(r["authority"] ** 2 for r in rows)
    assert abs(h2 - 1.0) < 1e-3 and abs(a2 - 1.0) < 1e-3
    assert all(r["hub"] >= 0 and r["authority"] >= 0 for r in rows)
