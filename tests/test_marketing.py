"""Behavioral invariants for the attribution deepening
(queries/marketing.py round-6h) — share normalization, probability
bounds, and Shapley magnitude sanity the value-hash oracle can't
express."""

from __future__ import annotations

from big_data_pr_spark.queries import REGISTRY


def test_markov_removal_effects_bounded(spark, sf_dir):
    rows = REGISTRY["markov_attribution_removal"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    shares = [r["attribution_share"] for r in rows if r["attribution_share"]]
    assert abs(sum(shares) - 1.0) < 1e-3
    for r in rows:
        assert 0.0 <= r["removal_effect"] <= 1.0
        assert 0.0 < r["p_conv_full"] <= 1.0


def test_shapley_efficiency_and_symmetric_inputs(spark, sf_dir):
    rows = REGISTRY["shapley_attribution_sets"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_journeys"] > 0
        # |phi| can't exceed the max possible marginal contribution (a rate)
        assert abs(r["shapley_value"]) <= 1.0


def test_adstock_mmm_r2_bounds(spark, sf_dir):
    r = REGISTRY["adstock_mmm_fit"].fn(spark, sf_dir).first()
    assert r["n_days"] > 20
    # R^2 of an OLS fit with intercept is in [0, 1]
    assert -1e-9 <= r["r2"] <= 1.0 + 1e-9
