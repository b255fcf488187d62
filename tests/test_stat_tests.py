"""Behavioral invariants for the round-6j inference additions
(Wasserstein distance, log-rank test) — identities the value-hash
oracle can't express."""

from __future__ import annotations

from big_data_pr_spark.queries import REGISTRY


def test_wasserstein_consistent_with_ks(spark, sf_dir):
    w1 = REGISTRY["wasserstein_value_shift"].fn(spark, sf_dir).first()
    assert w1["n_a"] > 0 and w1["n_b"] > 0
    assert w1["w1"] >= 0.0
    # W1 is bounded by the support width times the sup-norm gap
    ks = REGISTRY["ks_test_purchase_vs_view"].fn(spark, sf_dir).first()
    assert ks["ks_d"] >= 0.0  # both defined on the same samples


def test_logrank_matches_group_sizes(spark, sf_dir):
    r = REGISTRY["logrank_ship_priority"].fn(spark, sf_dir).first()
    assert r["n_urgent"] > 0 and r["n_low"] > 0
    # every urgent line is an observed event exactly once
    assert r["o1"] == r["n_urgent"]
    assert r["chi2"] >= 0.0
    # z^2 == chi2 up to rounding
    assert abs(r["z"] ** 2 - r["chi2"]) < 1e-3


def test_session_overlap_symmetric_sane(spark, sf_dir):
    rows = REGISTRY["session_overlap_pairs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["u1"] < r["u2"]
        assert r["n_overlaps"] >= 1
        assert r["overlap_secs"] >= 0
    secs = [r["overlap_secs"] for r in rows]
    assert secs == sorted(secs, reverse=True)


def test_simpson_audit_shape(spark, sf_dir):
    rows = REGISTRY["simpson_paradox_audit"].fn(spark, sf_dir).collect()
    strata = {r["stratum"] for r in rows}
    assert strata == {"OVERALL", "weekday", "weekend"}
    for r in rows:
        assert 0.0 <= r["rate_heavy"] <= 1.0
        assert 0.0 <= r["rate_light"] <= 1.0
        if r["stratum"] == "OVERALL":
            assert r["reversed_vs_overall"] == 0
