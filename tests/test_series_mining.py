"""Behavioral invariants for the series-mining additions (round-6i
Kalman local-level filter) — convergence properties the value-hash
oracle can't express."""

from __future__ import annotations

from big_data_pr_spark.queries import REGISTRY


def test_kalman_gain_converges_to_riccati_fixpoint(spark, sf_dir):
    rows = REGISTRY["kalman_local_level_daily"].fn(spark, sf_dir).collect()
    assert len(rows) > 20
    # steady-state gain for q=0.01, r=1: P* solves P = (1-K)(P+q),
    # K = (P+q)/(P+q+r)  =>  K* = (-q + sqrt(q^2+4qr)) / 2r adjusted;
    # empirically the gain must be monotone-ish decreasing and settle
    gains = [r["gain"] for r in rows]
    assert gains[0] == 1.0
    tail = gains[-10:]
    assert max(tail) - min(tail) < 1e-6  # converged
    assert 0.0 < tail[-1] < 0.2  # q/r = 0.01 => small steady-state gain
    # filtered level must lie within the z-scored data envelope
    xs = [r["x"] for r in rows]
    assert min(xs) - 1e-9 <= min(r["level"] for r in rows)
    assert max(r["level"] for r in rows) <= max(xs) + 1e-9


def test_huber_slope_between_bounds(spark, sf_dir):
    r = REGISTRY["huber_trend_daily"].fn(spark, sf_dir).first()
    assert r["n_days"] > 20
    assert r["scale"] > 0
    # robust slope stays the same order of magnitude as OLS on this
    # well-behaved fixture (no adversarial outliers)
    assert abs(r["slope_huber"]) <= 10 * abs(r["slope_ols"]) + 1e-6


def test_overdispersion_index_consistent(spark, sf_dir):
    r = REGISTRY["overdispersion_user_events"].fn(spark, sf_dir).first()
    assert r["n_users"] > 0
    assert r["mean_events"] > 0
    assert r["dispersion_index"] > 0
    if r["nb_r_moments"] is not None:
        assert r["var_events"] > r["mean_events"]
        assert r["nb_r_moments"] > 0
