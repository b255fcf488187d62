"""Behavioral invariants for the data-valuation / coreset family
(queries/valuation_queries.py). Cross-engine value equality is covered
by the golden-oracle suite; these pin the mathematical properties the
algorithms guarantee by construction."""

from __future__ import annotations

from big_data_pr_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_t_closeness_bounds(spark, sf_dir):
    rows = _run("t_closeness_audit", spark, sf_dir)
    assert rows
    for r in rows:
        # TV distance is a metric on distributions: 0 <= t <= 1
        assert 0.0 <= r["t_dist"] <= 1.0
        assert r["breach"] == (1 if r["t_dist"] > 0.2 else 0)
        assert r["n_cls"] >= 1
    # singleton classes concentrate all mass on one segment: their TV
    # distance must exceed 1 - max_g p_g >= 1 - 1/|segments| - slack
    singles = [r for r in rows if r["n_cls"] == 1]
    for r in singles:
        assert r["t_dist"] > 0.5  # 5 segments, roughly uniform global


def test_knn_shapley_shape_and_bounds(spark, sf_dir):
    rows = _run("knn_shapley_valuation", spark, sf_dir)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert len(rs) == 10
        vals = [r["shapley"] for r in rs]
        # utility is an accuracy in [0,1] => every Shapley value in [-1,1]
        assert all(-1.0 <= v <= 1.0 for v in vals)
        # rows arrive ordered by pos = (sv desc, vec_id): non-increasing
        assert vals == sorted(vals, reverse=True)
        # the top value of a 3-NN utility cannot exceed 1/K
        assert vals[0] <= 1.0 / 3 + 1e-9


def test_good_turing_mass_conservation(spark, sf_dir):
    rows = _run("good_turing_smoothing", spark, sf_dir)
    assert rows
    p_unseen = rows[0]["p_unseen"]
    # synthetic corpora may have no hapax legomena: missing mass 0
    assert 0.0 <= p_unseen < 1.0
    mass = [r["mass_gt"] for r in rows if r["mass_gt"] is not None]
    # GT moves mass down one count class: total smoothed mass over the
    # observed classes plus the unseen mass cannot exceed 1 (it is
    # exactly 1 minus the mass of the largest count class's shift)
    assert sum(mass) <= 1.0 + 1e-6
    for r in rows:
        if r["r_star"] is not None:
            assert r["r_star"] > 0.0
        assert r["n_r"] >= 1


def test_hill_tail_index_positive(spark, sf_dir):
    (row,) = _run("hill_tail_index", spark, sf_dir)
    assert row["k"] == 200
    assert row["threshold"] > 0
    assert row["hill_h"] > 0
    assert abs(row["tail_alpha"] * row["hill_h"] - 1.0) < 1e-3


def test_kcenter_radius_monotone(spark, sf_dir):
    rows = sorted(_run("kcenter_coreset_greedy", spark, sf_dir),
                  key=lambda r: r["step"])
    assert [r["step"] for r in rows] == list(range(8))
    assert len({r["vec_id"] for r in rows}) == 8
    assert rows[0]["vec_id"] == 0 and rows[0]["radius"] is None
    radii = [r["radius"] for r in rows[1:]]
    assert all(x >= 0 for x in radii)
    # farthest-first: the max-min cover radius is non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))


def test_kcenter_driver_distributed_parity(spark, sf_dir, monkeypatch):
    """The r13 gated driver replay of the farthest-first loop must pick
    the same centers with the same radii as the distributed loop."""
    fast = sorted(
        tuple(r) for r in _run("kcenter_coreset_greedy", spark, sf_dir)
    )
    monkeypatch.setenv("SPARK_GRAFT_EMB_DRIVER_MAX_VECS", "0")
    dist = sorted(
        tuple(r) for r in _run("kcenter_coreset_greedy", spark, sf_dir)
    )
    assert fast == dist
