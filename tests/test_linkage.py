"""Behavioral invariants for the probabilistic record-linkage family
(queries/linkage_queries.py). Cross-engine value equality is covered
by the golden-oracle suite; these pin the mathematical properties the
Fellegi-Sunter model guarantees by construction."""

from __future__ import annotations

import math

from big_data_pr_spark.queries import REGISTRY
from big_data_pr_spark.queries.linkage_queries import _FS_M, _FS_U


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_fs_patterns_weights_and_counts(spark, sf_dir):
    rows = _run("fs_linkage_patterns", spark, sf_dir)
    by_pat = {r["pattern"]: r for r in rows}
    # patterns are 3-bit strings, counts positive
    for pat, r in by_pat.items():
        assert len(pat) == 3 and set(pat) <= {"0", "1"}
        assert r["n_pairs"] >= 1
    # the FS weight is monotone in agreement: flipping any bit 0->1
    # strictly increases the composite weight (m_k > u_k for all k)
    for pat, r in by_pat.items():
        for k in range(3):
            if pat[k] == "0":
                up = pat[:k] + "1" + pat[k + 1 :]
                if up in by_pat:
                    assert by_pat[up]["fs_weight"] > r["fs_weight"]
    # full-agreement weight equals the closed form
    if "111" in by_pat:
        expect = sum(math.log2(m / u) for m, u in zip(_FS_M, _FS_U))
        assert abs(by_pat["111"]["fs_weight"] - expect) < 1e-5


def test_em_step_probabilities(spark, sf_dir):
    rows = _run("em_linkage_step", spark, sf_dir)
    assert [r["field"] for r in rows] == [
        "brand",
        "name_adjective",
        "name_noun",
    ]
    lam = {r["lambda1"] for r in rows}
    assert len(lam) == 1  # shared match prior
    (lam,) = lam
    assert 0.0 < lam < 1.0
    for r in rows:
        # M-step outputs are probabilities
        assert 0.0 <= r["u1"] <= 1.0
        assert 0.0 <= r["m1"] <= 1.0
        # the latent match class is driven by name agreement (brands
        # are uniform-random in the fixtures, so EM correctly learns
        # brand is uninformative — no m1 > u1 claim there)
        if r["field"] != "brand":
            assert r["m1"] > r["u1"]


def test_sorted_neighborhood_linear_candidates(spark, sf_dir):
    rows = {r["offset_pos"]: r for r in _run(
        "sorted_neighborhood_stats", spark, sf_dir)}
    assert set(rows) == {1, 2}
    # offset-2 windows produce strictly fewer pairs than offset-1
    # (each block loses one more tail record), and both are < N
    n = REGISTRY["fs_linkage_patterns"]  # noqa: F841 — registry sanity
    assert rows[2]["n_pairs"] < rows[1]["n_pairs"]
    for r in rows.values():
        assert 0 <= r["n_brand_match"] <= r["n_pairs"]
        assert r["mean_size_gap"] >= 0.0
