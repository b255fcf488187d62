"""Behavioral pins for the monotone-peel fixpoint early exit
(kcore_parts / ktruss_suppliers, round 9).

The oracle tests prove fixture equivalence; these pin the LOGIC on
hand-built graphs where the expected peel is computable by eye, for
both paths:

- early exit taken (successive survivor counts equal => fixpoint =>
  remaining unrolled rounds are no-ops, `converged` true), and
- budget exhausted without convergence (`converged` false, partial
  peel values exactly as the oracle's full unroll would produce).

Fixtures are written as parquet so the queries' `tables.load` path is
exercised unchanged; the k / round-budget module constants are
monkeypatched to make tiny graphs interesting.
"""

from __future__ import annotations

import os

import pytest

from big_data_pr_spark.queries import graph_ext, stat_tests


def _write_lineitem(spark, tmp_path, rows, with_supp=False):
    """rows: (orderkey, partkey) or (orderkey, partkey, suppkey)."""
    sf_dir = str(tmp_path)
    if with_supp:
        df = spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_suppkey long"
        )
    else:
        df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    return sf_dir


@pytest.mark.parametrize("force_distributed", [False, True])
def test_kcore_early_exit_converged(spark, tmp_path, monkeypatch, force_distributed):
    # triangle {1,2,3} + pendant 4 on 1; k=2: round 1 drops the
    # pendant, round 2 changes nothing -> early exit with the
    # triangle (degree 2 each) and converged=True.
    # Parametrized over the r13 driver peel and the distributed peel
    # (env gate forced to 0) -- both must produce identical rows.
    if force_distributed:
        monkeypatch.setenv("SPARK_GRAFT_KCORE_DRIVER_MAX_EDGES", "0")
    monkeypatch.setattr(graph_ext, "_KCORE_K", 2)
    rows = [(10, 1), (10, 2), (11, 2), (11, 3), (12, 1), (12, 3), (13, 1), (13, 4)]
    sf_dir = _write_lineitem(spark, tmp_path, rows)
    got = [tuple(r) for r in graph_ext.kcore_parts(spark, sf_dir).collect()]
    assert got == [(1, 2, True), (2, 2, True), (3, 2, True)]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_kcore_budget_exhausted_not_converged(
    spark, tmp_path, monkeypatch, force_distributed
):
    # path 1-2-...-10, k=2: each round peels both endpoints, so a
    # 2-round budget leaves {3..8} with the endpoint degrees of the
    # PARTIAL peel — exactly what the oracle's identical unroll
    # yields — and converged=False (the 3rd round would still shrink)
    if force_distributed:
        monkeypatch.setenv("SPARK_GRAFT_KCORE_DRIVER_MAX_EDGES", "0")
    monkeypatch.setattr(graph_ext, "_KCORE_K", 2)
    monkeypatch.setattr(graph_ext, "_KCORE_ROUNDS", 2)
    rows = [(100 + i, v) for i in range(9) for v in (i + 1, i + 2)]
    sf_dir = _write_lineitem(spark, tmp_path, rows)
    got = [tuple(r) for r in graph_ext.kcore_parts(spark, sf_dir).collect()]
    assert got == [
        (4, 2, False),
        (5, 2, False),
        (6, 2, False),
        (7, 2, False),
        (3, 1, False),
        (8, 1, False),
    ]


def _write_supply(spark, tmp_path, pairs):
    """pairs: (partkey, suppkey) co-supply facts; part table marks all
    parts p_size=1 so the query's dimension filter keeps them."""
    sf_dir = str(tmp_path)
    li = spark.createDataFrame(
        [(i, pk, sk) for i, (pk, sk) in enumerate(pairs)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    parts = sorted({pk for pk, _ in pairs})
    pt = spark.createDataFrame([(p, 1) for p in parts], "p_partkey long, p_size int")
    pt.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "part.parquet")
    )
    return sf_dir


def _clique_supply(suppliers):
    """Every supplier pair shares exactly 2 parts (>= the shared>=2
    edge threshold): part ids are synthesized per pair."""
    pairs = []
    pid = 1000
    sups = sorted(suppliers)
    for i, a in enumerate(sups):
        for b in sups[i + 1 :]:
            for _ in range(2):
                pairs += [(pid, a), (pid, b)]
                pid += 1
    return pairs


@pytest.mark.parametrize("force_distributed", [False, True])
def test_ktruss_early_exit_stable_k4(spark, tmp_path, monkeypatch, force_distributed):
    # K4 supplier clique: every edge sits in 2 triangles = the 4-truss
    # threshold, so round 1 drops nothing -> immediate fixpoint exit,
    # all 6 edges and 4 suppliers survive, converged=True.
    # Parametrized over the r13 driver peel and the distributed peel.
    if force_distributed:
        monkeypatch.setenv("SPARK_GRAFT_TRUSS_DRIVER_MAX", "0")
    sf_dir = _write_supply(spark, tmp_path, _clique_supply([1, 2, 3, 4]))
    row = stat_tests.ktruss_suppliers(spark, sf_dir).collect()[0]
    assert tuple(row) == (6, 6, 4, True)


@pytest.mark.parametrize("force_distributed", [False, True])
def test_ktruss_triangle_peels_to_empty(
    spark, tmp_path, monkeypatch, force_distributed
):
    # a single triangle: each edge is in only 1 < k-2 triangles, so
    # round 1 empties the edge set and round 2 confirms the (empty)
    # fixpoint -> early exit, converged=True
    if force_distributed:
        monkeypatch.setenv("SPARK_GRAFT_TRUSS_DRIVER_MAX", "0")
    sf_dir = _write_supply(spark, tmp_path, _clique_supply([1, 2, 3]))
    row = stat_tests.ktruss_suppliers(spark, sf_dir).collect()[0]
    assert tuple(row) == (3, 0, 0, True)
