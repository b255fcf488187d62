"""PageRank operator tests: parity with a sequential numpy replica of
the same rounded recurrence, plus structural sanity (mass conservation,
dangling/isolated handling)."""

from __future__ import annotations

import pytest

from big_data_pr_spark.operators import graph


def _numpy_pagerank(edges, nodes, damping=0.85, n_iter=8, round_to=6):
    """Sequential replica of graph.pagerank's exact recurrence."""
    outw = {}
    agg = {}
    for s, d in edges:
        agg[(s, d)] = agg.get((s, d), 0.0) + 1.0
    for (s, _), w in agg.items():
        outw[s] = outw.get(s, 0.0) + w
    p = {(s, d): w / outw[s] for (s, d), w in agg.items()}
    n = float(len(nodes))
    rank = {v: round(1.0 / n, round_to) for v in nodes}
    teleport = 1.0 - damping
    for _ in range(n_iter):
        contrib = {}
        for (s, d), pr in p.items():
            contrib[d] = contrib.get(d, 0.0) + rank[s] * pr
        dangling = sum(r for v, r in rank.items() if v not in outw)
        rank = {
            v: round(
                teleport / n + damping * (contrib.get(v, 0.0) + dangling / n),
                round_to,
            )
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def toy(spark):
    # 1→2, 1→3, 2→3, 3→1 cycle; 4 dangling (in-arcs only); 5 isolated
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (2, 4)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    return edges, edf, ndf


def test_pagerank_matches_sequential_replica(spark, toy):
    edges, edf, ndf = toy
    got = {r["node"]: r["rank"] for r in graph.pagerank(edf, ndf).collect()}
    want = _numpy_pagerank(edges, list(range(1, 6)))
    assert got == want


def test_pagerank_mass_and_ordering(spark, toy):
    edges, edf, ndf = toy
    got = {r["node"]: r["rank"] for r in graph.pagerank(edf, ndf).collect()}
    # total mass ≈ 1 (per-iteration rounding loses ≤ n·5e-7)
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # the cycle hub (3) outranks the isolated node (5); every rank > 0
    assert got[3] > got[5]
    assert all(v > 0 for v in got.values())


def test_pagerank_default_node_universe(spark, toy):
    _, edf, _ = toy
    got = {r["node"]: r["rank"] for r in graph.pagerank(edf).collect()}
    # without an explicit universe, nodes = arc endpoints (no isolated 5)
    assert set(got) == {1, 2, 3, 4}
    want = _numpy_pagerank([(1, 2), (1, 3), (2, 3), (3, 1), (2, 4)], [1, 2, 3, 4])
    assert got == want


def test_pagerank_driver_fast_path_parity_with_distributed(spark, toy):
    """The cardinality-gated driver loop (r13) and the distributed
    power iteration are the same recurrence: identical output on a
    graph exercising dangling mass, an isolated node, parallel arcs
    (summed weights), and float weights."""
    edges = [
        (1, 2, 1.5), (1, 3, 0.5), (2, 3, 2.0), (3, 1, 1.0),
        (2, 4, 0.25), (1, 2, 0.75),  # parallel arc: summed
    ]
    edf = spark.createDataFrame(edges, "src long, dst long, w double")
    ndf = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    fast = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edf, ndf, weight="w").collect()
    }
    dist = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            edf, ndf, weight="w", driver_max_nodes=0
        ).collect()
    }
    assert fast == dist
    assert set(fast) == {1, 2, 3, 4, 5}


def test_pagerank_distributed_path_matches_replica(spark, toy):
    """The distributed fallback (gate forced off) still matches the
    sequential replica — the fast path must never become the only
    tested implementation."""
    edges, edf, ndf = toy
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edf, ndf, driver_max_nodes=0).collect()
    }
    assert got == _numpy_pagerank(edges, list(range(1, 6)))
