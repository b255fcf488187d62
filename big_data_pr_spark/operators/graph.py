"""Graph analytics over DataFrame edge lists: PageRank power iteration.

The reference has no graph operators; this family extends the engine
for behavior-graph analytics (e.g. ranking event-type transition graphs
— Markov-chain behavioral attribution) and reuses the same edge-list
shape as the near-dup graph operators in :mod:`.dedup`
(``connected_components``, ``propagate_seed_hops``).

Scale: the expensive part of any real invocation is DERIVING the edge
list (a window + aggregation over the 100 TB fact table — one shuffle
by the partition key, one by the edge key); the power iteration itself
runs over the aggregated edge list, so every per-iteration shuffle is
sized by |edges| and |nodes|, never by the fact table. Lineage is
truncated per iteration with ``localCheckpoint`` (constant plan size);
the dangling-mass scalar stays in-plan via a broadcast cross join — no
driver collect inside the loop.

Determinism contract (oracle-friendly): ranks are rounded to
``round_to`` decimals after EVERY iteration, so an independent engine
following the same rounded recurrence (e.g. a DuckDB unrolled-CTE
oracle) reproduces the exact float values — cross-engine summation-
order drift is capped at ~1 ulp per iteration and removed by the
per-iteration round.
"""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _round_half_up(x: float, digits: int) -> float:
    """Exact replica of Spark's ``round(double, d)``: Catalyst rounds
    via ``BigDecimal.valueOf(x).setScale(d, HALF_UP)``, i.e. HALF_UP on
    the shortest decimal representation — which is what
    ``Decimal(repr(x)).quantize`` computes (verified value-for-value
    including the 5e-7 halfway case, see OPTIMIZATION_r13.md)."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 8,
    round_to: int = 6,
    driver_max_nodes: int | None = None,
) -> DataFrame:
    """PageRank by fixed-iteration power iteration over an edge list.

    ``edges``: one row per (src, dst [, weight]) arc; parallel arcs are
    summed. Per-src weights are normalized into transition
    probabilities. ``nodes`` optionally supplies the node universe
    (isolated nodes keep teleport-only mass); defaults to every
    endpoint. Dangling nodes (no out-arcs) redistribute their mass
    uniformly, the standard Google-matrix completion.

    Returns ``(node, rank)`` after exactly ``n_iter`` iterations of
    ``rank' = (1-d)/N + d · (Σ_in rank·p + dangling_mass/N)``, each
    rounded to ``round_to`` decimals (see module docstring).
    """
    w_col = (F.col(weight) if weight else F.lit(1)).cast("double")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w"))
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    nodes = nodes.localCheckpoint(eager=False)
    agg = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    n = nodes.count()

    # CARDINALITY-GATED DRIVER FAST PATH (r13 optimization; the
    # hits_event_transitions precedent): once arcs are aggregated the
    # state is |nodes| + |distinct arcs| — for a type-transition graph
    # that is types², thousands of rows, while the distributed loop
    # costs 8 iterations x (join + groupBy + anti-join + checkpoint)
    # of driver-bound tiny-stage scheduling (measured 5.4 s build /
    # 75 jobs at sf0.1 for ~10 nodes). Exact integers/doubles cross
    # the boundary once; the recurrence replays the identical float
    # expression with Spark-identical HALF_UP rounding per iteration
    # (the same per-iteration round that already caps the DuckDB
    # oracle's fold-order drift — the driver loop is a third engine
    # under the same contract). The distributed loop below is the
    # parity-pinned fallback (tests/test_graph.py) and the only path
    # past the gates.
    gate_nodes = driver_max_nodes if driver_max_nodes is not None else int(
        os.environ.get("SPARK_GRAFT_PAGERANK_DRIVER_MAX", "4096")
    )
    if 0 < n <= gate_nodes:
        arc_rows = agg.limit(1_048_577).collect()
        node_rows = [r["node"] for r in nodes.collect()]
        if len(arc_rows) <= 1_048_576 and all(
            v is not None for v in node_rows
        ) and all(
            r["src"] is not None and r["dst"] is not None for r in arc_rows
        ):
            node_vals = sorted(node_rows)
            w_by_arc = {(r["src"], r["dst"]): float(r["w"]) for r in arc_rows}
            tot: dict = {}
            for (s, _d), wv in sorted(w_by_arc.items()):
                tot[s] = tot.get(s, 0.0) + wv
            in_arcs: dict = {}
            for (s, d), wv in sorted(w_by_arc.items()):
                in_arcs.setdefault(d, []).append((s, wv / tot[s]))
            n_f = float(n)
            tele = 1.0 - damping
            rank = {v: _round_half_up(1.0 / n_f, round_to) for v in node_vals}
            for _ in range(n_iter):
                m = sum(rank[v] for v in node_vals if v not in tot)
                new = {}
                for v in node_vals:
                    s_in = 0.0
                    for u, p in in_arcs.get(v, ()):  # insertion = sorted-arc order
                        if u in rank:
                            s_in += rank[u] * p
                    new[v] = _round_half_up(
                        tele / n_f + damping * (s_in + m / n_f), round_to
                    )
                rank = new
            schema = T.StructType(
                [
                    nodes.schema["node"],
                    T.StructField("rank", T.DoubleType(), nullable=True),
                ]
            )
            return edges.sparkSession.createDataFrame(
                [(v, rank[v]) for v in node_vals], schema
            )

    outw = agg.groupBy("src").agg(F.sum("w").alias("tot")).localCheckpoint(eager=False)
    p_edges = (
        agg.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tot")).alias("p"))
        .localCheckpoint(eager=False)
    )
    teleport = F.lit(1.0) - F.lit(damping)  # same expression as the SQL oracle
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0) / F.lit(float(n)), round_to))
    for _ in range(n_iter):
        contrib = (
            ranks.join(p_edges, ranks["node"] == p_edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("s"))
            .withColumnRenamed("dst", "node")
        )
        dangling = (
            ranks.join(outw, ranks["node"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    teleport / F.lit(float(n))
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("m") / F.lit(float(n))),
                    round_to,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    nodes_cte: str,
    damping: float = 0.85,
    n_iter: int = 8,
    round_to: int = 6,
) -> str:
    """Build the DuckDB oracle for :func:`pagerank` by UNROLLING the
    fixed iterations into chained CTEs (no recursive-CTE single-self-
    reference limitation). ``edges_cte`` must yield (src, dst, w) and
    ``nodes_cte`` (node); both are pasted as CTE bodies."""
    d = repr(damping)
    parts = [
        f"WITH e_raw AS MATERIALIZED ({edges_cte})",
        f"nodes AS MATERIALIZED ({nodes_cte})",
        "e AS MATERIALIZED (SELECT src, dst, sum(w) AS w FROM e_raw GROUP BY src, dst)",
        "outw AS MATERIALIZED (SELECT src, sum(w) AS tot FROM e GROUP BY src)",
        "pe AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.tot AS p FROM e JOIN outw o USING (src))",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        f"r0 AS MATERIALIZED (SELECT node, round(1.0 / nn.n, {round_to}) AS rank "
        "FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n0.node,
         round((1.0 - {d}) / nn.n
               + {d} * (coalesce(c.s, 0.0) + dg.m / nn.n), {round_to}) AS rank
  FROM nodes n0
  CROSS JOIN nn
  LEFT JOIN (SELECT pe.dst AS node, sum(r.rank * pe.p) AS s
             FROM r{i - 1} r JOIN pe ON r.node = pe.src GROUP BY pe.dst) c
    ON n0.node = c.node
  CROSS JOIN (SELECT coalesce(sum(r.rank), 0.0) AS m
              FROM r{i - 1} r ANTI JOIN outw o ON r.node = o.src) dg
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank FROM r{n_iter} ORDER BY node"
    )
