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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 8,
    round_to: int = 6,
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
    outw = agg.groupBy("src").agg(F.sum("w").alias("tot")).localCheckpoint(eager=False)
    p_edges = (
        agg.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("tot")).alias("p"))
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
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
