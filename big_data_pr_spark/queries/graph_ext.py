"""Graph-analytics extensions on the supplier co-supply graph —
Adamic-Adar link prediction and k-core decomposition by peeling.

Reference capability these generalize: the reference has no graph
surface at all; a training-data engine needs one for entity-resolution
blocking (which candidate pairs to score first — Adamic-Adar) and for
dense-subgraph curation (which entities sit in the well-connected core
vs the sparse fringe — k-core). Both run on the same bipartite
supplier-part edge set as triangle_count_suppliers /
jaccard_supplier_pairs (p_size=1 subgraph, stat_tests.py).

Scale posture: pair generation goes through the part-key join (an
inverted index — never supplier x supplier), weights broadcast back,
and the k-core peel is a bounded unrolled loop where every round is
one degree-aggregation + one semi-join on the *surviving edge set*,
which only shrinks. At 100 TB the same shapes hold; hub parts would be
capped by degree (as dedup's stop-shingle cap does) before pairing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

_CO_SUPPLY_PS = """
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 1
"""


def _ps_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").where(F.col("p_size") == 1)
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )


@register(
    "adamic_adar_suppliers",
    f"""
    WITH ps AS ({_CO_SUPPLY_PS}),
    deg AS (
      SELECT pk, count(*) AS d FROM ps GROUP BY pk HAVING count(*) >= 2
    ),
    pairs AS (
      SELECT a.sk AS s1, b.sk AS s2,
             sum(1.0 / ln(d.d)) AS aa,
             CAST(count(*) AS BIGINT) AS shared
      FROM ps a
      JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
      JOIN deg d ON d.pk = a.pk
      GROUP BY 1, 2
    )
    SELECT s1, s2, shared, round(aa, 6) AS adamic_adar
    FROM pairs
    ORDER BY round(aa, 6) DESC, s1, s2
    LIMIT 20
    """,
    doc="Adamic-Adar link prediction on the supplier co-supply graph: "
    "candidate pair score = sum over shared parts of 1/ln(part "
    "degree), so overlap through rare parts counts more than overlap "
    "through hub parts — the standard re-weighting that makes "
    "common-neighbor blocking usable when a few hubs connect "
    "everything. Pairs are generated through the part-key inverted "
    "index (one equi-join, never supplier x supplier) with the weight "
    "joined in before the pair groupBy; parts with degree 1 "
    "contribute no pair and ln(1)=0 is excluded by the HAVING. "
    "Deterministic top-20 via (score, s1, s2) total order.",
)
def adamic_adar_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps_edges(spark, sf_dir)
    deg = (
        ps.groupBy(F.col("pk").alias("dpk"))
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= 2)
    )
    a, b = ps.alias("a"), ps.alias("b")
    pairs = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .join(F.broadcast(deg), F.col("a.pk") == F.col("dpk"))
        .groupBy(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .agg(
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("aa"),
            F.count("*").cast("bigint").alias("shared"),
        )
    )
    # rank on the ROUNDED score: float summation order differs between
    # engines, so exact-tied groups (complete-graph pairs share identical
    # part sets at small SF) would otherwise straddle the top-20 cutoff
    # differently
    return (
        pairs.orderBy(F.desc(F.round("aa", 6)), "s1", "s2")
        .limit(20)
        .select("s1", "s2", "shared", F.round("aa", 6).alias("adamic_adar"))
    )


_KCORE_K = 75
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    # AS MATERIALIZED is load-bearing: each round references the previous
    # edge CTE three times, so DuckDB's default CTE inlining would expand
    # the chain 3^rounds times (observed: "too many open files" on the
    # base parquet before any row is produced).
    ctes = [
        """WITH lo AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    )""",
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a.pk AS s1, b.pk AS s2
      FROM lo a JOIN lo b ON a.ok = b.ok AND a.pk <> b.pk
    )""",
    ]
    for i in range(_KCORE_ROUNDS):
        ctes.append(
            f"""
    d{i} AS MATERIALIZED (
      SELECT s1 AS sk, count(*) AS d FROM e{i} GROUP BY s1
      HAVING count(*) >= {_KCORE_K}
    ),
    e{i + 1} AS MATERIALIZED (
      SELECT e.s1, e.s2 FROM e{i} e
      JOIN d{i} da ON da.sk = e.s1
      JOIN d{i} db ON db.sk = e.s2
    )"""
        )
    n = _KCORE_ROUNDS
    return (
        ",\n".join(ctes)
        + f""",
    core AS (
      SELECT s1 AS pk, CAST(count(*) AS BIGINT) AS core_degree
      FROM e{n} GROUP BY s1
    ),
    conv AS (
      SELECT (SELECT count(*) FROM e{n}) = (SELECT count(*) FROM e{n - 1})
             AS converged
    )
    SELECT c.pk AS partkey, c.core_degree, v.converged
    FROM core c CROSS JOIN conv v
    ORDER BY c.core_degree DESC, c.pk
    """
    )


@register(
    "kcore_parts",
    _kcore_oracle(),
    doc=f"{_KCORE_K}-core of the part co-order graph (parts joined when "
    "some order contains both) by iterative peeling, "
    f"{_KCORE_ROUNDS} unrolled rounds: each round drops every part "
    f"with fewer than {_KCORE_K} surviving neighbors and keeps only "
    "edges between survivors; the fixpoint is the maximal subgraph "
    "where everyone has >= k neighbors — the dense co-occurrence core "
    "worth exhaustive pairwise scoring, vs the fringe that blocking "
    "can skip. `converged` certifies the peel reached its fixpoint "
    "within the round budget (edge count unchanged in the last round; "
    "measured: 5 rounds at sf0.01/sf0.1). Each round is one degree "
    "groupBy + two semi-joins on a monotonically shrinking edge set; "
    "the projection itself goes through the order-key inverted index, "
    "never part x part. Bounded unrolling keeps the plan static and "
    "the DuckDB oracle replays identical rounds (AS MATERIALIZED, or "
    "CTE inlining re-evaluates each round 3^8 times).",
)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = lo.alias("a"), lo.alias("b")
    # the edge set is built ONCE and cached; each peel round only
    # re-derives the |parts|-sized alive set (degree >= k in the
    # subgraph induced by the previous alive set), so a round costs two
    # semi-joins over the cached edges + one small-key groupBy — no
    # per-round edge re-materialization
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("s1"), F.col("b.pk").alias("s2"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # SCALE GATE (r6 verdict #4): the alive set is |parts|-sized —
    # broadcastable at TPC-H sf but unbounded at 100 TB part
    # cardinality. Gate the broadcast hint on a one-time count of the
    # vertex set; past the threshold the semi-joins fall back to
    # shuffles (edges are already hash-partitioned by the join key, so
    # the alive side — orders of magnitude smaller than edges — is the
    # only moving data). Env override exists so the fallback plan is
    # pin-testable at any sf.
    # r13 OPT: cardinality-gated DRIVER peel (the pagerank/HITS/
    # connected_components collect class). The peel is pure INTEGER
    # arithmetic — per-round degrees of the alive-induced subgraph —
    # so a driver replay over the collected edge list is exact by
    # construction (no float folds anywhere). One count() materializes
    # the lazy edge checkpoint (the job round 1 would have paid) and
    # gates: below the default 4M directed edges (64 MB of (s1,s2)
    # longs over Arrow, env-overridable) the 8-round loop runs as
    # vectorized bincounts on the driver, replacing 5 rounds x
    # (2 broadcast semi-joins + groupBy + count) of fixed per-job
    # overhead (measured: 30 -> ~5 Spark jobs, 4.37 -> ~2.1 s warm at
    # sf0.1, identical rows). Above the gate the distributed peel
    # below runs unchanged; parity pinned in tests/test_graph_peel.py.
    driver_max = int(
        os.environ.get("SPARK_GRAFT_KCORE_DRIVER_MAX_EDGES", str(4_000_000))
    )
    n_edges = edges.count()
    if n_edges <= driver_max:
        import numpy as np

        tbl = edges.toArrow()
        i1 = tbl.column("s1").to_numpy(zero_copy_only=False)
        i2 = tbl.column("s2").to_numpy(zero_copy_only=False)
        # index degree/alive arrays by the RAW part key: TPC-H part
        # keys are dense small ints, so a direct bincount beats any
        # remap (np.unique measured 15 s on 4.8M ids in this runtime).
        # Guard the allocation: past 2^25 max id (a 256 MB degree
        # array) fall through to the distributed peel.
        mx = int(max(i1.max(), i2.max())) if n_edges else 0
        mn = int(min(i1.min(), i2.min())) if n_edges else 0
        # negative keys (corrupt fixture / non-TPC-H data) would make
        # bincount raise — fall through to the distributed peel, same
        # as the oversized-id case
        if 0 <= mn and mx <= 33_554_432:
            nn = mx + 1
            alive_mask = None
            deg = None
            prev_n: int | None = None
            converged_early = False
            for _ in range(_KCORE_ROUNDS):
                if alive_mask is None:
                    deg = np.bincount(i1, minlength=nn)
                else:
                    m = alive_mask[i1] & alive_mask[i2]
                    deg = np.bincount(i1[m], minlength=nn)
                alive_new = deg >= _KCORE_K
                n = int(alive_new.sum())
                if prev_n is not None and n == prev_n:
                    converged_early = True
                    break
                prev_n = n
                alive_mask = alive_new
            if converged_early:
                out_deg = deg
                conv = True
            else:
                m = alive_mask[i1] & alive_mask[i2]
                final_deg = np.bincount(i1[m], minlength=nn)
                conv = bool(int(final_deg.sum()) == int(deg.sum()))
                out_deg = final_deg
            present = np.nonzero(out_deg)[0]
            import pandas as pd

            pdf = pd.DataFrame(
                {
                    "partkey": present.astype(np.int64),
                    "core_degree": out_deg[present].astype(np.int64),
                    "converged": np.full(len(present), conv, dtype=bool),
                }
            )
            # Arrow createDataFrame: the row-pickle path costs ~2 s for
            # a 20k-row handoff (measured), the Arrow path ~0.1 s. Set
            # at runtime (same pattern as tables.load's nanosAsLong)
            # so the driver's bare session gets it too.
            spark = lo.sparkSession
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            return spark.createDataFrame(
                pdf,
                "partkey bigint, core_degree bigint, converged boolean",
            ).orderBy(F.desc("core_degree"), F.asc("partkey"))
    bcast_max = int(
        os.environ.get("SPARK_GRAFT_KCORE_BCAST_MAX", str(5_000_000))
    )
    # r13: gate on the part DIMENSION row count (cheap metadata-sized
    # count, no wide scan) instead of a full lineitem scan + distinct
    # shuffle — |distinct l_partkey| <= |part| always, so the gate
    # decision is conservative-identical and one data-sized job
    # cheaper. The hint changes plan strategy only, never results.
    # Fixture dirs without a part table (tests) keep the exact gate.
    try:
        use_broadcast = load(spark, sf_dir, "part").count() <= bcast_max
    except Exception:
        use_broadcast = lo.select("pk").distinct().count() <= bcast_max

    def induced_degrees(alive: DataFrame | None) -> DataFrame:
        e = edges
        if alive is not None:
            hint = F.broadcast if use_broadcast else (lambda df: df)
            e = e.join(
                hint(alive.withColumnRenamed("sk", "s1")), "s1", "left_semi"
            ).join(
                hint(alive.withColumnRenamed("sk", "s2")), "s2", "left_semi"
            )
        return e.groupBy(F.col("s1").alias("sk")).agg(F.count("*").alias("d"))

    # EARLY EXIT (r9): the alive sets form a monotone shrinking chain
    # (a part dropped by one peel round can never regain degree), so
    # equal counts in successive rounds => equal sets => fixpoint =>
    # every remaining unrolled round is a literal no-op. The count()
    # per round is ~free — it forces the lazy checkpoint that the next
    # round would materialize anyway — and convergence is measured at
    # 5 rounds at sf0.01/sf0.1, so this skips 3 of 9 full-edge degree
    # scans plus the duplicate final scan. Output is identical to the
    # oracle's fixed 8 rounds by the fixpoint property, and reaching
    # the fixpoint at round i <= 8 implies |e7| == |e8|, i.e. the
    # oracle's `converged` column is literally true.
    alive: DataFrame | None = None
    deg = None
    prev_deg = None
    prev_n: int | None = None
    converged_early = False
    for _ in range(_KCORE_ROUNDS):
        prev_deg = deg
        deg = induced_degrees(alive)
        alive = (
            deg.filter(F.col("d") >= _KCORE_K)
            .select("sk")
            .localCheckpoint(eager=False)
        )
        n = alive.count()
        if prev_n is not None and n == prev_n:
            converged_early = True
            break
        prev_n = n
    if converged_early:
        # alive_i == alive_{i-1}, so deg (degrees in the subgraph
        # induced by alive_{i-1}) IS the final degree table and every
        # row already has d >= k
        final_deg = deg
        core = final_deg.select(
            F.col("sk").alias("partkey"),
            F.col("d").cast("bigint").alias("core_degree"),
        )
        return core.select(
            "partkey", "core_degree", F.lit(True).alias("converged")
        ).orderBy(F.desc("core_degree"), F.asc("partkey"))
    final_deg = induced_degrees(alive)
    core = final_deg.select(
        F.col("sk").alias("partkey"), F.col("d").cast("bigint").alias("core_degree")
    )
    # |e_i| comparison via degree sums: sum(deg over e_i) == 2|e_i|
    conv = (
        final_deg.agg(F.sum("d").alias("n_last"))
        .crossJoin(deg.agg(F.sum("d").alias("n_prev")))
        .select((F.col("n_last") == F.col("n_prev")).alias("converged"))
    )
    return (
        core.crossJoin(F.broadcast(conv))
        .select("partkey", "core_degree", "converged")
        .orderBy(F.desc("core_degree"), F.asc("partkey"))
    )


_LPA_ROUNDS = 3
_LPA_MIN_SHARED = 3

_LPA_EDGES_SQL = f"""
    ps AS ({_CO_SUPPLY_PS}),
    und AS (
      SELECT a.sk AS u, b.sk AS v, CAST(count(*) AS DOUBLE) AS w
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
      GROUP BY 1, 2 HAVING count(*) >= {_LPA_MIN_SHARED}
    ),
    edges AS (
      SELECT u, v, w FROM und
      UNION ALL
      SELECT v AS u, u AS v, w FROM und
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)
"""


def _lpa_round_sql(k: int) -> str:
    return f"""
    l{k} AS (
      SELECT node, lbl FROM (
        SELECT e.v AS node, p.lbl,
               row_number() OVER (
                 PARTITION BY e.v ORDER BY sum(e.w) DESC, p.lbl
               ) AS rn
        FROM edges e JOIN l{k - 1} p ON p.node = e.u
        GROUP BY e.v, p.lbl
      ) WHERE rn = 1
    )"""


@register(
    "label_propagation_communities",
    f"""
    WITH {_LPA_EDGES_SQL},
    {",".join(_lpa_round_sql(k) for k in range(1, _LPA_ROUNDS + 1))}
    SELECT lbl AS community,
           CAST(count(*) AS BIGINT) AS members,
           CAST(min(node) AS BIGINT) AS min_member
    FROM l{_LPA_ROUNDS}
    GROUP BY lbl
    ORDER BY members DESC, community
    """,
    doc="""Synchronous weighted label propagation (3 fixed rounds,
    deterministic: argmax of summed neighbor edge weight, ties to the
    smallest label) over the supplier co-supply graph (edges = supplier
    pairs sharing >= 3 p_size=1 parts, weight = shared count).
    Communities are denser than connected components — the weighted
    vote splits bridged clusters that pure reachability merges. Each
    round is one join of the |V|-sized label vector (broadcast) against
    the cached edge aggregate + one grouped top-1 window; iteration
    cost is independent of raw-table size after the first pass.""",
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ps = _ps_edges(spark, sf_dir)
    a = ps.select(F.col("pk"), F.col("sk").alias("u"))
    b = ps.select(F.col("pk"), F.col("sk").alias("v"))
    und = (
        a.join(b, "pk")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("w"))
        .where(F.col("w") >= _LPA_MIN_SHARED)
    )
    # |E|-bounded aggregate: a few partitions keep each LPA round at
    # a handful of tasks (the vote tables only shrink from here)
    edges = und.select("u", "v", "w").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).coalesce(4).cache()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w_top = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("lbl"))
    for _ in range(_LPA_ROUNDS):
        labels = (
            edges.join(
                F.broadcast(labels.withColumnRenamed("node", "u")), "u"
            )
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.sum("w").alias("wsum"))
            .withColumn("rn", F.row_number().over(w_top))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count("*").cast("bigint").alias("members"),
            F.min("node").cast("bigint").alias("min_member"),
        )
        .orderBy(F.desc("members"), "community")
    )


# ---------------------------------------------------------------------------
# Round-6i: HITS hubs/authorities on the event-transition graph
# ---------------------------------------------------------------------------

_HITS_ITERS = 10


@register(
    "hits_event_transitions",
    f"""
    WITH RECURSIVE edges AS MATERIALIZED (
      SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events)
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT event_type AS node FROM events
    ),
    it AS (
      SELECT 0 AS t, node, CAST(1.0 AS DOUBLE) AS h, CAST(1.0 AS DOUBLE) AS a
      FROM nodes
      UNION ALL
      SELECT t, node,
             hr / sqrt(sum(hr * hr) OVER ()) AS h,
             ar / sqrt(sum(ar * ar) OVER ()) AS a
      FROM (
        SELECT it0.t + 1 AS t, n.node,
               coalesce(sum(eo.w * it0.a)
                 FILTER (WHERE eo.src = n.node AND eo.dst = it0.node), 0) AS hr,
               coalesce(sum(ei.w * it0.h)
                 FILTER (WHERE ei.dst = n.node AND ei.src = it0.node), 0) AS ar
        FROM it it0
        CROSS JOIN nodes n
        LEFT JOIN edges eo ON eo.src = n.node AND eo.dst = it0.node
        LEFT JOIN edges ei ON ei.dst = n.node AND ei.src = it0.node
        WHERE it0.t < {_HITS_ITERS}
        GROUP BY it0.t, n.node
      )
    )
    SELECT node, round(h, 6) AS hub, round(a, 6) AS authority
    FROM it WHERE t = {_HITS_ITERS} ORDER BY node
    """,
    doc="HITS hubs/authorities (Kleinberg 1999) on the weighted "
    "event-type transition graph — the companion eigenvector pair to "
    "pagerank_event_transitions: hub = types that LEAD INTO important "
    f"types, authority = types led into. {_HITS_ITERS} power-iteration "
    "rounds with L2 normalization each round. Scale: the DATA-sized "
    "work is the transition count (one window + one grouped count); "
    "the iteration runs on the |types|^2-bounded integer count matrix "
    "— collected driver-side in Spark (exact integers cross the "
    "boundary, float math replayed identically) and as a recursive "
    "CTE in the oracle.",
)
def hits_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
    )
    nodes = sorted(
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
    )
    cmat = {(r["src"], r["dst"]): r["c"] for r in edges.collect()}
    h = {n: 1.0 for n in nodes}
    a = {n: 1.0 for n in nodes}
    for _ in range(_HITS_ITERS):
        hr = {
            n: sum(cmat.get((n, m), 0) * a[m] for m in nodes if (n, m) in cmat)
            for n in nodes
        }
        ar = {
            n: sum(cmat.get((m, n), 0) * h[m] for m in nodes if (m, n) in cmat)
            for n in nodes
        }
        hn = sum(v * v for v in hr.values()) ** 0.5
        an = sum(v * v for v in ar.values()) ** 0.5
        h = {n: hr[n] / hn for n in nodes}
        a = {n: ar[n] / an for n in nodes}
    return spark.createDataFrame(
        [(n, round(h[n], 6), round(a[n], 6)) for n in nodes],
        "node string, hub double, authority double",
    ).orderBy("node")
