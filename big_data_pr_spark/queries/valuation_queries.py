"""Data valuation, coreset selection, and release-audit queries —
round-6o extensions.

Reference capability these extend: the reference's analytics layer
ranks and filters rows by aggregate statistics before serving / model
input (batch_processor.py steps 7-9, app.py model-input top-k); its
report reasons about which data is worth keeping. This module adds the
classical *data-valuation* members of that family, each a published
public algorithm re-expressed as declarative Spark plans:

- ``t_closeness_audit`` — t-closeness (Li, Li, Venkatasubramanian,
  ICDE 2007) with total-variation distance, completing the disclosure
  -control triple next to ``k_anonymity_audit`` / ``l_diversity_audit``;
- ``knn_shapley_valuation`` — EXACT Data-Shapley values for a K-NN
  classifier (Jia et al., VLDB 2019, Theorem 1): the O(N log N)
  closed-form recursion becomes a rank window + one suffix-sum window —
  no Monte-Carlo, no Python;
- ``good_turing_smoothing`` — Good-Turing frequency-of-frequencies
  smoothing (Good 1953): smoothed counts r* = (r+1)·N_{r+1}/N_r and the
  unseen-token mass N_1/N, the missing-mass companion to the
  Kneser-Ney / unigram-LM family;
- ``hill_tail_index`` — Hill (1975) tail-index estimator over the
  top-k order statistics of order totals: the heavy-tail exponent the
  Zipf/Pareto queries assume, now estimated;
- ``kcenter_coreset_greedy`` — Gonzalez (1985) farthest-first
  traversal / greedy k-center coreset over the embedding table (the
  selection rule behind coreset data pruning, Sener & Savarese 2018):
  k distributed argmax scans, constant driver state.

Scale posture, per query, inline below. Everything is built-in
expression work (zero Python UDFs); every float that crosses the
engine boundary is rounded on both sides; every top-k carries a
unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity
from ..tables import load
from .registry import register

# ---------------------------------------------------------------------------
# Shared cosine SQL (same fold shape the knn_* oracles use)
# ---------------------------------------------------------------------------


def _cos_sql(x: str, y: str) -> str:
    return f"""(
      list_sum(list_transform(range(1, len({x}) + 1),
        i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len({x}) + 1),
           i -> CAST({x}[i] AS DOUBLE) * CAST({x}[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len({y}) + 1),
           i -> CAST({y}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE))))))"""


# ---------------------------------------------------------------------------
# t-closeness release audit
# ---------------------------------------------------------------------------


@register(
    "t_closeness_audit",
    """
    WITH cls AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2, 3),
    tot AS (
      SELECT c_nationkey, bal_band, CAST(sum(n) AS BIGINT) AS n_cls
      FROM cls GROUP BY 1, 2),
    gdist AS (
      SELECT c_mktsegment,
             sum(n) / CAST((SELECT sum(n) FROM cls) AS DOUBLE) AS p_g
      FROM cls GROUP BY 1),
    dom AS (
      SELECT t.c_nationkey, t.bal_band, t.n_cls, g.c_mktsegment, g.p_g
      FROM tot t CROSS JOIN gdist g),
    tv AS (
      SELECT d.c_nationkey, d.bal_band, d.n_cls,
             round(0.5 * sum(abs(COALESCE(c.n, 0) / CAST(d.n_cls AS DOUBLE)
                                 - d.p_g)), 6) AS t_dist
      FROM dom d LEFT JOIN cls c
        ON c.c_nationkey = d.c_nationkey AND c.bal_band = d.bal_band
       AND c.c_mktsegment = d.c_mktsegment
      GROUP BY 1, 2, 3)
    SELECT c_nationkey, bal_band, n_cls, t_dist,
           CAST(CASE WHEN t_dist > 0.2 THEN 1 ELSE 0 END AS BIGINT) AS breach
    FROM tv ORDER BY c_nationkey, bal_band
    """,
    doc="t-closeness audit (Li et al. 2007, t=0.2) under the "
    "quasi-identifier (nation, 2000-wide balance band) with sensitive "
    "attribute = market segment: per equivalence class, the "
    "total-variation distance (categorical EMD with 0/1 ground "
    "distance) between the class's segment distribution and the "
    "global one. Classes where t_dist > t leak the sensitive "
    "attribute even when k-anonymous / l-diverse. The full "
    "(class x segment) domain comes from a CROSS JOIN of two "
    "AGGREGATE-sized tables (|classes| x 5 rows), so absent segments "
    "contribute their full global mass — corpus-size-independent "
    "output, one shuffle on the QI tuple, the |segments|-row global "
    "distribution broadcast.",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cls = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count("*").alias("n"))
    tot = cls.groupBy("c_nationkey", "bal_band").agg(
        F.sum("n").cast("long").alias("n_cls")
    )
    grand = cls.agg(F.sum("n").cast("double").alias("n_all"))
    glob = (
        cls.groupBy("c_mktsegment")
        .agg(F.sum("n").alias("n_seg"))
        .crossJoin(F.broadcast(grand))
        .select("c_mktsegment", (F.col("n_seg") / F.col("n_all")).alias("p_g"))
    )
    dom = tot.crossJoin(F.broadcast(glob))
    tv = (
        dom.join(cls, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .groupBy("c_nationkey", "bal_band", "n_cls")
        .agg(
            F.round(
                0.5
                * F.sum(
                    F.abs(
                        F.coalesce(F.col("n"), F.lit(0))
                        / F.col("n_cls").cast("double")
                        - F.col("p_g")
                    )
                ),
                6,
            ).alias("t_dist")
        )
    )
    return tv.select(
        "c_nationkey",
        "bal_band",
        "n_cls",
        "t_dist",
        F.when(F.col("t_dist") > 0.2, 1).otherwise(0).cast("long").alias("breach"),
    ).orderBy("c_nationkey", "bal_band")


# ---------------------------------------------------------------------------
# Exact KNN-Shapley data valuation
# ---------------------------------------------------------------------------

_SHAP_K = 3  # the K of the K-NN utility being valued


@register(
    "knn_shapley_valuation",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qy
      FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
    d AS (
      SELECT q.query_id, q.qy, a.vec_id, a.label,
             round(1 - {_cos_sql("a.embedding", "q.qv")}, 6) AS dist
      FROM embeddings a, q WHERE a.vec_id <> q.query_id),
    r AS (
      SELECT query_id, vec_id,
             CASE WHEN label = qy THEN 1 ELSE 0 END AS m,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist, vec_id) AS rnk,
             count(*) OVER (PARTITION BY query_id) AS n
      FROM d),
    t AS (
      SELECT query_id, vec_id, rnk,
             CASE WHEN rnk = n THEN m / CAST(n AS DOUBLE)
                  ELSE (m - lead(m) OVER (PARTITION BY query_id ORDER BY rnk))
                       / {float(_SHAP_K)} * least({_SHAP_K}, rnk) / rnk
             END AS term
      FROM r),
    s AS (
      SELECT query_id, vec_id, rnk,
             sum(term) OVER (PARTITION BY query_id ORDER BY rnk DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sv
      FROM t),
    ranked AS (
      SELECT query_id, vec_id, rnk AS knn_rank, round(sv, 6) AS shapley,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sv DESC, vec_id) AS pos
      FROM s)
    SELECT query_id, vec_id, knn_rank, shapley
    FROM ranked WHERE pos <= 10 ORDER BY query_id, pos
    """,
    doc="EXACT Shapley value of every training embedding for a 3-NN "
    "classifier on 5 held-out query points (Jia et al. VLDB 2019, "
    "Thm 1): sort by distance, then s_(N) = 1[y_(N)=y]/N and "
    "s_(i) = s_(i+1) + (1[y_(i)=y] - 1[y_(i+1)=y])/K * min(K,i)/i — "
    "the whole O(N^K)-naive computation collapses to a rank window "
    "plus ONE suffix-sum window per query; top-10 most valuable "
    "points surfaced per query. Both engines accumulate the suffix "
    "sum in the same frame order, so the doubles agree bitwise. "
    "Scale: query side broadcast (5 rows); one shuffle on query_id; "
    "at corpus scale truncate to the top-M candidates per query first "
    "(values decay as 1/rank beyond K) — the recursion shape is "
    "unchanged.",
)
def knn_shapley_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qy"),
    )
    d = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.when(F.col("label") == F.col("qy"), 1).otherwise(0).alias("m"),
            F.round(
                1 - similarity.cosine(F.col("embedding"), F.col("qv")), 6
            ).alias("dist"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    wp = Window.partitionBy("query_id")
    r = d.select(
        "query_id",
        "vec_id",
        "m",
        F.row_number().over(wr).alias("rnk"),
        F.count("*").over(wp).alias("n"),
    )
    wlead = Window.partitionBy("query_id").orderBy("rnk")
    t = r.select(
        "query_id",
        "vec_id",
        "rnk",
        F.when(
            F.col("rnk") == F.col("n"), F.col("m") / F.col("n").cast("double")
        )
        .otherwise(
            (F.col("m") - F.lead("m").over(wlead))
            / float(_SHAP_K)
            * F.least(F.lit(_SHAP_K), F.col("rnk"))
            / F.col("rnk")
        )
        .alias("term"),
    )
    ws = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = t.select(
        "query_id", "vec_id", "rnk", F.sum("term").over(ws).alias("sv")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sv"), "vec_id")
    return (
        s.select(
            "query_id",
            "vec_id",
            F.col("rnk").alias("knn_rank"),
            F.round("sv", 6).alias("shapley"),
            F.row_number().over(wk).alias("pos"),
        )
        .filter(F.col("pos") <= 10)
        .orderBy("query_id", "pos")
        .drop("pos")
    )


# ---------------------------------------------------------------------------
# Good-Turing smoothing
# ---------------------------------------------------------------------------


@register(
    "good_turing_smoothing",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    cnt AS (SELECT t, count(*) AS r FROM tok WHERE t <> '' GROUP BY t),
    fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cnt GROUP BY r),
    tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tok,
             CAST(COALESCE(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
               AS n1
      FROM fof)
    SELECT f.r, f.n_r,
           round((f.r + 1) * g.n_r / CAST(f.n_r AS DOUBLE), 6) AS r_star,
           round((f.r + 1) * g.n_r / CAST(t.n_tok AS DOUBLE), 6) AS mass_gt,
           round(t.n1 / CAST(t.n_tok AS DOUBLE), 6) AS p_unseen
    FROM fof f
    LEFT JOIN fof g ON g.r = f.r + 1
    CROSS JOIN tot t
    ORDER BY f.r
    """,
    doc="Good-Turing smoothing (Good 1953) of the corpus unigram "
    "counts: frequency-of-frequencies N_r, smoothed count "
    "r* = (r+1)N_{r+1}/N_r, the probability mass Good-Turing moves "
    "to each count class, and the unseen-token mass N_1/N — the "
    "missing-mass estimate the Kneser-Ney and unigram-LM queries "
    "assume. Scale: token explode is a narrow map; two cascaded "
    "count-compressing aggregates (vocab -> |distinct r| ~ dozens of "
    "rows); the r -> r+1 join and the totals run on the "
    "frequency-of-frequency table, which is constant-sized in corpus "
    "and vocabulary.",
)
def good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )
    cnt = tok.groupBy("t").agg(F.count("*").alias("r"))
    fof = cnt.groupBy("r").agg(F.count("*").cast("long").alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tok"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
        .cast("long")
        .alias("n1"),
    )
    nxt = fof.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        fof.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1) * F.col("n_r1") / F.col("n_r").cast("double"), 6
            ).alias("r_star"),
            F.round(
                (F.col("r") + 1) * F.col("n_r1") / F.col("n_tok").cast("double"),
                6,
            ).alias("mass_gt"),
            F.round(F.col("n1") / F.col("n_tok").cast("double"), 6).alias(
                "p_unseen"
            ),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator
# ---------------------------------------------------------------------------

_HILL_K = 200


@register(
    "hill_tail_index",
    f"""
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders),
    kth AS (SELECT o_totalprice AS xk1 FROM ranked WHERE rk = {_HILL_K + 1}),
    top AS (SELECT o_totalprice FROM ranked WHERE rk <= {_HILL_K})
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           round(kth.xk1, 6) AS threshold,
           round(avg(ln(top.o_totalprice / kth.xk1)), 6) AS hill_h,
           round(1.0 / avg(ln(top.o_totalprice / kth.xk1)), 6) AS tail_alpha
    FROM top, kth GROUP BY kth.xk1
    """,
    doc="Hill (1975) tail-index estimator on order totals: "
    "H = mean(ln(x_(i)/x_(k+1))) over the top-k order statistics, "
    "alpha = 1/H — the Pareto exponent the Zipf / revenue- "
    "concentration queries assume, now measured. Scale: the top-(k+1) "
    "set comes from orderBy+limit = TakeOrderedAndProject (per- "
    "partition k-heaps merged at the driver, NO global sort); the "
    "window then ranks 201 rows. Threshold broadcast to the k-row "
    "aggregate.",
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    top = o.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(_HILL_K + 1)
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    r = top.withColumn("rk", F.row_number().over(w))
    kth = r.filter(F.col("rk") == _HILL_K + 1).select(
        F.col("o_totalprice").alias("xk1")
    )
    body = (
        r.filter(F.col("rk") <= _HILL_K)
        .select("o_totalprice")
        .crossJoin(F.broadcast(kth))
        .groupBy("xk1")
        .agg(F.avg(F.log(F.col("o_totalprice") / F.col("xk1"))).alias("h"))
    )
    return body.select(
        F.lit(_HILL_K).cast("long").alias("k"),
        F.round("xk1", 6).alias("threshold"),
        F.round("h", 6).alias("hill_h"),
        F.round(1.0 / F.col("h"), 6).alias("tail_alpha"),
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-first traversal)
# ---------------------------------------------------------------------------

_KC_K = 8


def _kcenter_oracle(k: int) -> str:
    cos = _cos_sql("a.embedding", "c.embedding")
    ctes = [
        "sel0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS step, vec_id, embedding, "
        "CAST(NULL AS DOUBLE) AS radius FROM embeddings WHERE vec_id = 0)"
    ]
    for i in range(1, k):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT a.vec_id, a.embedding, min(round(1 - {cos}, 6)) AS mind
      FROM embeddings a, sel{p} c
      WHERE a.vec_id NOT IN (SELECT vec_id FROM sel{p})
      GROUP BY a.vec_id, a.embedding)"""
        )
        ctes.append(
            f"p{i} AS (SELECT vec_id, embedding, mind FROM d{i} "
            f"ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        ctes.append(
            f"""sel{i} AS MATERIALIZED (
      SELECT step, vec_id, embedding, radius FROM sel{p}
      UNION ALL
      SELECT CAST({i} AS BIGINT), vec_id, embedding, mind FROM p{i})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT step, vec_id, radius FROM sel{k - 1} ORDER BY step"
    )


@register(
    "kcenter_coreset_greedy",
    _kcenter_oracle(_KC_K),
    doc="Greedy k-center coreset / farthest-first traversal (Gonzalez "
    "1985; the selection rule of coreset data pruning, Sener & "
    "Savarese 2018) over the embedding table, cosine distance, k=8, "
    "seeded at vec_id 0: each step picks the point farthest from its "
    "nearest already-chosen center (max-min, ties to the smaller id) "
    "— a 2-approximation of the optimal k-center cover; the radius "
    "column is the cover radius the NEXT center removes, so it is "
    "non-increasing. Scale: k distributed scans; each step is a "
    "narrow map against <= k broadcast literal centers followed by "
    "orderBy+limit 1 = TakeOrderedAndProject (per-partition 1-heaps, "
    "no sort, no shuffle of the data); driver state is k centers. "
    "The oracle replays the same k steps as an unrolled CTE chain.",
)
def kcenter_coreset_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # r13 OPT: cardinality-gated DRIVER replay (the lsh_pairs/pagerank
    # collect class; same gate env). The distributed loop below costs
    # k head() round-trips (11 jobs); below the gate the identical
    # farthest-first recurrence replays on the driver with the exact
    # fold replicas from operators/similarity (sequential dot/norm
    # folds, Spark round(double,6) replica, least-skips-null → nan
    # handling), so every per-step pick compares the SAME doubles.
    # Parity pinned driver-vs-distributed in tests/test_valuation.py;
    # the oracle hash-checks the query end-to-end.
    import os as _os

    driver_max = int(
        _os.environ.get("SPARK_GRAFT_EMB_DRIVER_MAX_VECS", "4096")
    )
    if emb.count() <= driver_max:
        got = similarity._vectors_to_numpy(emb, "vec_id", "embedding")
        if got is not None:
            import numpy as np

            from ..operators.graph import _round_half_up

            ids, mat = got
            ids_list = ids.tolist()
            if 0 in ids_list:
                E = mat.astype(np.float64)
                nr = similarity._np_seq_norms(E)
                ET = np.ascontiguousarray(E.T)

                def dists_to(ci: int) -> "np.ndarray":
                    # exact dist_to replica: round(1 - dot/(na*nc), 6)
                    acc = np.zeros(E.shape[0])
                    crow = ET[:, ci]
                    for d in range(ET.shape[0]):
                        acc = acc + ET[d] * crow[d]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = acc / (nr * nr[ci])
                    one_m = 1.0 - cos
                    out = np.empty(len(one_m))
                    for i, v in enumerate(one_m.tolist()):
                        out[i] = (
                            np.nan if v != v else _round_half_up(v, 6)
                        )
                    return out

                i0 = ids_list.index(0)
                mind = dists_to(i0)
                chosen_idx = {i0}
                rows_d: list = [(0, 0, None)]
                for step in range(1, _KC_K):
                    # pick: max mind desc, vec_id asc, nulls(nan) last
                    best_i = -1
                    best_v = None
                    for i in range(len(ids_list)):
                        if i in chosen_idx:
                            continue
                        v = mind[i]
                        if v != v:  # nan = null → sorts last
                            continue
                        if (
                            best_i < 0
                            or v > best_v
                            or (v == best_v and ids_list[i] < ids_list[best_i])
                        ):
                            best_i, best_v = i, v
                    if best_i < 0:
                        break
                    chosen_idx.add(best_i)
                    rows_d.append((step, int(ids_list[best_i]), float(best_v)))
                    if step < _KC_K - 1:
                        dnew = dists_to(best_i)
                        # least() skips nulls: nan keeps the old value
                        upd = ~np.isnan(dnew) & (
                            np.isnan(mind) | (dnew < mind)
                        )
                        mind = np.where(upd, dnew, mind)
                return spark.createDataFrame(
                    rows_d, "step long, vec_id long, radius double"
                )
    first = emb.filter(F.col("vec_id") == 0).head()
    chosen = [0]
    rows: list[tuple[int, int, float | None]] = [(0, 0, None)]

    def dist_to(center: list[float]):
        return F.round(
            1
            - similarity.cosine(
                F.col("embedding"), F.lit([float(v) for v in center])
            ),
            6,
        )

    # Incremental farthest-first: carry the running min distance per
    # point, so step i evaluates ONE cosine against the newest center
    # (least(mind, d_new)) instead of re-deriving all i distances —
    # k-1 vector evals per row total, not k^2/2, and ONE parquet scan
    # (state persisted per step; rounding before least keeps the
    # per-step values bit-identical to the all-centers form the oracle
    # CTE chain replays). Driver state stays k centers; each step is
    # still a narrow map + TakeOrderedAndProject 1-heap.
    state = emb.select(
        "vec_id",
        "embedding",
        dist_to([float(v) for v in first["embedding"]]).alias("mind"),
    ).persist()
    # r13: the pick's TakeOrderedAndProject scans every partition, so
    # its head() materializes the freshly-persisted state in the same
    # job — fusing what was a separate count() action per step (k-2
    # driver round-trips saved); the parent cache is only released
    # AFTER the child is materialized, same recompute-safety as before
    prev: DataFrame | None = None
    try:
        for step in range(1, _KC_K):
            pick = (
                state.filter(~F.col("vec_id").isin(chosen))
                .orderBy(F.desc("mind"), "vec_id")
                .limit(1)
                .head()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            chosen.append(pick["vec_id"])
            rows.append((step, int(pick["vec_id"]), float(pick["mind"])))
            if step < _KC_K - 1:
                prev = state
                state = state.select(
                    "vec_id",
                    "embedding",
                    F.least(
                        F.col("mind"),
                        dist_to([float(v) for v in pick["embedding"]]),
                    ).alias("mind"),
                ).persist()
    finally:
        if prev is not None:
            prev.unpersist()
        state.unpersist()
    return spark.createDataFrame(rows, "step long, vec_id long, radius double")
