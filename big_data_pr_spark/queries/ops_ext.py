"""Operational-integrity and corpus/vector-hygiene extensions —
round-6 continuation.

Reference capability these generalize: the reference's ops layer
eyeballs duplicate submissions and data health on dashboards
(app.py admin views, report §5); this module adds the quantitative
audits: duplicate-payment candidate pairs (same customer,
near-identical totals — the classic AP fraud screen), the customer
order-priority transition matrix (the Markov view of ordering
behavior, the orders-side cousin of pagerank_event_transitions), the
token coverage curve (what share of the corpus the top-k vocabulary
explains — the tokenizer-budget planning input next to
zipf_token_slope / heaps_law_fit), and an embedding-norm profile (the
vector-hygiene gate in front of the ANN family: zero/degenerate
vectors break cosine math silently).

Scale posture: the duplicate screen joins on the customer key so
quadratic work is bounded by orders-per-customer; the
transition matrix is one keyed window over orders; the coverage curve
runs its rank window over the vocabulary table; the norm profile is a
zero-shuffle narrow map followed by one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register


@register(
    "duplicate_order_pairs",
    """
    SELECT a.o_custkey,
           a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           round(abs(a.o_totalprice - b.o_totalprice), 2) AS price_delta,
           CAST(abs(CAST(a.o_orderdate AS DATE)
                    - CAST(b.o_orderdate AS DATE)) AS BIGINT) AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
    WHERE abs(a.o_totalprice - b.o_totalprice) <= 500
    ORDER BY a.o_custkey, key_a, key_b
    """,
    doc="Duplicate-payment screen: order pairs from the same customer "
    "with near-identical totals (within $500 on ~$150k orders) — the "
    "accounts-payable double-submission audit. The self-join keys on "
    "the customer, so quadratic work is bounded by orders-per-customer "
    "(naturally small and scale-invariant); the amount band is a "
    "residual predicate. At 100 TB with pathological customers, add a "
    "floor(totalprice/1000) band (+neighbor) to the join key — the "
    "bucketized pattern of operators/rangejoin.py.",
)
def duplicate_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", F.to_date("o_orderdate").alias("d")
    )
    a = o.alias("a")
    b = o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(
            F.abs(F.col("a.o_totalprice") - F.col("b.o_totalprice")) <= 500
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            F.round(
                F.abs(F.col("a.o_totalprice") - F.col("b.o_totalprice")), 2
            ).alias("price_delta"),
            F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
            .cast("long")
            .alias("days_apart"),
        )
        .orderBy("o_custkey", "key_a", "key_b")
    )


@register(
    "order_priority_transitions",
    """
    WITH seq AS (
      SELECT lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_p,
             o_orderpriority AS next_p
      FROM orders
    ),
    pairs AS (
      SELECT prev_p, next_p, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_p IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_p, next_p, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev_p), 6) AS p
    FROM pairs ORDER BY prev_p, next_p
    """,
    doc="Customer order-priority transition matrix: for consecutive "
    "orders of the same customer (deterministic (date, key) order), "
    "the empirical Markov transition probability between priority "
    "classes — the orders-side behavioral-sequence view next to "
    "pagerank_event_transitions. One keyed window sort produces the "
    "lag; the matrix is a 5x5 aggregate and the row-normalization "
    "window rides that 25-row table.",
)
def order_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.lag("o_orderpriority").over(w).alias("prev_p"),
        F.col("o_orderpriority").alias("next_p"),
    ).where(F.col("prev_p").isNotNull())
    pairs = seq.groupBy("prev_p", "next_p").agg(
        F.count("*").cast("long").alias("n")
    )
    return pairs.select(
        "prev_p",
        "next_p",
        "n",
        F.round(
            F.col("n") * 1.0
            / F.sum("n").over(Window.partitionBy("prev_p")),
            6,
        ).alias("p"),
    ).orderBy("prev_p", "next_p")


_COVERAGE_KS = [5, 10, 20, 30]


@register(
    "token_coverage_curve",
    f"""
    WITH tok AS (
      SELECT t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY token),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r,
             sum(f) OVER () AS total,
             count(*) OVER () AS vocab
      FROM freq
    ),
    cum AS (
      SELECT r, total, vocab,
             sum(f) OVER (ORDER BY r) AS cum_f
      FROM ranked
    )
    SELECT CAST(r AS BIGINT) AS k,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(total AS BIGINT) AS total_tokens,
           round(cum_f * 1.0 / total, 6) AS coverage
    FROM cum WHERE r IN ({", ".join(str(k) for k in _COVERAGE_KS)})
    ORDER BY k
    """,
    doc="Token coverage curve: the share of total corpus token mass "
    "explained by the top-k vocabulary at k in {5,10,20,30} — "
    "the tokenizer-budget planning number (how big must the vocab be "
    "for X% coverage) that Zipf's slope implies and this measures "
    "directly; k capped at the synthetic corpus's 31-token vocabulary. Count-desc/token-asc ranking makes the curve engine-"
    "deterministic under frequency ties. Token counting is one "
    "map-side-partial aggregate; the rank and prefix windows run over "
    "the vocabulary table only.",
)
def token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count("*").cast("long").alias("f"))
    wall = Window.partitionBy()
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("token")))
        .alias("r"),
        F.sum("f").over(wall).alias("total"),
        F.count("*").over(wall).alias("vocab"),
    )
    wcum = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "r", "total", "vocab", F.sum("f").over(wcum).alias("cum_f")
    )
    return (
        cum.where(F.col("r").isin(_COVERAGE_KS))
        .select(
            F.col("r").cast("long").alias("k"),
            F.col("vocab").cast("long").alias("vocab_size"),
            F.col("total").cast("long").alias("total_tokens"),
            F.round(F.col("cum_f") * 1.0 / F.col("total"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


@register(
    "embedding_norm_profile",
    """
    WITH norms AS (
      SELECT round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm,
           round(avg(nrm), 6) AS mean_norm,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY nrm), 6)
             AS p50_norm,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY nrm), 6)
             AS p95_norm,
           CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate,
           CAST(sum(CASE WHEN abs(nrm - 1.0) <= 0.01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unit
    FROM norms
    """,
    doc="Embedding-norm hygiene profile: L2-norm distribution plus "
    "degenerate (near-zero — cosine undefined, silently breaks ANN) "
    "and unit-normalized counts — the pre-flight gate in front of the "
    "knn/ann/pq family. Norms round at 6 before the percentile so the "
    "order statistics are float-accumulation-order stable across "
    "engines. Zero-shuffle narrow map over the vectors, then one "
    "aggregate; at 100 TB swap percentile for approx_percentile "
    "partials.",
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    norms = emb.select(
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ).alias("nrm")
    )
    return norms.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.percentile("nrm", 0.5), 6).alias("p50_norm"),
        F.round(F.percentile("nrm", 0.95), 6).alias("p95_norm"),
        F.sum(F.when(F.col("nrm") < 1e-6, 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate"),
        F.sum(F.when(F.abs(F.col("nrm") - 1.0) <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_unit"),
    )


@register(
    "join_size_profile",
    """
    WITH pk AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(sum(n * n) AS BIGINT) AS selfjoin_rows,
           CAST(max(n) AS BIGINT) AS max_key_fanout,
           round(max(n) / (sum(n) * 1.0 / count(*)), 6) AS skew_ratio,
           round(sum(n * n) * 1.0 / sum(n), 6) AS avg_output_per_row
    FROM pk
    """,
    doc="Join-size and skew profile for the partkey self-join that "
    "underlies the co-supply graph family: exact output cardinality "
    "sum(n_k^2), the hottest key's fanout, and the skew ratio "
    "(max/mean) — computed from per-key counts WITHOUT running the "
    "join, which is how a planner decides between plain shuffle, "
    "salting (operators/skew.py), and AQE skew splitting before "
    "spending the shuffle. One grouped aggregate; the profile is the "
    "pre-flight for every self-join query in the registry.",
)
def join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pk = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )
    return pk.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("selfjoin_rows"),
        F.max("n").cast("long").alias("max_key_fanout"),
        F.round(
            F.max("n") / (F.sum("n") * 1.0 / F.count("*")), 6
        ).alias("skew_ratio"),
        F.round(
            F.sum(F.col("n") * F.col("n")) * 1.0 / F.sum("n"), 6
        ).alias("avg_output_per_row"),
    )


_RANGE_PARTS = 8


@register(
    "range_partition_boundaries",
    f"""
    WITH q AS (
      SELECT {", ".join(
        f"percentile_cont({i}.0 / {_RANGE_PARTS}) WITHIN GROUP "
        f"(ORDER BY o_totalprice) AS b{i}"
        for i in range(1, _RANGE_PARTS)
      )}
      FROM orders
    )
    SELECT idx, round(boundary, 6) AS boundary
    FROM q, LATERAL (VALUES {", ".join(
        f"({i}, b{i})" for i in range(1, _RANGE_PARTS)
    )}) AS t(idx, boundary)
    ORDER BY idx
    """,
    doc=f"Range-partition planner: the {_RANGE_PARTS - 1} interior "
    "boundaries that split orders into equal-row o_totalprice ranges — "
    "what repartitionByRange / range-clustered compaction "
    "(storage.compact sort_cols) computes internally via sampling, "
    "here exact. Emitting the boundaries as a table makes the layout "
    "decision itself testable and hash-gated. One grouped percentile "
    "aggregate; at 100 TB swap percentile for approx_percentile "
    "partials (same boundaries within sketch tolerance).",
)
def range_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    fracs = [i / _RANGE_PARTS for i in range(1, _RANGE_PARTS)]
    q = orders.agg(
        F.percentile("o_totalprice", fracs).alias("bs")
    )
    return (
        q.select(F.posexplode("bs").alias("pos", "boundary"))
        .select(
            (F.col("pos") + 1).cast("int").alias("idx"),
            F.round("boundary", 6).alias("boundary"),
        )
        .orderBy("idx")
    )


@register(
    "fk_containment_profile",
    """
    SELECT 'orders.o_custkey->customer.c_custkey' AS fk,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_child_keys,
           CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
                                    THEN o_custkey END) AS BIGINT)
             AS n_orphan_keys,
           round(1.0 - count(DISTINCT CASE WHEN c_custkey IS NULL
                                           THEN o_custkey END)
                 * 1.0 / count(DISTINCT o_custkey), 6) AS containment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders.o_orderkey',
           CAST(count(DISTINCT l_orderkey) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN o_orderkey IS NULL
                                    THEN l_orderkey END) AS BIGINT),
           round(1.0 - count(DISTINCT CASE WHEN o_orderkey IS NULL
                                           THEN l_orderkey END)
                 * 1.0 / count(DISTINCT l_orderkey), 6)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part.p_partkey',
           CAST(count(DISTINCT l_partkey) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN p_partkey IS NULL
                                    THEN l_partkey END) AS BIGINT),
           round(1.0 - count(DISTINCT CASE WHEN p_partkey IS NULL
                                           THEN l_partkey END)
                 * 1.0 / count(DISTINCT l_partkey), 6)
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
           CAST(count(DISTINCT l_suppkey) AS BIGINT),
           CAST(count(DISTINCT CASE WHEN s_suppkey IS NULL
                                    THEN l_suppkey END) AS BIGINT),
           round(1.0 - count(DISTINCT CASE WHEN s_suppkey IS NULL
                                           THEN l_suppkey END)
                 * 1.0 / count(DISTINCT l_suppkey), 6)
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY fk
    """,
    doc="Foreign-key containment profile across the warehouse's four "
    "declared relationships: distinct child keys, orphaned keys "
    "(no parent row), and the containment fraction — the referential-"
    "integrity scorecard that decides whether a join can assume "
    "FK semantics (safe to broadcast-inner) or needs orphan handling "
    "(the synthetic fixtures DO carry orphans, which "
    "expectation_suite_audit flags row-level; this profiles them "
    "key-level). Each branch is a left join on the key with "
    "distinct-count aggregates; parents broadcast.",
)
def fk_containment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def branch(child, ckey, parent, pkey, label):
        c = load(spark, sf_dir, child).select(F.col(ckey))
        p = load(spark, sf_dir, parent).select(F.col(pkey))
        j = c.join(F.broadcast(p), c[ckey] == p[pkey], "left")
        orphans = F.countDistinct(
            F.when(F.col(pkey).isNull(), F.col(ckey))
        )
        return j.agg(
            F.lit(label).alias("fk"),
            F.countDistinct(ckey).cast("long").alias("n_child_keys"),
            orphans.cast("long").alias("n_orphan_keys"),
            F.round(
                1.0 - orphans * 1.0 / F.countDistinct(ckey), 6
            ).alias("containment"),
        )

    out = (
        branch("orders", "o_custkey", "customer", "c_custkey",
               "orders.o_custkey->customer.c_custkey")
        .unionByName(
            branch("lineitem", "l_orderkey", "orders", "o_orderkey",
                   "lineitem.l_orderkey->orders.o_orderkey")
        )
        .unionByName(
            branch("lineitem", "l_partkey", "part", "p_partkey",
                   "lineitem.l_partkey->part.p_partkey")
        )
        .unionByName(
            branch("lineitem", "l_suppkey", "supplier", "s_suppkey",
                   "lineitem.l_suppkey->supplier.s_suppkey")
        )
    )
    return out.orderBy("fk")


from .registry import REGISTRY as _REGISTRY  # noqa: E402  (composed oracle)


@register(
    "lang_id_confusion",
    f"""
    WITH pred AS ({_REGISTRY["lang_id"].oracle}),
    m AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT lang, pred_lang, n,
           round(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END) OVER ()
                 * 1.0 / sum(n) OVER (), 6) AS overall_accuracy
    FROM m ORDER BY lang, pred_lang
    """,
    doc="Confusion matrix of the heuristic language identifier against "
    "the corpus's labeled lang column, plus overall accuracy — the "
    "quality evaluation the lang_id gate itself needs before it is "
    "trusted to route documents (mislabeling = silently dropping a "
    "language from the training mix). Composes the registered lang_id "
    "oracle verbatim as a CTE, so classifier and evaluation can never "
    "drift apart; the matrix is a 25-cell aggregate with the accuracy "
    "riding it as a global window.",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = _REGISTRY["lang_id"].fn(spark, sf_dir)
    m = pred.groupBy("lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n")
    )
    wall = Window.partitionBy()
    return m.select(
        "lang",
        "pred_lang",
        "n",
        F.round(
            F.sum(
                F.when(F.col("lang") == F.col("pred_lang"), F.col("n")).otherwise(0)
            ).over(wall)
            * 1.0
            / F.sum("n").over(wall),
            6,
        ).alias("overall_accuracy"),
    ).orderBy("lang", "pred_lang")


@register(
    "process_capability_ship_latency",
    """
    WITH lat AS (
      SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT) AS t
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(t * 1.0) AS mu, stddev_samp(t * 1.0) AS sigma,
             CAST(sum(CASE WHEN t < 1 OR t > 120 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_out
      FROM lat
    )
    SELECT n, round(mu, 6) AS mean_latency, round(sigma, 6) AS sd_latency,
           round((120 - 1) / (6 * sigma), 6) AS cp,
           round(least((120 - mu) / (3 * sigma),
                       (mu - 1) / (3 * sigma)), 6) AS cpk,
           n_out AS n_outside_spec,
           round(n_out * 1.0 / n, 6) AS outside_rate
    FROM s
    """,
    doc="Process-capability indices for order-to-ship latency against "
    "the [1, 120]-day spec window: Cp (spec width over 6 sigma — what "
    "the process COULD hold if centered) and Cpk (the one-sided "
    "worst case — what it actually holds), plus the observed "
    "out-of-spec rate. Cpk >= 1.33 is the conventional capable "
    "threshold; the SPC view of ship_latency_percentiles. One "
    "fact-fact join reduced to a single-row moment aggregate.",
)
def process_capability_ship_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("t")
    )
    lo, hi = 1, 120
    s = lat.agg(
        F.count("*").cast("long").alias("n"),
        F.avg(F.col("t") * 1.0).alias("mu"),
        F.stddev_samp(F.col("t") * 1.0).alias("sigma"),
        F.sum(F.when((F.col("t") < lo) | (F.col("t") > hi), 1).otherwise(0))
        .cast("long")
        .alias("n_out"),
    )
    mu, sigma = F.col("mu"), F.col("sigma")
    return s.select(
        "n",
        F.round(mu, 6).alias("mean_latency"),
        F.round(sigma, 6).alias("sd_latency"),
        F.round((hi - lo) / (6 * sigma), 6).alias("cp"),
        F.round(
            F.least((hi - mu) / (3 * sigma), (mu - lo) / (3 * sigma)), 6
        ).alias("cpk"),
        F.col("n_out").alias("n_outside_spec"),
        F.round(F.col("n_out") * 1.0 / F.col("n"), 6).alias("outside_rate"),
    )


@register(
    "xbar_control_chart_weekly",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    wk AS (
      SELECT CAST(floor(CAST(day - DATE '1970-01-01' AS BIGINT) / 7.0)
                  AS BIGINT) AS week,
             CAST(count(*) AS BIGINT) AS n_days,
             avg(rev) AS xbar
      FROM daily GROUP BY 1
    ),
    lim AS (
      SELECT week, n_days, xbar,
             avg(xbar) OVER () AS grand_mean,
             stddev_samp(xbar) OVER () AS s_between
      FROM wk
    )
    SELECT week, n_days, round(xbar, 6) AS xbar,
           round(grand_mean, 6) AS center,
           round(grand_mean - 3 * s_between, 6) AS lcl,
           round(grand_mean + 3 * s_between, 6) AS ucl,
           xbar < grand_mean - 3 * s_between
             OR xbar > grand_mean + 3 * s_between AS out_of_control
    FROM lim ORDER BY week
    """,
    doc="X-bar control chart of weekly mean daily revenue: 3-sigma "
    "control limits from the between-week dispersion (grand mean and "
    "limits ride the |weeks| table as global windows), each week "
    "flagged in or out of control — the Shewhart monitoring view that "
    "separates common-cause noise from assignable shifts, next to the "
    "CUSUM/Pettitt changepoint detectors. Week index is "
    "days-since-epoch div 7 (engine-stable). One orders scan -> "
    "|days| -> |weeks|; no join.",
)
def xbar_control_chart_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wk = daily.groupBy(
        F.floor(
            F.datediff("day", F.lit("1970-01-01")) / 7.0
        )
        .cast("long")
        .alias("week")
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        F.avg("rev").alias("xbar"),
    )
    wall = Window.partitionBy()
    lim = wk.select(
        "week",
        "n_days",
        "xbar",
        F.avg("xbar").over(wall).alias("grand_mean"),
        F.stddev_samp("xbar").over(wall).alias("s_between"),
    )
    lcl = F.col("grand_mean") - 3 * F.col("s_between")
    ucl = F.col("grand_mean") + 3 * F.col("s_between")
    return lim.select(
        "week",
        "n_days",
        F.round("xbar", 6).alias("xbar"),
        F.round("grand_mean", 6).alias("center"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        ((F.col("xbar") < lcl) | (F.col("xbar") > ucl)).alias(
            "out_of_control"
        ),
    ).orderBy("week")


@register(
    "token_burstiness_top",
    """
    WITH tok AS (
      SELECT doc_id, t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    stats AS (
      SELECT token,
             CAST(count(*) AS BIGINT) AS cf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY token
    )
    SELECT token, cf, df,
           round(cf * 1.0 / df, 6) AS burstiness
    FROM stats WHERE df >= 5
    ORDER BY burstiness DESC, token LIMIT 20
    """,
    doc="Church-Gale token burstiness: collection frequency over "
    "document frequency — a token that appears many times in few "
    "documents (bursty) behaves like content/boilerplate; one spread "
    "evenly behaves like function words. The per-token view that "
    "complements doc-level repetition_ratio and corpus-level "
    "zipf/heaps. One token explode -> vocabulary-sized (cf, df) "
    "aggregate -> heap top-20 with a deterministic tiebreak.",
)
def token_burstiness_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    stats = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        stats.where(F.col("df") >= 5)
        .select(
            "token",
            "cf",
            "df",
            F.round(F.col("cf") * 1.0 / F.col("df"), 6).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), "token")
        .limit(20)
    )


@register(
    "interarrival_profile",
    """
    WITH seq AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             )) / 1000000.0 AS gap
      FROM events
    ),
    g AS (SELECT event_type, gap FROM seq WHERE gap IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap), 6) AS mean_gap_s,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap), 6)
             AS median_gap_s,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY gap), 6)
             AS p95_gap_s,
           round(stddev_samp(gap) / avg(gap), 6) AS cv
    FROM g GROUP BY event_type ORDER BY event_type
    """,
    doc="Per-type inter-arrival profile of user event streams: mean / "
    "median / p95 gap seconds and the coefficient of variation — "
    "CV near 1 is Poisson-like arrivals, CV >> 1 is bursty sessions "
    "(the per-gap view behind burstiness_fano_per_user's count-based "
    "Fano factor), and the p95 gap is the session-timeout input for "
    "sessionize_events. One keyed lag window over the deterministic "
    "(ts, event_id) order, then a |types|-group aggregate.",
)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_micros

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_micros(F.col("ts"))
    seq = ev.select(
        "event_type",
        ((us - F.lag(us).over(w)) / 1000000.0).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.avg("gap"), 6).alias("mean_gap_s"),
            F.round(F.percentile("gap", 0.5), 6).alias("median_gap_s"),
            F.round(F.percentile("gap", 0.95), 6).alias("p95_gap_s"),
            F.round(F.stddev_samp("gap") / F.avg("gap"), 6).alias("cv"),
        )
        .orderBy("event_type")
    )


@register(
    "weekday_hour_heatmap",
    """
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7 AS dow,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY dow, hr
    """,
    doc="Weekday x hour traffic heatmap: event counts and value totals "
    "over the 7x24 grid — the load-shape input for capacity planning "
    "and the 2-D refinement of seasonal_hourly_factors. Weekday is "
    "days-since-epoch mod 7 (engine-stable); one grouped aggregate, "
    "168-row output.",
)
def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
            .cast("long")
            .alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("dow", "hr")
    )


@register(
    "embedding_anisotropy_probe",
    """
    WITH nrm AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             embedding
      FROM embeddings
    ),
    dims AS (
      SELECT u.i AS dim, sum(CAST(nrm.embedding[u.i] AS DOUBLE) / nrm.nrm)
               AS s
      FROM nrm, unnest(range(1, len(nrm.embedding) + 1)) AS u(i)
      WHERE nrm.nrm > 0
      GROUP BY u.i
    ),
    tot AS (
      SELECT sum(s * s) AS s2,
             (SELECT CAST(count(*) AS BIGINT) FROM nrm WHERE nrm > 0) AS n
      FROM dims
    )
    SELECT n AS n_vectors,
           round((s2 - n) / (n * 1.0 * (n - 1)), 6) AS mean_pairwise_cosine
    FROM tot
    """,
    doc="Embedding-space anisotropy probe: the mean cosine over ALL "
    "vector pairs via the sum-vector identity "
    "(||sum of unit vectors||^2 - n) / (n(n-1)) — no pair join, one "
    "per-dimension aggregate over the posexploded components. A mean "
    "pairwise cosine far above 0 means the space collapses into a "
    "narrow cone (anisotropy), which compresses cosine-score ranges "
    "and degrades every retrieval operator in the ANN family — the "
    "representation-health gate next to embedding_norm_profile's "
    "magnitude checks. O(n d) work, d-sized shuffle.",
)
def embedding_anisotropy_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    nrm = emb.select(
        "embedding",
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )
        ).alias("nrm"),
    ).where(F.col("nrm") > 0)
    dims = (
        nrm.select(
            F.posexplode("embedding").alias("dim", "x"), F.col("nrm")
        )
        .groupBy("dim")
        .agg(F.sum(F.col("x").cast("double") / F.col("nrm")).alias("s"))
    )
    n_vec = nrm.count()
    tot = dims.agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    return tot.select(
        F.lit(n_vec).cast("long").alias("n_vectors"),
        F.round(
            (F.col("s2") - n_vec) / (n_vec * 1.0 * (n_vec - 1)), 6
        ).alias("mean_pairwise_cosine"),
    )
