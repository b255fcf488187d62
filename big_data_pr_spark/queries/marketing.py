"""Customer/marketing analytics — RFM segmentation, multi-touch
attribution, cohort lifetime-value — round-6 surface extensions.

Reference capability these generalize: the reference serves per-symbol
recency-windowed aggregates to its dashboard (app.py:113-168 recent-
window queries) and its report frames users/symbols by activity
recency and volume; this module adds the standard customer-analytics
kernels built from exactly those ingredients. All three are
oracle-backed, Python-free, and window/aggregate-only:

- RFM rides ntile windows over the |customers|-sized aggregate;
- multi-touch attribution spreads purchase value onto preceding
  touches entirely with per-(user, epoch) windows — no self-join, no
  range join, one scan;
- the cohort-LTV matrix is two grouped aggregates (first-order cohort,
  then cohort x age).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# ---------------------------------------------------------------------------
# RFM segmentation over orders
# ---------------------------------------------------------------------------


@register(
    "rfm_segmentation",
    """
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS refd FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)), ref.refd)
               AS r_days,
             count(*) AS f_orders,
             sum(o_totalprice) AS m_spend
      FROM orders, ref GROUP BY o_custkey, ref.refd
    ),
    scored AS (
      SELECT o_custkey, r_days, f_orders, m_spend,
             ntile(5) OVER (ORDER BY r_days DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY f_orders, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY m_spend, o_custkey) AS m_score
      FROM rfm
    ),
    seg AS (
      SELECT *,
             CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                  WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                  WHEN r_score >= 4 THEN 'recent'
                  WHEN f_score >= 4 THEN 'frequent_lapsed'
                  WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                  ELSE 'other' END AS segment
      FROM scored
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(r_days), 6) AS avg_recency_days,
           round(avg(f_orders), 6) AS avg_frequency,
           round(avg(m_spend), 2) AS avg_monetary
    FROM seg GROUP BY segment ORDER BY segment
    """,
    doc="RFM customer segmentation: per-customer recency (days since "
    "last order vs the corpus max date), frequency, and monetary "
    "quintiles (ntile with a custkey tie-break -> engine-deterministic "
    "bucketing), mapped to the standard segment grid and summarized "
    "per segment. The ntile windows run over the |customers|-sized "
    "aggregate, not orders; at 100 TB swap ntile for percentile-rank "
    "cutoffs from approx_percentile (same grid, sketch-mergeable).",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    sel = o.select(
        "o_custkey", F.to_date("o_orderdate").alias("od"), "o_totalprice"
    )
    # corpus max date as a broadcast 1-row scalar — NOT a global window
    # over raw orders (an empty partition spec funnels every order row
    # through one WindowExec task; r9 plan-audit guard)
    refd = sel.agg(F.max("od").alias("refd"))
    rfm = (
        sel.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_od"),
            F.count("*").alias("f_orders"),
            F.sum("o_totalprice").alias("m_spend"),
        )
        .crossJoin(F.broadcast(refd))
        .select(
            "o_custkey",
            F.datediff("refd", "last_od").alias("r_days"),
            "f_orders",
            "m_spend",
        )
    )
    scored = rfm.select(
        "*",
        F.ntile(5).over(Window.orderBy(F.desc("r_days"), "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("f_orders", "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("m_spend", "o_custkey")).alias("m_score"),
    )
    seg = scored.withColumn(
        "segment",
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "frequent_lapsed")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("other"),
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("r_days"), 6).alias("avg_recency_days"),
            F.round(F.avg("f_orders"), 6).alias("avg_frequency"),
            F.round(F.avg("m_spend"), 2).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution: linear + position-based credit, window-only
# ---------------------------------------------------------------------------


@register(
    "multi_touch_attribution",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    ep AS (
      SELECT *,
             sum(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS epoch
      FROM ev
    ),
    ep2 AS (
      SELECT user_id, ts, event_id, event_type, is_p,
             coalesce(epoch, 0) AS epoch,
             max(CASE WHEN is_p = 1 THEN value END)
               OVER (PARTITION BY user_id, coalesce(epoch, 0)) AS pvalue
      FROM ep
    ),
    touches AS (
      SELECT event_type, pvalue,
             count(*) OVER (PARTITION BY user_id, epoch) AS n_touch,
             row_number() OVER (PARTITION BY user_id, epoch
                                ORDER BY ts, event_id) AS pos
      FROM ep2 WHERE is_p = 0 AND pvalue IS NOT NULL
    ),
    credit AS (
      SELECT event_type,
             pvalue / n_touch AS c_linear,
             CASE WHEN n_touch = 1 THEN pvalue
                  WHEN n_touch = 2 THEN 0.5 * pvalue
                  WHEN pos = 1 OR pos = n_touch THEN 0.4 * pvalue
                  ELSE 0.2 * pvalue / (n_touch - 2) END AS c_position
      FROM touches
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(c_linear), 2) AS credit_linear,
           round(sum(c_position), 2) AS credit_position
    FROM credit GROUP BY event_type ORDER BY event_type
    """,
    doc="Multi-touch attribution: each purchase's value is credited to "
    "the view/click touches since the previous purchase, under the "
    "linear and the 40/20/40 position-based models. Purchase epochs "
    "come from a preceding-rows cumulative count of purchases per "
    "user; the purchase's value reaches its touches via a "
    "(user, epoch) partition window — no self-join, no range join, "
    "one scan and one user-keyed shuffle. Touches after a user's last "
    "purchase have no purchase in their epoch and stay unattributed. "
    "Companion to attribution_last_touch.",
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ep = base.withColumn(
        "epoch", F.coalesce(F.sum("is_p").over(wprev), F.lit(0))
    )
    wepoch = Window.partitionBy("user_id", "epoch")
    ep2 = ep.withColumn(
        "pvalue",
        F.max(F.when(F.col("is_p") == 1, F.col("value"))).over(wepoch),
    )
    touches = (
        ep2.where((F.col("is_p") == 0) & F.col("pvalue").isNotNull())
        .withColumn("n_touch", F.count("*").over(wepoch))
        .withColumn(
            "pos", F.row_number().over(wepoch.orderBy("ts", "event_id"))
        )
    )
    pv, nt, pos = F.col("pvalue"), F.col("n_touch"), F.col("pos")
    credit = touches.select(
        "event_type",
        (pv / nt).alias("c_linear"),
        F.when(nt == 1, pv)
        .when(nt == 2, 0.5 * pv)
        .when((pos == 1) | (pos == nt), 0.4 * pv)
        .otherwise(0.2 * pv / (nt - 2))
        .alias("c_position"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum("c_linear"), 2).alias("credit_linear"),
            F.round(F.sum("c_position"), 2).alias("credit_position"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Cohort lifetime-value matrix over orders
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_matrix",
    """
    WITH o AS (
      SELECT o_custkey, o_totalprice,
             CAST(date_part('year', o_orderdate) AS BIGINT) AS oy
      FROM orders
    ),
    first AS (
      SELECT o_custkey, min(oy) AS cohort_year FROM o GROUP BY o_custkey
    )
    SELECT f.cohort_year, o.oy - f.cohort_year AS age_years,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
           round(sum(o.o_totalprice), 2) AS revenue,
           round(sum(o.o_totalprice)
                 / count(DISTINCT o.o_custkey), 2) AS revenue_per_active
    FROM o JOIN first f ON f.o_custkey = o.o_custkey
    GROUP BY f.cohort_year, age_years
    ORDER BY f.cohort_year, age_years
    """,
    doc="Cohort lifetime-value matrix: customers grouped by first-order "
    "year, revenue and active-customer counts tracked per cohort age — "
    "the standard LTV triangle. One |customers|-sized first-order "
    "aggregate broadcast back onto orders, then one (cohort, age) "
    "aggregate; integer year arithmetic keeps the matrix "
    "engine-deterministic. Sibling of cohort_retention (events-based).",
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("long").alias("oy"),
    )
    first = o.groupBy("o_custkey").agg(F.min("oy").alias("cohort_year"))
    j = o.join(F.broadcast(first), "o_custkey")
    return (
        j.groupBy(
            "cohort_year", (F.col("oy") - F.col("cohort_year")).alias("age_years")
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(
                F.sum("o_totalprice") / F.count_distinct("o_custkey"), 2
            ).alias("revenue_per_active"),
        )
        .orderBy("cohort_year", "age_years")
    )


# ---------------------------------------------------------------------------
# Data-quality expectation suite over orders (single-pass checks report)
# ---------------------------------------------------------------------------


@register(
    "expectation_suite_audit",
    """
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_key,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_key,
             CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_price,
             CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
                             OR CAST(o_orderdate AS DATE) > DATE '2005-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_date,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
      FROM orders
    ),
    ref AS (
      SELECT CAST(count(*) AS BIGINT) AS orphan
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT c.check_name, c.n_violations, base.n AS n_evaluated,
           c.n_violations = 0 AS passed
    FROM base, ref, LATERAL (VALUES
      ('key_not_null', base.null_key),
      ('key_unique', base.dup_key),
      ('price_positive', base.bad_price),
      ('date_in_range', base.bad_date),
      ('status_in_domain', base.bad_status),
      ('custkey_references_customer', ref.orphan)
    ) AS c(check_name, n_violations)
    ORDER BY c.check_name
    """,
    doc="Expectation-suite audit over orders (the Great-Expectations "
    "check-report shape): not-null + uniqueness + range + domain "
    "checks fold into ONE conditional aggregate over a single scan; "
    "the referential check anti-joins the broadcast customer key set. "
    "The report pivots out as one row per check with violation counts "
    "and a pass flag. Generalizes validate_orders from row-filtering "
    "to suite-reporting; at 100 TB every check still rides the same "
    "single pass.",
)
def expectation_suite_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "null_key"
        ),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "bad_price"
        ),
        F.sum(
            F.when(
                (F.to_date("o_orderdate") < F.lit("1990-01-01"))
                | (F.to_date("o_orderdate") > F.lit("2005-12-31")),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    orphan = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan"))
    )
    checks = base.crossJoin(F.broadcast(orphan)).select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("key_not_null").alias("check_name"),
                    F.col("null_key").alias("n_violations"),
                ),
                F.struct(
                    F.lit("key_unique").alias("check_name"),
                    F.col("dup_key").alias("n_violations"),
                ),
                F.struct(
                    F.lit("price_positive").alias("check_name"),
                    F.col("bad_price").alias("n_violations"),
                ),
                F.struct(
                    F.lit("date_in_range").alias("check_name"),
                    F.col("bad_date").alias("n_violations"),
                ),
                F.struct(
                    F.lit("status_in_domain").alias("check_name"),
                    F.col("bad_status").alias("n_violations"),
                ),
                F.struct(
                    F.lit("custkey_references_customer").alias("check_name"),
                    F.col("orphan").alias("n_violations"),
                ),
            )
        ).alias("c"),
    )
    return checks.select(
        F.col("c.check_name").alias("check_name"),
        F.col("c.n_violations").alias("n_violations"),
        F.col("n").alias("n_evaluated"),
        (F.col("c.n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


# ---------------------------------------------------------------------------
# Order-total reconciliation against line items
# ---------------------------------------------------------------------------


@register(
    "order_total_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS items_total,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN li.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_without_items,
           CAST(sum(CASE WHEN li.l_orderkey IS NOT NULL
                          AND abs(o.o_totalprice - li.items_total) < 0.01
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
           round(avg(CASE WHEN li.l_orderkey IS NOT NULL
                          THEN abs(o.o_totalprice - li.items_total) END), 2)
             AS avg_abs_diff,
           round(max(CASE WHEN li.l_orderkey IS NOT NULL
                          THEN abs(o.o_totalprice - li.items_total) END), 2)
             AS max_abs_diff
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    doc="Cross-table reconciliation audit: does o_totalprice equal the "
    "TPC-H invariant sum(extprice * (1-disc) * (1+tax)) over the "
    "order's line items? Reports per-status reconciliation counts, "
    "orders with no items, and the drift magnitude (the synthetic "
    "fixtures deliberately violate the invariant — the audit "
    "quantifies it). One grouped pass over lineitem, one shuffle join "
    "on orderkey; at 100 TB both sides pre-bucket on orderkey so the "
    "reconciliation is exchange-free.",
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("items_total"),
            F.count("*").alias("n_items"),
        )
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    has = F.col("l_orderkey").isNotNull()
    diff = F.abs(F.col("o_totalprice") - F.col("items_total"))
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(~has, 1).otherwise(0)).alias("n_without_items"),
            F.sum(F.when(has & (diff < 0.01), 1).otherwise(0)).alias(
                "n_reconciled"
            ),
            F.round(F.avg(F.when(has, diff)), 2).alias("avg_abs_diff"),
            F.round(F.max(F.when(has, diff)), 2).alias("max_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Round-6h: Markov removal-effect and exact Shapley attribution
# ---------------------------------------------------------------------------

# Value-iteration depth for the absorption solve. The contraction
# factor per step is the chain's max non-absorbing transition mass
# (< 1 whenever every state leaks to CONV/NULL, which journey chains
# do by construction), so the truncation error is <= gamma^t; at 150
# steps even gamma = 0.9 leaves ~1.4e-7 — below the 1e-6 output
# rounding, i.e. converged for any realistic journey length (the old
# t=20 systematically under-read journeys longer than 20 touches).
# The 6x7 matrix makes 150 driver-side iterations free; the oracle
# replays the SAME bounded recursion so both engines truncate
# identically.
_MK_ITERS = 150
_MK_CHANNELS = ("click", "error", "signup", "view")  # sorted

# Shared journey framing (same epoching as multi_touch_attribution, but
# over ALL four touch channels): an epoch is the run of touches between
# purchases; it converts iff it contains the purchase.
_JOURNEY_SQL = """
    ev AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events
    ),
    ep AS (
      SELECT *, coalesce(sum(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS epoch
      FROM ev
    ),
    j AS (
      SELECT user_id, epoch, max(is_p) AS conv FROM ep GROUP BY user_id, epoch
    )
"""

_MK_TRANS_SQL = f"""
    {_JOURNEY_SQL},
    touches AS (
      SELECT user_id, epoch, ts, event_id, event_type FROM ep WHERE is_p = 0
    ),
    seq AS (
      SELECT user_id, epoch, event_type,
             lead(event_type) OVER (PARTITION BY user_id, epoch
                                    ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id, epoch
                                ORDER BY ts, event_id) AS pos
      FROM touches
    ),
    tr AS (
      SELECT 'START' AS src, event_type AS dst FROM seq WHERE pos = 1
      UNION ALL
      SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL
      UNION ALL
      SELECT seq.event_type,
             CASE WHEN j.conv = 1 THEN 'CONV' ELSE 'NULL' END
      FROM seq JOIN j USING (user_id, epoch) WHERE seq.nxt IS NULL
      UNION ALL
      SELECT 'START', 'CONV'
      FROM j LEFT JOIN (SELECT DISTINCT user_id, epoch FROM touches) t
             USING (user_id, epoch)
      WHERE t.user_id IS NULL AND j.conv = 1
    ),
    counts AS (SELECT src, dst, count(*) AS c FROM tr GROUP BY src, dst),
    probs AS (
      SELECT src, dst,
             c * 1.0 / sum(c) OVER (PARTITION BY src) AS p
      FROM counts
    )
"""


@register(
    "markov_attribution_removal",
    f"""
    WITH RECURSIVE
    {_MK_TRANS_SQL},
    variants AS (
      SELECT * FROM (VALUES ('none'), ('click'), ('error'), ('signup'), ('view'))
        v(removed)
    ),
    states AS MATERIALIZED (
      SELECT v.removed, s.state
      FROM variants v CROSS JOIN
           (VALUES ('START'), ('click'), ('error'), ('signup'), ('view')) s(state)
      WHERE s.state != v.removed
    ),
    e AS MATERIALIZED (
      SELECT v.removed, p.src, p.dst, p.p
      FROM variants v JOIN probs p
        ON p.src != v.removed AND p.dst != v.removed
      WHERE p.dst NOT IN ('CONV', 'NULL')
    ),
    pconv AS MATERIALIZED (
      SELECT v.removed, p.src, p.p AS pconv
      FROM variants v JOIN probs p ON p.src != v.removed
      WHERE p.dst = 'CONV'
    ),
    it AS (
      SELECT removed, state, 0 AS t, CAST(0 AS DOUBLE) AS x FROM states
      UNION ALL
      SELECT st.removed, st.state, it0.t + 1 AS t,
             coalesce(max(pc.pconv), 0)
             + sum(coalesce(e.p, 0) * it0.x) AS x
      FROM it it0
      JOIN states st ON st.removed = it0.removed
      LEFT JOIN e ON e.removed = st.removed AND e.src = st.state
                  AND e.dst = it0.state
      LEFT JOIN pconv pc ON pc.removed = st.removed AND pc.src = st.state
      WHERE it0.t < {_MK_ITERS}
      GROUP BY st.removed, st.state, it0.t
    ),
    conv AS (
      SELECT removed, x FROM it WHERE t = {_MK_ITERS} AND state = 'START'
    ),
    re AS (
      SELECT c.removed AS channel,
             greatest(1 - c.x / b.x, 0) AS removal_effect, b.x AS px
      FROM conv c CROSS JOIN (SELECT x FROM conv WHERE removed = 'none') b
      WHERE c.removed != 'none'
    )
    SELECT channel, round(removal_effect, 6) AS removal_effect,
           round(removal_effect / sum(removal_effect) OVER (), 6)
             AS attribution_share,
           round(px, 6) AS p_conv_full
    FROM re ORDER BY channel
    """,
    doc="First-order Markov-chain attribution with removal effects "
    "(Anderl et al. 2016): user journeys (purchase-delimited epochs) "
    "become START -> touch -> ... -> CONV/NULL transition counts; a "
    "channel's credit is how much the chain's absorption probability "
    "into CONV drops when every path through that channel is cut "
    "(transition probabilities keep their original denominators — the "
    "redirected mass is lost, the standard removal-effect convention), "
    "normalized across channels. Absorption solved by 150 bounded "
    "value-iteration steps (error <= gamma^150 < the 1e-6 output "
    "rounding — effectively exact, see _MK_ITERS). Scale: the "
    "DATA-sized work is the "
    "transition count (two windows + one grouped count, identical "
    "shape to a bigram count); the chain solve runs on the <=6x7 "
    "INTEGER count matrix — collected driver-side in Spark (exact "
    "integers, no float nondeterminism crosses the boundary) and "
    "replayed as a recursive CTE in the oracle.",
)
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ep = ev.withColumn("epoch", F.coalesce(F.sum("is_p").over(wprev), F.lit(0)))
    j = ep.groupBy("user_id", "epoch").agg(F.max("is_p").alias("conv"))
    touches = ep.where(F.col("is_p") == 0)
    wseq = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id")
    seq = touches.select(
        "user_id",
        "epoch",
        "event_type",
        F.lead("event_type").over(wseq).alias("nxt"),
        F.row_number().over(wseq).alias("pos"),
    )
    first = seq.where(F.col("pos") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    mids = seq.where(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    )
    lasts = (
        seq.where(F.col("nxt").isNull())
        .join(j, ["user_id", "epoch"])
        .select(
            F.col("event_type").alias("src"),
            F.when(F.col("conv") == 1, "CONV").otherwise("NULL").alias("dst"),
        )
    )
    direct = (
        j.where(F.col("conv") == 1)
        .join(
            touches.select("user_id", "epoch").distinct(),
            ["user_id", "epoch"],
            "left_anti",
        )
        .select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    )
    counts = (
        first.unionAll(mids)
        .unionAll(lasts)
        .unionAll(direct)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
    )
    # the chain solve: <= 6x7 integer matrix — driver-sized by
    # construction (state space is the channel taxonomy, not the data)
    rows = counts.collect()
    c: dict[tuple[str, str], int] = {(r["src"], r["dst"]): r["c"] for r in rows}
    srcs = sorted({s for s, _ in c})
    out_tot = {s: sum(v for (s2, _), v in c.items() if s2 == s) for s in srcs}

    def absorb(removed: str | None) -> float:
        states = ["START"] + [ch for ch in _MK_CHANNELS if ch != removed]
        x = {s: 0.0 for s in states}
        for _ in range(_MK_ITERS):
            nx = {}
            for s in states:
                tot = out_tot.get(s, 0)
                if tot == 0:
                    nx[s] = 0.0
                    continue
                acc = c.get((s, "CONV"), 0) / tot
                for ch in states:
                    if ch != "START" and (s, ch) in c:
                        acc += c[(s, ch)] / tot * x[ch]
                nx[s] = acc
            x = nx
        return x["START"]

    base = absorb(None)
    effects = {
        ch: max(1 - absorb(ch) / base, 0.0) if base > 0 else 0.0
        for ch in _MK_CHANNELS
    }
    tot_eff = sum(effects.values())
    data = [
        (
            ch,
            round(effects[ch], 6),
            round(effects[ch] / tot_eff, 6) if tot_eff > 0 else None,
            round(base, 6),
        )
        for ch in _MK_CHANNELS
    ]
    return spark.createDataFrame(
        data,
        "channel string, removal_effect double, attribution_share double, "
        "p_conv_full double",
    ).orderBy("channel")


@register(
    "shapley_attribution_sets",
    f"""
    WITH {_JOURNEY_SQL},
    jm AS (
      SELECT user_id, epoch, max(is_p) AS conv,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS mask
      FROM ep GROUP BY user_id, epoch
    ),
    v AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n,
             avg(CAST(conv AS DOUBLE)) AS v
      FROM jm GROUP BY mask
    ),
    vfull AS (
      SELECT s.s, coalesce(v.v, 0) AS v, coalesce(v.n, 0) AS n
      FROM (SELECT unnest(range(0, 16)) AS s) s
      LEFT JOIN v ON v.mask = s.s
    ),
    channels AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4),
                            ('error', 8)) c(channel, bit)
    ),
    terms AS (
      SELECT c.channel, c.bit,
             (CASE bit_count(vf.s) WHEN 0 THEN 0.25 WHEN 1 THEN 1.0/12
                                   WHEN 2 THEN 1.0/12 ELSE 0.25 END)
             * (vw.v - vf.v) AS term
      FROM channels c
      JOIN vfull vf ON (vf.s & c.bit) = 0
      JOIN vfull vw ON vw.s = vf.s + c.bit
    )
    SELECT t.channel, round(sum(t.term), 6) AS shapley_value,
           CAST(nj.n_journeys AS BIGINT) AS n_journeys
    FROM terms t
    JOIN (SELECT c.channel, sum(vf.n) AS n_journeys
          FROM channels c JOIN vfull vf ON (vf.s & c.bit) != 0
          GROUP BY c.channel) nj ON nj.channel = t.channel
    GROUP BY t.channel, nj.n_journeys
    ORDER BY t.channel
    """,
    doc="Exact Shapley-value attribution over channel coalitions "
    "(Shapley 1953 applied to journeys as in Zhao et al. 2018): each "
    "purchase-delimited journey reduces to its SET of touched channels "
    "(4-bit mask); the coalition value v(S) is the empirical "
    "conversion rate of journeys with exactly that set (unobserved "
    "subsets contribute 0), and each channel's credit is the exact "
    "Shapley sum over the 16-subset lattice with closed-form "
    "|S|!(k-|S|-1)!/k! weights. Scale: the DATA-sized work is one "
    "grouped aggregate to a 16-row table (mask build is two windows + "
    "one groupBy, same scan as the Markov chain); the lattice math is "
    "a 4x8-row literal join — CONSTANT, no driver loop, no Python.",
)
def shapley_attribution_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ep = ev.withColumn("epoch", F.coalesce(F.sum("is_p").over(wprev), F.lit(0)))

    def bit(t: str, b: int):
        return b * F.max(F.when(F.col("event_type") == t, 1).otherwise(0))

    jm = ep.groupBy("user_id", "epoch").agg(
        F.max("is_p").alias("conv"),
        (bit("view", 1) + bit("click", 2) + bit("signup", 4) + bit("error", 8))
        .alias("mask"),
    )
    v = jm.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg(F.col("conv").cast("double")).alias("v"),
    )
    vfull = (
        spark.range(16)
        .select(F.col("id").cast("int").alias("s"))
        .join(F.broadcast(v), F.col("s") == F.col("mask"), "left")
        .select(
            "s",
            F.coalesce(F.col("v"), F.lit(0.0)).alias("v"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        "channel string, bit int",
    )
    vf, vw = vfull.alias("vf"), vfull.alias("vw")
    weight = (
        F.when(F.bit_count(F.col("vf.s")) == 0, F.lit(0.25))
        .when(F.bit_count(F.col("vf.s")) == 1, F.lit(1.0) / 12)
        .when(F.bit_count(F.col("vf.s")) == 2, F.lit(1.0) / 12)
        .otherwise(F.lit(0.25))
    )
    terms = (
        channels.join(F.broadcast(vf), F.col("vf.s").bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(vw), F.col("vw.s") == F.col("vf.s") + F.col("bit"))
        .select(
            "channel",
            "bit",
            (weight * (F.col("vw.v") - F.col("vf.v"))).alias("term"),
        )
    )
    nj = (
        channels.join(F.broadcast(vfull), F.col("s").bitwiseAND(F.col("bit")) != 0)
        .groupBy("channel")
        .agg(F.sum("n").cast("bigint").alias("n_journeys"))
    )
    return (
        terms.groupBy("channel")
        .agg(F.round(F.sum("term"), 6).alias("shapley_value"))
        .join(nj, "channel")
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Round-6j: geometric-adstock media-mix regression
# ---------------------------------------------------------------------------

_AD_LAM = 0.6  # geometric carryover decay
_AD_K = 13  # adstock memory (lags 0..13)


def _adstock_terms_sql(col: str) -> str:
    # weights written as repr() doubles and cast explicitly — DuckDB
    # otherwise parses the literals as DECIMAL and the covariance
    # products overflow DECIMAL(38)
    return " + ".join(
        f"CAST({_AD_LAM ** k!r} AS DOUBLE)"
        f" * coalesce(lag({col}, {k}) OVER (ORDER BY day), 0)"
        for k in range(_AD_K + 1)
    )


@register(
    "adstock_mmm_fit",
    f"""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    raw AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS y
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT spine.day, coalesce(raw.v, 0) AS v, coalesce(raw.c, 0) AS c,
             coalesce(raw.y, 0) AS y
      FROM spine LEFT JOIN raw USING (day)
    ),
    ads AS (
      SELECT day, y,
             {_adstock_terms_sql('v')} AS av,
             {_adstock_terms_sql('c')} AS ac
      FROM daily
    ),
    m AS (
      SELECT count(*) AS n, avg(av) AS m1, avg(ac) AS m2, avg(y) AS my,
             avg(av * av) - avg(av) * avg(av) AS s11,
             avg(av * ac) - avg(av) * avg(ac) AS s12,
             avg(ac * ac) - avg(ac) * avg(ac) AS s22,
             avg(av * y) - avg(av) * avg(y) AS s1y,
             avg(ac * y) - avg(ac) * avg(y) AS s2y,
             avg(y * y) - avg(y) * avg(y) AS syy
      FROM ads
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6)
             AS beta_view_adstock,
           round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6)
             AS beta_click_adstock,
           round(my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * m1
                    - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * m2, 4)
             AS intercept,
           round(((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * s1y
                + (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * s2y)
                / syy, 6) AS r2
    FROM m
    """,
    doc="Media-mix regression with geometric adstock (the Broadbent "
    f"carryover model, lambda={_AD_LAM}, {_AD_K + 1}-day memory): "
    "daily view and click volumes transform into adstocked exposure "
    "series (explicit finite lag-weighted sums over a gap-free day "
    "spine, so missing days decay correctly), and daily purchase "
    "revenue regresses on the two exposures via the closed-form "
    "two-variable OLS normal equations — the causal-flavored "
    "complement to attribution: attribution splits observed "
    "conversions, MMM estimates marginal response per exposure unit. "
    "Scale: one grouped aggregate to the |days| table, 28 lag windows "
    "over it (all the same sort), one covariance aggregate — nothing "
    "data-sized after the first groupBy.",
)
def adstock_mmm_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    raw = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0
            )
        ).alias("y"),
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    daily = spine.join(raw, "day", "left").select(
        "day",
        F.coalesce("v", F.lit(0)).alias("v"),
        F.coalesce("c", F.lit(0)).alias("c"),
        F.coalesce("y", F.lit(0.0)).alias("y"),
    )
    w = Window.orderBy("day")

    def adstock(col: str):
        acc = F.lit(0.0)
        for k in range(_AD_K + 1):
            acc = acc + (_AD_LAM**k) * F.coalesce(
                F.lag(col, k).over(w), F.lit(0)
            )
        return acc

    ads = daily.select("y", adstock("v").alias("av"), adstock("c").alias("ac"))

    def cov(a: str, b: str):
        return F.avg(F.col(a) * F.col(b)) - F.avg(a) * F.avg(b)

    m = ads.agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("av").alias("m1"),
        F.avg("ac").alias("m2"),
        F.avg("y").alias("my"),
        cov("av", "av").alias("s11"),
        cov("av", "ac").alias("s12"),
        cov("ac", "ac").alias("s22"),
        cov("av", "y").alias("s1y"),
        cov("ac", "y").alias("s2y"),
        cov("y", "y").alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    return m.select(
        F.col("n").alias("n_days"),
        F.round(b1, 6).alias("beta_view_adstock"),
        F.round(b2, 6).alias("beta_click_adstock"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias(
            "intercept"
        ),
        F.round((b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6).alias(
            "r2"
        ),
    )
