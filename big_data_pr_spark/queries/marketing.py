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
    wall = Window.partitionBy()
    rfm = (
        o.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("od"),
            "o_totalprice",
        )
        .withColumn("refd", F.max("od").over(wall))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("refd"), F.max("od")).alias("r_days"),
            F.count("*").alias("f_orders"),
            F.sum("o_totalprice").alias("m_spend"),
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
