"""Risk metrics, effect sizes, sequential testing, and release-audit
extensions — round-6 continuation surface.

Reference capability these generalize: the reference's analytics layer
reports daily revenue aggregates and trend/volatility indicators over
them (batch_processor.py steps 7-9, report §8's "risk" commentary);
this module adds the standard risk-adjusted-return panel over the same
daily revenue series (Sharpe / Sortino / Calmar, historical VaR/CVaR,
Jarque-Bera normality), the effect-size panel that should accompany any
of the repo's two-sample tests (Cohen's d / Hedges' g / Cliff's delta),
a Wald SPRT sequential monitor over the daily purchase rate (the
streaming-decision cousin of the batch tests), an l-diversity audit
extending the k-anonymity release gate, and a robust-scaling feature
profile (median/IQR, the outlier-safe cousin of z-scoring).

Scale posture: every query aggregates to a |days|-, |cells|- or
|distinct-values|-sized table FIRST, then runs its ordered windows over
that compressed domain — the raw-row scan is a single pass of
conditional aggregates. At 100 TB the daily/cell tables are still tiny;
the single-partition ordered windows never see raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register, roundz

# Shared daily-revenue CTE: |days|-sized, one scan of orders.
_DAILY_REV = """
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
"""

_RET = f"""
    daily AS ({_DAILY_REV}),
    r AS (
      SELECT day,
             ln(rev) - ln(lag(rev) OVER (ORDER BY day)) AS r
      FROM daily
    )
"""


def _daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, r) daily log-returns of total order revenue; first day NULL."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wday = Window.orderBy("day")
    return daily.select(
        "day", (F.log("rev") - F.log(F.lag("rev").over(wday))).alias("r")
    )


@register(
    "sharpe_sortino_calmar",
    f"""
    WITH {_RET},
    c AS (
      SELECT day, r,
             sum(coalesce(r, 0.0)) OVER (ORDER BY day) AS cum
      FROM r
    ),
    dd AS (
      SELECT r,
             max(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - cum AS ddown
      FROM c
    )
    SELECT CAST(count(r) AS BIGINT) AS n_days,
           round(avg(r), 6) + 0.0 AS mean_ret,
           round(stddev_samp(r), 6) + 0.0 AS sd_ret,
           round(avg(r) / stddev_samp(r), 6) + 0.0 AS sharpe,
           round(avg(r) / sqrt(avg(CASE WHEN r < 0 THEN r * r
                                        WHEN r IS NULL THEN NULL
                                        ELSE 0.0 END)), 6) + 0.0 AS sortino,
           round(max(ddown), 6) + 0.0 AS max_drawdown_log,
           round(avg(r) / max(ddown), 6) + 0.0 AS calmar
    FROM dd
    """,
    doc="Risk-adjusted-return panel over daily revenue log-returns: "
    "Sharpe (mean/sd), Sortino (mean/downside deviation, full-sample "
    "denominator), and Calmar (mean/max log drawdown). One orders scan "
    "-> |days| table; lag + running-sum + running-max windows ride the "
    "compressed daily domain; final single-row aggregate. Rounded "
    "outputs sign-normalized (roundz): calmar legitimately rounds to "
    "zero from below (r10 driver-red: DuckDB -0.0 vs Spark +0.0). "
    "Reference: batch_processor.py daily revenue rollup, report §8.",
)
def sharpe_sortino_calmar(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _daily_returns(spark, sf_dir)
    wday = Window.orderBy("day")
    run = wday.rowsBetween(Window.unboundedPreceding, 0)
    c = r.select(
        "day", "r", F.sum(F.coalesce("r", F.lit(0.0))).over(run).alias("cum")
    )
    dd = c.select("r", (F.max("cum").over(run) - F.col("cum")).alias("ddown"))
    downside = F.when(F.col("r") < 0, F.col("r") * F.col("r")).when(
        F.col("r").isNull(), F.lit(None)
    ).otherwise(F.lit(0.0))
    return dd.agg(
        F.count("r").cast("long").alias("n_days"),
        roundz(F.avg("r")).alias("mean_ret"),
        roundz(F.stddev_samp("r")).alias("sd_ret"),
        roundz(F.avg("r") / F.stddev_samp("r")).alias("sharpe"),
        roundz(F.avg("r") / F.sqrt(F.avg(downside))).alias("sortino"),
        roundz(F.max("ddown")).alias("max_drawdown_log"),
        roundz(F.avg("r") / F.max("ddown")).alias("calmar"),
    )


@register(
    "var_cvar_historical",
    f"""
    WITH {_RET},
    nn AS (SELECT r FROM r WHERE r IS NOT NULL),
    rk AS (
      SELECT r,
             row_number() OVER (ORDER BY r) AS rn,
             count(*) OVER () AS n
      FROM nn
    ),
    tail AS (
      SELECT r, n, CAST(ceil(0.05 * n) AS BIGINT) AS k FROM rk
      WHERE rn <= CAST(ceil(0.05 * n) AS BIGINT)
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           CAST(max(k) AS BIGINT) AS n_tail,
           round(-max(r), 6) AS var_95,
           round(-avg(r), 6) AS cvar_95
    FROM tail
    """,
    doc="Historical-simulation 95% VaR and CVaR (expected shortfall) of "
    "daily revenue log-returns: VaR = k-th worst return with "
    "k = ceil(0.05 n) (historical-simulation convention), CVaR = mean of "
    "the k worst. One ordered window over the |days| table; no "
    "percentile-as-window needed, so the same algebra runs on any SQL "
    "engine. Reference: report §8 downside commentary.",
)
def var_cvar_historical(spark: SparkSession, sf_dir: str) -> DataFrame:
    nn = _daily_returns(spark, sf_dir).where(F.col("r").isNotNull())
    rk = nn.select(
        "r",
        F.row_number().over(Window.orderBy("r")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    k = F.ceil(0.05 * F.col("n")).cast("long")
    tail = rk.where(F.col("rn") <= k).select("r", "n", k.alias("k"))
    return tail.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("k").cast("long").alias("n_tail"),
        F.round(-F.max("r"), 6).alias("var_95"),
        F.round(-F.avg("r"), 6).alias("cvar_95"),
    )


@register(
    "jarque_bera_returns",
    f"""
    WITH {_RET},
    m AS (
      SELECT CAST(count(r) AS BIGINT) AS n,
             avg(r) AS m1, avg(r * r) AS m2,
             avg(r * r * r) AS m3, avg(r * r * r * r) AS m4
      FROM r
    ),
    c AS (
      SELECT n,
             m2 - m1 * m1 AS c2,
             m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS c3,
             m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1 AS c4
      FROM m
    )
    SELECT n AS n_days,
           round(c3 / pow(c2, 1.5), 6) AS skewness,
           round(c4 / (c2 * c2), 6) AS kurtosis,
           round(n / 6.0 * (pow(c3 / pow(c2, 1.5), 2)
                 + pow(c4 / (c2 * c2) - 3.0, 2) / 4.0), 6) AS jb_stat,
           round(exp(-(n / 6.0 * (pow(c3 / pow(c2, 1.5), 2)
                 + pow(c4 / (c2 * c2) - 3.0, 2) / 4.0)) / 2.0), 6) AS p_value
    FROM c
    """,
    doc="Jarque-Bera normality test on daily revenue log-returns: "
    "population skewness/kurtosis from raw moments (single conditional "
    "aggregate, exact central-moment expansion so both engines share the "
    "algebra), JB = n/6 (S^2 + (K-3)^2/4), p from the chi-square(2) "
    "survival function exp(-JB/2). Reference: report §8 distribution "
    "commentary.",
)
def jarque_bera_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _daily_returns(spark, sf_dir)
    m = r.agg(
        F.count("r").cast("long").alias("n"),
        F.avg("r").alias("m1"),
        F.avg(F.col("r") * F.col("r")).alias("m2"),
        F.avg(F.col("r") * F.col("r") * F.col("r")).alias("m3"),
        F.avg(F.col("r") * F.col("r") * F.col("r") * F.col("r")).alias("m4"),
    )
    c2 = F.col("m2") - F.col("m1") * F.col("m1")
    c3 = (
        F.col("m3")
        - 3 * F.col("m1") * F.col("m2")
        + 2 * F.col("m1") * F.col("m1") * F.col("m1")
    )
    c4 = (
        F.col("m4")
        - 4 * F.col("m1") * F.col("m3")
        + 6 * F.col("m1") * F.col("m1") * F.col("m2")
        - 3 * F.col("m1") * F.col("m1") * F.col("m1") * F.col("m1")
    )
    skew = c3 / F.pow(c2, 1.5)
    kurt = c4 / (c2 * c2)
    jb = F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(kurt - 3.0, 2) / 4.0)
    return m.select(
        F.col("n").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        F.round(F.exp(-jb / 2.0), 6).alias("p_value"),
    )


@register(
    "effect_sizes_purchase_view",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per AS (
      SELECT value AS v, sum(is_a) AS ca, sum(1 - is_a) AS cb
      FROM ab GROUP BY value
    ),
    rk AS (
      SELECT v, ca, cb,
             sum(ca + cb) OVER (ORDER BY v) - (ca + cb)
               + (ca + cb + 1) / 2.0 AS avg_rank
      FROM per
    ),
    s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             sum(ca * v) AS sa1, sum(ca * v * v) AS sa2,
             sum(cb * v) AS sb1, sum(cb * v * v) AS sb2,
             sum(ca * avg_rank) AS ra
      FROM rk
    ),
    e AS (
      SELECT na, nb,
             sa1 / na AS ma, sb1 / nb AS mb,
             (sa2 - sa1 * sa1 / na) / (na - 1) AS va,
             (sb2 - sb1 * sb1 / nb) / (nb - 1) AS vb,
             ra - na * (na + 1) / 2.0 AS u1
      FROM s
    )
    SELECT na AS n_a, nb AS n_b,
           round(ma - mb, 6) AS mean_diff,
           round((ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb)
                                  / (na + nb - 2)), 6) AS cohen_d,
           round((ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb)
                                  / (na + nb - 2))
                 * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) AS hedges_g,
           round(2.0 * u1 / (na * 1.0 * nb) - 1.0, 6) AS cliffs_delta
    FROM e
    """,
    doc="Effect-size panel for purchase-vs-view values: Cohen's d "
    "(pooled-sd standardized mean difference), Hedges' g (small-sample "
    "correction), and Cliff's delta = 2U/(n_a n_b) - 1 derived from the "
    "Mann-Whitney U via midranks — the nonparametric dominance measure. "
    "Everything (means, variances, rank-sum) is computed from ONE "
    "distinct-value table with a single ordered prefix window over the "
    "compressed domain. Companion to mannwhitney_value_shift / "
    "welch_ttest_purchase_vs_view.",
)
def effect_sizes_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    ab = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        F.col("value").alias("v"),
    )
    per = ab.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(F.lit(1) - F.col("is_a")).alias("cb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cnt = F.col("ca") + F.col("cb")
    rk = per.select(
        "v",
        "ca",
        "cb",
        (F.sum(cnt).over(w) - cnt + (cnt + 1) / 2.0).alias("avg_rank"),
    )
    s = rk.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * F.col("v")).alias("sa1"),
        F.sum(F.col("ca") * F.col("v") * F.col("v")).alias("sa2"),
        F.sum(F.col("cb") * F.col("v")).alias("sb1"),
        F.sum(F.col("cb") * F.col("v") * F.col("v")).alias("sb2"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("ra"),
    )
    ma = F.col("sa1") / F.col("na")
    mb = F.col("sb1") / F.col("nb")
    va = (F.col("sa2") - F.col("sa1") * F.col("sa1") / F.col("na")) / (
        F.col("na") - 1
    )
    vb = (F.col("sb2") - F.col("sb1") * F.col("sb1") / F.col("nb")) / (
        F.col("nb") - 1
    )
    pooled = F.sqrt(
        ((F.col("na") - 1) * va + (F.col("nb") - 1) * vb)
        / (F.col("na") + F.col("nb") - 2)
    )
    d = (ma - mb) / pooled
    g = d * (1.0 - 3.0 / (4.0 * (F.col("na") + F.col("nb")) - 9.0))
    u1 = F.col("ra") - F.col("na") * (F.col("na") + 1) / 2.0
    delta = 2.0 * u1 / (F.col("na") * 1.0 * F.col("nb")) - 1.0
    return s.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(d, 6).alias("cohen_d"),
        F.round(g, 6).alias("hedges_g"),
        F.round(delta, 6).alias("cliffs_delta"),
    )


@register(
    "sprt_purchase_rate",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purch
      FROM events GROUP BY 1
    ),
    llr AS (
      SELECT day, n, n_purch,
             sum(n_purch * ln(0.30 / 0.25)
                 + (n - n_purch) * ln(0.70 / 0.75)) OVER (ORDER BY day)
               AS cum_llr
      FROM d
    )
    SELECT day, n, n_purch, round(cum_llr, 6) AS cum_llr,
           CASE WHEN cum_llr >= ln(19.0) THEN 'accept_h1'
                WHEN cum_llr <= ln(1.0 / 19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY day
    """,
    doc="Wald sequential probability ratio test monitoring the daily "
    "purchase rate: H0 p=0.25 vs H1 p=0.30, alpha=beta=0.05 so the "
    "boundaries are +/- ln(19). Each day contributes the binomial "
    "log-likelihood-ratio increment; the cumulative LLR and the "
    "three-way decision are emitted per day. One events scan -> |days| "
    "table -> one ordered prefix window. The sequential (anytime-valid) "
    "cousin of the repo's batch two-sample tests; at 100 TB the daily "
    "aggregate is the only shuffle.",
)
def sprt_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purch"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    inc = F.col("n_purch") * math.log(0.30 / 0.25) + (
        F.col("n") - F.col("n_purch")
    ) * math.log(0.70 / 0.75)
    llr = d.select("day", "n", "n_purch", F.sum(inc).over(w).alias("cum_llr"))
    hi, lo = math.log(19.0), math.log(1.0 / 19.0)
    return llr.select(
        "day",
        "n",
        "n_purch",
        F.round("cum_llr", 6).alias("cum_llr"),
        F.when(F.col("cum_llr") >= hi, "accept_h1")
        .when(F.col("cum_llr") <= lo, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


@register(
    "l_diversity_audit",
    """
    WITH cells AS (
      SELECT c.c_mktsegment,
             c.c_nationkey,
             CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS cells_below_2,
           CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS cells_below_3,
           CAST(sum(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           round(sum(CASE WHEN l < 3 THEN n_rows ELSE 0 END)
                 / CAST(sum(n_rows) AS DOUBLE), 6) AS risk_rate
    FROM cells GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="l-diversity audit complementing k_anonymity_audit: under the "
    "same quasi-identifier tuple (segment, nation, balance band), each "
    "cell must contain >= l distinct sensitive values (order priority) "
    "or a homogeneity attack re-identifies the attribute even when k is "
    "satisfied (Machanavajjhala et al.). One broadcast-joined scan -> "
    "|cells| aggregate -> per-segment rollup. operators/privacy.py.",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    )
    cells = joined.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_orderpriority").cast("long").alias("l"),
    )
    return (
        cells.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.min("l").cast("long").alias("min_l"),
            F.sum(F.when(F.col("l") < 2, 1).otherwise(0))
            .cast("long")
            .alias("cells_below_2"),
            F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
            .cast("long")
            .alias("cells_below_3"),
            F.sum(F.when(F.col("l") < 3, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.round(
                F.sum(F.when(F.col("l") < 3, F.col("n_rows")).otherwise(0))
                / F.sum("n_rows").cast("double"),
                6,
            ).alias("risk_rate"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "robust_scale_value",
    """
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS mean_v,
             percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS p25,
             percentile_cont(0.50) WITHIN GROUP (ORDER BY value) AS med,
             percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS p75,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(med, 6) AS median_v,
           round(p75 - p25, 6) AS iqr,
           round((mean_v - med) / (p75 - p25), 6) AS mean_scaled,
           round((p95 - med) / (p75 - p25), 6) AS p95_scaled
    FROM s ORDER BY event_type
    """,
    doc="Robust-scaler profile per event type: median/IQR location and "
    "spread, plus where the mean and the 95th percentile land AFTER "
    "robust scaling (x - median)/IQR — derived algebraically from the "
    "same grouped percentiles, so the whole feature-engineering profile "
    "is ONE grouped aggregate, no second pass over scaled rows. The "
    "outlier-safe cousin of z-scoring for heavy-tailed trade values; at "
    "100 TB swap percentile for approx_percentile (mergeable t-digest).",
)
def robust_scale_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.avg("value").alias("mean_v"),
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("med"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.95).alias("p95"),
    )
    iqr = F.col("p75") - F.col("p25")
    return s.select(
        "event_type",
        "n",
        F.round("med", 6).alias("median_v"),
        F.round(iqr, 6).alias("iqr"),
        F.round((F.col("mean_v") - F.col("med")) / iqr, 6).alias("mean_scaled"),
        F.round((F.col("p95") - F.col("med")) / iqr, 6).alias("p95_scaled"),
    ).orderBy("event_type")
