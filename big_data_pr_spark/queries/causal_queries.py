"""Econometrics, survival, and information-theory extensions — round-6
continuation.

Reference capability these generalize: the reference's report reasons
about price sensitivity, customer lifetime, and behavioral drivers
qualitatively over its TPC-H-shaped warehouse (report §6-§8); this
module adds the quantitative versions: per-brand log-log price
elasticity (the demand-curve slope behind price_realization_by_brand),
a Kaplan-Meier product-limit estimator of user lifetime with
right-censoring (the nonparametric upgrade of survival_user_retention's
fixed horizons), a chi-square / Cramér's V / mutual-information panel
over the (event type x weekday) contingency table (effect-size
companions to chisq_type_weekday), and a difference-in-differences
estimator over a deterministic hash-assigned treatment (the A/B
counterfactual frame, seeded by the same md5 uniform as the DP and
bootstrap families — operators/privacy.hash_uniform).

Scale posture: elasticity is a grouped regression accumulator on the
lineitem scan (part joins as a dimension); KM reduces events to a
|users| table then a |distinct-lifetimes| ordered chain; the MI panel
is a |types x 7| contingency with window marginals; DiD reduces to a
|days x 2| cell table before any window. No ordered window ever sees
raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.privacy import hash_uniform, hash_uniform_sql
from ..tables import load
from .registry import register


@register(
    "price_elasticity_by_brand",
    """
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(ln(l_quantity),
                            ln(l_extendedprice / l_quantity
                               * (1 - l_discount))), 4) AS elasticity,
           round(regr_r2(ln(l_quantity),
                         ln(l_extendedprice / l_quantity
                            * (1 - l_discount))), 4) AS r2
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
    doc="Per-brand price elasticity of demand: OLS slope of ln(quantity) "
    "on ln(discounted unit price) — the constant-elasticity demand "
    "curve; elasticity < -1 is elastic demand where discounting grows "
    "revenue. One lineitem scan with part broadcast as a dimension; the "
    "regression is a map-side-partial accumulator per brand (25 "
    "groups), so the shuffle carries 25 rows of sufficient statistics. "
    "The causal companion to price_realization_by_brand.",
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    y = F.log("l_quantity")
    x = F.log(
        F.col("l_extendedprice") / F.col("l_quantity")
        * (1 - F.col("l_discount"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 4).alias("elasticity"),
            F.round(F.regr_r2(y, x), 4).alias("r2"),
        )
        .orderBy("p_brand")
    )


@register(
    "kaplan_meier_ship_latency",
    """
    WITH pairs AS (
      SELECT CAST(o_orderdate AS DATE) AS od, CAST(l_shipdate AS DATE) AS sd,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    cut AS (
      SELECT od, sd, c, max(od) OVER () AS cutoff FROM pairs
    ),
    m AS (
      SELECT CAST(CASE WHEN sd <= cutoff THEN sd - od
                       ELSE cutoff - od END AS BIGINT) AS t,
             CASE WHEN sd <= cutoff THEN 1 ELSE 0 END AS e,
             c
      FROM cut
    ),
    per_t AS (
      SELECT t, CAST(sum(c) AS BIGINT) AS n_t,
             CAST(sum(e * c) AS BIGINT) AS d_t
      FROM m GROUP BY t
    ),
    risk AS (
      SELECT t, n_t, d_t,
             CAST(sum(n_t) OVER () - coalesce(sum(n_t) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS at_risk
      FROM per_t
    ),
    surv AS (
      SELECT t, n_t, d_t, at_risk,
             sum(CASE WHEN d_t < at_risk
                      THEN ln(1.0 - d_t * 1.0 / at_risk) ELSE 0.0 END)
               OVER (ORDER BY t) AS cum_ln,
             sum(CASE WHEN d_t >= at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t) AS hit_zero
      FROM risk
    )
    SELECT t AS latency_days, at_risk AS n_risk, d_t AS n_events,
           n_t - d_t AS n_censored,
           round(CASE WHEN hit_zero > 0 THEN 0.0 ELSE exp(cum_ln) END, 6)
             AS survival
    FROM surv WHERE d_t > 0 ORDER BY t
    """,
    doc="Kaplan-Meier product-limit estimator of order-to-ship latency "
    "with administrative right-censoring: as of the last order date, "
    "lineitems whose ship date falls beyond the cutoff are censored at "
    "cutoff - orderdate (the still-in-flight tail a live warehouse "
    "always has). S(t) = product over event times of (1 - d/n_at_risk); "
    "the cumulative product is exp(cumulative sum of logs) with an "
    "explicit zero-crossing flag so a d = n step pins S to exactly 0 on "
    "both engines. The fact-fact join reduces immediately to a "
    "(orderdate x shipdate) pair-count table, so the cutoff window, the "
    "lifetime mapping, and the layered KM chain all run over "
    "date-bounded domains — never raw rows. The nonparametric upgrade "
    "of ship_latency_percentiles / survival_user_retention.",
)
def kaplan_meier_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.to_date("o_orderdate").alias("od"),
            F.to_date("l_shipdate").alias("sd"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    wall = Window.partitionBy()
    cut = pairs.select(
        "od", "sd", "c", F.max("od").over(wall).alias("cutoff")
    )
    m = cut.select(
        F.when(
            F.col("sd") <= F.col("cutoff"), F.datediff("sd", "od")
        )
        .otherwise(F.datediff("cutoff", "od"))
        .cast("long")
        .alias("t"),
        F.when(F.col("sd") <= F.col("cutoff"), 1).otherwise(0).alias("e"),
        "c",
    )
    per_t = m.groupBy("t").agg(
        F.sum("c").cast("long").alias("n_t"),
        F.sum(F.col("e") * F.col("c")).cast("long").alias("d_t"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.select(
        "t",
        "n_t",
        "d_t",
        (
            F.sum("n_t").over(wall)
            - F.coalesce(F.sum("n_t").over(wprev), F.lit(0))
        ).alias("at_risk"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    surv = risk.select(
        "t",
        "n_t",
        "d_t",
        "at_risk",
        F.sum(
            F.when(
                F.col("d_t") < F.col("at_risk"),
                F.log(1.0 - F.col("d_t") * 1.0 / F.col("at_risk")),
            ).otherwise(0.0)
        )
        .over(wcum)
        .alias("cum_ln"),
        F.sum(F.when(F.col("d_t") >= F.col("at_risk"), 1).otherwise(0))
        .over(wcum)
        .alias("hit_zero"),
    )
    return (
        surv.where(F.col("d_t") > 0)
        .select(
            F.col("t").alias("latency_days"),
            F.col("at_risk").alias("n_risk"),
            F.col("d_t").alias("n_events"),
            (F.col("n_t") - F.col("d_t")).alias("n_censored"),
            F.round(
                F.when(F.col("hit_zero") > 0, 0.0).otherwise(
                    F.exp("cum_ln")
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("latency_days")
    )


@register(
    "mutual_info_type_weekday",
    """
    WITH cont AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS n_ij
      FROM events GROUP BY 1, 2
    ),
    marg AS (
      SELECT event_type, dow, n_ij,
             sum(n_ij) OVER (PARTITION BY event_type) AS ri,
             sum(n_ij) OVER (PARTITION BY dow) AS cj,
             sum(n_ij) OVER () AS n
      FROM cont
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT dow) AS BIGINT) AS n_days,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS df,
           round(sum(pow(n_ij - ri * cj * 1.0 / n, 2)
                     / (ri * cj * 1.0 / n)), 6) AS chi2,
           round(sqrt(sum(pow(n_ij - ri * cj * 1.0 / n, 2)
                          / (ri * cj * 1.0 / n))
                      / (max(n) * (least(count(DISTINCT event_type),
                                         count(DISTINCT dow)) - 1))), 6)
             AS cramers_v,
           round(sum(n_ij * 1.0 / n
                     * ln(n_ij * 1.0 * n / (ri * cj))), 6) AS mi_nats
    FROM marg
    """,
    doc="Association panel for the (event type x weekday) contingency "
    "table: Pearson chi-square, Cramér's V (the [0,1]-normalized effect "
    "size the raw chi2 lacks), and mutual information in nats (the "
    "information-theoretic view — how many nats knowing the weekday "
    "buys about the event type; companion to user_event_entropy). "
    "Weekday is days-since-epoch mod 7 (engine-stable). One events scan "
    "-> |types x 7| contingency; marginals ride the contingency table "
    "as window sums; single-row closed form.",
)
def mutual_info_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cont = ev.groupBy(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow"),
    ).agg(F.count("*").cast("long").alias("n_ij"))
    marg = cont.select(
        "event_type",
        "dow",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy("event_type")).alias("ri"),
        F.sum("n_ij").over(Window.partitionBy("dow")).alias("cj"),
        F.sum("n_ij").over(Window.partitionBy()).alias("n"),
    )
    e_ij = F.col("ri") * F.col("cj") * 1.0 / F.col("n")
    chi2 = F.sum(F.pow(F.col("n_ij") - e_ij, 2) / e_ij)
    r = F.countDistinct("event_type")
    c = F.countDistinct("dow")
    return marg.agg(
        F.max("n").cast("long").alias("n_rows"),
        r.cast("long").alias("n_types"),
        c.cast("long").alias("n_days"),
        ((r - 1) * (c - 1)).cast("long").alias("df"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.max("n") * (F.least(r, c) - 1))), 6
        ).alias("cramers_v"),
        F.round(
            F.sum(
                F.col("n_ij")
                * 1.0
                / F.col("n")
                * F.log(
                    F.col("n_ij") * 1.0 * F.col("n")
                    / (F.col("ri") * F.col("cj"))
                )
            ),
            6,
        ).alias("mi_nats"),
    )


_DID_SEED = "did1"


@register(
    "did_value_estimate",
    f"""
    WITH cells AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN {hash_uniform_sql("CAST(user_id AS VARCHAR)", _DID_SEED)}
                       < 0.5 THEN 1 ELSE 0 END AS treat,
             sum(value) AS s, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT day, treat, s, n,
             min(day) OVER () + CAST(floor(
               CAST(max(day) OVER () - min(day) OVER () AS BIGINT) / 2.0
             ) AS INTEGER) AS mid
      FROM cells
    ),
    quad AS (
      SELECT treat, CASE WHEN day > mid THEN 1 ELSE 0 END AS post,
             sum(s) AS s, CAST(sum(n) AS BIGINT) AS n
      FROM win GROUP BY 1, 2
    ),
    wide AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_rows,
             sum(CASE WHEN treat = 1 AND post = 0 THEN s END)
               / sum(CASE WHEN treat = 1 AND post = 0 THEN n END) AS m_t_pre,
             sum(CASE WHEN treat = 1 AND post = 1 THEN s END)
               / sum(CASE WHEN treat = 1 AND post = 1 THEN n END) AS m_t_post,
             sum(CASE WHEN treat = 0 AND post = 0 THEN s END)
               / sum(CASE WHEN treat = 0 AND post = 0 THEN n END) AS m_c_pre,
             sum(CASE WHEN treat = 0 AND post = 1 THEN s END)
               / sum(CASE WHEN treat = 0 AND post = 1 THEN n END) AS m_c_post
      FROM quad
    )
    SELECT n_rows,
           round(m_t_pre, 6) AS mean_treat_pre,
           round(m_t_post, 6) AS mean_treat_post,
           round(m_c_pre, 6) AS mean_ctrl_pre,
           round(m_c_post, 6) AS mean_ctrl_post,
           round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)
             AS did_estimate
    FROM wide
    """,
    doc="Difference-in-differences estimator: users are assigned to "
    "treatment by the same seeded md5 uniform as the DP/bootstrap "
    "families (operators/privacy.hash_uniform — engine-stable, no RNG), "
    "periods split at the date-range midpoint, and the DiD estimate is "
    "the treated pre/post change net of the control change — the "
    "parallel-trends counterfactual frame for A/B rollouts. Events "
    "reduce to a |days x 2| cell table before any window; the midpoint "
    "rides that table as a global window; the 2x2 collapse is a "
    "single-row conditional aggregate.",
)
def did_value_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.when(
            hash_uniform(F.col("user_id").cast("string"), _DID_SEED) < 0.5, 1
        )
        .otherwise(0)
        .alias("treat"),
    ).agg(F.sum("value").alias("s"), F.count("*").cast("long").alias("n"))
    wall = Window.partitionBy()
    win = cells.select(
        "day",
        "treat",
        "s",
        "n",
        F.date_add(
            F.min("day").over(wall),
            F.floor(
                F.datediff(F.max("day").over(wall), F.min("day").over(wall))
                / 2.0
            ).cast("int"),
        ).alias("mid"),
    )
    quad = win.groupBy(
        "treat", F.when(F.col("day") > F.col("mid"), 1).otherwise(0).alias("post")
    ).agg(F.sum("s").alias("s"), F.sum("n").cast("long").alias("n"))

    def cell(t: int, p: int):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, F.col("s"))) / F.sum(
            F.when(cond, F.col("n"))
        )

    m_t_pre, m_t_post = cell(1, 0), cell(1, 1)
    m_c_pre, m_c_post = cell(0, 0), cell(0, 1)
    return quad.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.round(m_t_pre, 6).alias("mean_treat_pre"),
        F.round(m_t_post, 6).alias("mean_treat_post"),
        F.round(m_c_pre, 6).alias("mean_ctrl_pre"),
        F.round(m_c_post, 6).alias("mean_ctrl_post"),
        F.round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6).alias(
            "did_estimate"
        ),
    )


@register(
    "price_index_fisher_yearly",
    """
    WITH yb AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, p_brand,
             sum(l_extendedprice) / sum(l_quantity) AS p,
             sum(l_quantity) AS q
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.yr,
             sum(c.p * b.q) AS pt_q0, sum(b.p * b.q) AS p0_q0,
             sum(c.p * c.q) AS pt_qt, sum(b.p * c.q) AS p0_qt
      FROM yb c JOIN yb b ON b.yr = c.yr - 1 AND b.p_brand = c.p_brand
      GROUP BY c.yr
    )
    SELECT yr,
           round(pt_q0 / p0_q0, 6) AS laspeyres,
           round(pt_qt / p0_qt, 6) AS paasche,
           round(sqrt((pt_q0 / p0_q0) * (pt_qt / p0_qt)), 6) AS fisher
    FROM pairs ORDER BY yr
    """,
    doc="Year-over-year price indices for the parts basket: Laspeyres "
    "(base-year quantity weights), Paasche (current-year weights), and "
    "their geometric mean the Fisher ideal index — the formal answer "
    "to 'did prices move or did the mix shift' that "
    "price_realization_by_brand eyeballs. Unit prices and quantity "
    "weights aggregate per (year, brand) first, so the year-pair "
    "self-join runs over a |years x 25| table. The star join "
    "broadcasts part; orders joins on the orderkey.",
)
def price_index_fisher_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yb = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"), "p_brand"
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
            F.sum("l_quantity").alias("q"),
        )
    )
    c = yb.alias("c")
    b = yb.alias("b")
    pairs = (
        c.join(
            b,
            (F.col("b.yr") == F.col("c.yr") - 1)
            & (F.col("b.p_brand") == F.col("c.p_brand")),
        )
        .groupBy(F.col("c.yr").alias("yr"))
        .agg(
            F.sum(F.col("c.p") * F.col("b.q")).alias("pt_q0"),
            F.sum(F.col("b.p") * F.col("b.q")).alias("p0_q0"),
            F.sum(F.col("c.p") * F.col("c.q")).alias("pt_qt"),
            F.sum(F.col("b.p") * F.col("c.q")).alias("p0_qt"),
        )
    )
    lasp = F.col("pt_q0") / F.col("p0_q0")
    paas = F.col("pt_qt") / F.col("p0_qt")
    return pairs.select(
        "yr",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("yr")


_COX_STEPS = 8  # Newton-Raphson steps (quadratic convergence; step 8
# moves beta by ~1e-15 on this data — effectively exact, and the
# oracle replays the SAME bounded recursion so truncation is shared)


@register(
    "cox_ph_ship_priority",
    f"""
    WITH RECURSIVE lat AS (
      SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT) AS t,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    per_t AS (
      SELECT t, sum(g1) AS d1, count(*) AS d FROM lat GROUP BY t
    ),
    tt AS MATERIALIZED (
      SELECT t, d1, d,
             sum(d1) OVER (ORDER BY t DESC) AS n1,
             sum(d) OVER (ORDER BY t DESC) - sum(d1) OVER (ORDER BY t DESC)
               AS n0
      FROM per_t
    ),
    it AS (
      SELECT 0 AS k, CAST(0 AS DOUBLE) AS beta
      UNION ALL
      SELECT it.k + 1,
             it.beta
             + ((SELECT sum(d1) FROM tt)
                - sum(d * exp(it.beta) * n1 / (n0 + exp(it.beta) * n1)))
             / sum(d * exp(it.beta) * n1 * n0
                   / pow(n0 + exp(it.beta) * n1, 2))
      FROM it, tt
      WHERE it.k < {_COX_STEPS}
      GROUP BY it.k, it.beta
    ),
    fin AS (SELECT beta FROM it WHERE k = {_COX_STEPS}),
    info AS (
      SELECT fin.beta,
             sum(d * exp(fin.beta) * n1 * n0
                 / pow(n0 + exp(fin.beta) * n1, 2)) AS i
      FROM tt CROSS JOIN fin GROUP BY fin.beta
    )
    SELECT round(beta, 6) AS beta,
           round(exp(beta), 6) AS hazard_ratio,
           round(1.0 / sqrt(i), 6) AS se,
           round(beta * sqrt(i), 6) AS z,
           (SELECT CAST(count(*) AS BIGINT) FROM tt) AS n_event_times,
           (SELECT CAST(sum(d1) AS BIGINT) FROM tt) AS d1_total,
           (SELECT CAST(sum(d) - sum(d1) AS BIGINT) FROM tt) AS d0_total
    FROM info
    """,
    doc="Cox proportional-hazards fit (binary covariate, Breslow tie "
    "handling) for order-to-ship latency, urgent vs low priority — "
    "the parametric sibling of logrank_ship_priority on the SAME risk "
    "sets: with one binary covariate the partial likelihood collapses "
    "to the per-event-time table (d, d1, n0, n1), so the score "
    "U(b) = D1 - sum d*e^b*n1/(n0+e^b*n1) and information I(b) need "
    "only that |distinct latencies|-sized table. Newton-Raphson from "
    f"b=0, {_COX_STEPS} bounded steps (driver-side on the collected "
    "table — date-range bounded by construction; the oracle replays "
    "the identical recursion). Reports log hazard ratio, HR, SE = "
    "I(b)^-1/2, Wald z. Scale: one fact join -> per-day aggregate; "
    "suffix-sum windows over days; the Newton state is two doubles.",
)
def cox_ph_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("t"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("g1"),
        )
    )
    per_t = lat.groupBy("t").agg(
        F.sum("g1").alias("d1"), F.count("*").alias("d")
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tt = per_t.select(
        "t",
        "d1",
        "d",
        F.sum("d1").over(wdesc).alias("n1"),
        (F.sum("d").over(wdesc) - F.sum("d1").over(wdesc)).alias("n0"),
    ).collect()  # |distinct latency days| rows — date-range bounded
    rows = sorted(tt, key=lambda r: r["t"])
    d1_total = sum(r["d1"] for r in rows)
    d_total = sum(r["d"] for r in rows)
    beta = 0.0
    for _ in range(_COX_STEPS):
        u = float(d1_total)
        info = 0.0
        eb = math.exp(beta)
        for r in rows:
            s = r["n0"] + eb * r["n1"]
            u -= r["d"] * eb * r["n1"] / s
            info += r["d"] * eb * r["n1"] * r["n0"] / (s * s)
        beta += u / info
    eb = math.exp(beta)
    info = sum(
        r["d"] * eb * r["n1"] * r["n0"] / (r["n0"] + eb * r["n1"]) ** 2
        for r in rows
    )
    se = 1.0 / math.sqrt(info)
    spark_df = load(spark, sf_dir, "orders").sparkSession.createDataFrame(
        [
            (
                round(beta, 6),
                round(math.exp(beta), 6),
                round(se, 6),
                round(beta / se, 6),
                len(rows),
                int(d1_total),
                int(d_total - d1_total),
            )
        ],
        "beta double, hazard_ratio double, se double, z double, "
        "n_event_times bigint, d1_total bigint, d0_total bigint",
    )
    return spark_df


_RDD_BW = 3000.0  # bandwidth around the acctbal cutoff


@register(
    "regression_discontinuity_acctbal",
    f"""
    WITH spend AS (
      SELECT c.c_custkey, c.c_acctbal AS x,
             coalesce(sum(o.o_totalprice), 0) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    w AS (
      SELECT x, y, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side
      FROM spend WHERE abs(x) <= {_RDD_BW}
    ),
    fits AS (
      SELECT side,
             CAST(count(*) AS BIGINT) AS n,
             regr_intercept(y, x) AS a,
             regr_slope(y, x) AS b
      FROM w GROUP BY side
    )
    SELECT l.n AS n_left, r.n AS n_right,
           round(l.a, 4) AS intercept_left,
           round(r.a, 4) AS intercept_right,
           round(l.b, 6) AS slope_left,
           round(r.b, 6) AS slope_right,
           round(r.a - l.a, 4) AS rdd_effect
    FROM (SELECT * FROM fits WHERE side = 0) l
    CROSS JOIN (SELECT * FROM fits WHERE side = 1) r
    """,
    doc="Sharp regression-discontinuity estimate at the zero-balance "
    "cutoff: per-customer total spend (left join keeps zero-order "
    "customers) regressed on account balance separately on each side "
    f"within a ±{_RDD_BW:.0f} bandwidth; the effect is the boundary "
    "intercept gap (local-linear RDD, Imbens & Lemieux 2008). The "
    "causal-family member for threshold-assigned treatments — "
    "credit/eligibility cutoffs — next to did_value_estimate and "
    "cuped. Scale: one fact join -> |customers| aggregate -> two "
    "closed-form regr_* fits; nothing iterative.",
)
def regression_discontinuity_acctbal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0)).alias("y"))
        .select(F.col("c_acctbal").alias("x"), "y")
    )
    w = spend.where(F.abs("x") <= _RDD_BW).withColumn(
        "side", (F.col("x") >= 0).cast("int")
    )
    fits = w.groupBy("side").agg(
        F.count("*").cast("bigint").alias("n"),
        F.regr_intercept("y", "x").alias("a"),
        F.regr_slope("y", "x").alias("b"),
    )
    l = fits.where(F.col("side") == 0).select(
        F.col("n").alias("n_left"),
        F.col("a").alias("al"),
        F.col("b").alias("bl"),
    )
    r = fits.where(F.col("side") == 1).select(
        F.col("n").alias("n_right"),
        F.col("a").alias("ar"),
        F.col("b").alias("br"),
    )
    return l.crossJoin(r).select(
        "n_left",
        "n_right",
        F.round("al", 4).alias("intercept_left"),
        F.round("ar", 4).alias("intercept_right"),
        F.round("bl", 6).alias("slope_left"),
        F.round("br", 6).alias("slope_right"),
        F.round(F.col("ar") - F.col("al"), 4).alias("rdd_effect"),
    )


@register(
    "qte_deciles_purchase_vs_view",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 'a' ELSE 'b' END AS g,
             value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    rk AS (
      SELECT g, value,
             row_number() OVER (PARTITION BY g ORDER BY value) AS r,
             count(*) OVER (PARTITION BY g) AS n
      FROM ab
    ),
    qs AS (SELECT unnest(range(1, 10)) AS d),
    pick AS (
      SELECT qs.d, rk.g, rk.value
      FROM qs JOIN rk ON rk.r = CAST(ceil(qs.d * 0.1 * rk.n) AS BIGINT)
    )
    SELECT CAST(d AS BIGINT) AS decile,
           round(max(CASE WHEN g = 'a' THEN value END), 6) AS q_purchase,
           round(max(CASE WHEN g = 'b' THEN value END), 6) AS q_view,
           round(max(CASE WHEN g = 'a' THEN value END)
                 - max(CASE WHEN g = 'b' THEN value END), 6) AS qte
    FROM pick GROUP BY d ORDER BY d
    """,
    doc="Quantile treatment effects at deciles (the distributional "
    "companion to the mean-shift tests): per decile, the purchase-vs-"
    "view difference of EXACT type-1 quantiles (element at rank "
    "ceil(q*n) — ordinal, no interpolation, so both engines pick the "
    "identical row; cf. Doksum 1974 / Koenker's QTE). Reveals where "
    "in the distribution the effect lives — tails vs median — which "
    "a single Mann-Whitney/Welch number hides. One rank window per "
    "group + a 9-row broadcast rank join.",
)
def qte_deciles_purchase_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    ab = ev.select(
        F.when(F.col("event_type") == "purchase", "a").otherwise("b").alias("g"),
        "value",
    )
    wg = Window.partitionBy("g").orderBy("value")
    wn = Window.partitionBy("g")
    rk = ab.select(
        "g",
        "value",
        F.row_number().over(wg).alias("r"),
        F.count("*").over(wn).alias("n"),
    )
    qs = spark.range(1, 10).select(F.col("id").alias("d"))
    pick = qs.join(
        rk,
        rk["r"] == F.ceil(F.col("d") * 0.1 * rk["n"]).cast("long"),
    )
    qa = F.max(F.when(F.col("g") == "a", F.col("value")))
    qb = F.max(F.when(F.col("g") == "b", F.col("value")))
    return (
        pick.groupBy(F.col("d").cast("bigint").alias("decile"))
        .agg(
            F.round(qa, 6).alias("q_purchase"),
            F.round(qb, 6).alias("q_view"),
            F.round(qa - qb, 6).alias("qte"),
        )
        .orderBy("decile")
    )
