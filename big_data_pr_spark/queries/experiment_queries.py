"""Experimentation toolkit and graph-mixing extensions — round-6
continuation.

Reference capability these generalize: the reference's report draws
before/after conclusions from dashboard deltas (report §8); this
module adds the experiment-design math that makes such conclusions
sound: the A/B power / minimum-detectable-effect table (how long must
a test run), CUPED variance reduction (how much pre-period covariates
shrink the required sample), a sample-ratio-mismatch check for the
hash-based assignment the DiD/bootstrap families already use, and
degree assortativity of the supplier co-supply graph (the mixing
pattern behind the triangle/Jaccard metrics).

Scale posture: power/MDE is a 1-row base aggregate crossed with a
3-row literal horizon table; CUPED reduces events to (user, day) cells
then |users| sums; SRM counts distinct users per hash arm (one
aggregate); assortativity joins the edge list to the |nodes|-sized
degree table (broadcast). No ordered window ever sees raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.privacy import hash_uniform, hash_uniform_sql
from ..tables import load
from .registry import register

_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_BETA = 0.841621  # power = 0.80


@register(
    "ab_power_mde",
    f"""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS p,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS ndays
      FROM events
    )
    SELECT days,
           CAST(floor(n * 1.0 / ndays / 2 * days) AS BIGINT) AS n_per_arm,
           round(p, 6) AS base_rate,
           round(({_Z_ALPHA} + {_Z_BETA})
                 * sqrt(2 * p * (1 - p)
                        / floor(n * 1.0 / ndays / 2 * days)), 6) AS mde_abs,
           round(({_Z_ALPHA} + {_Z_BETA})
                 * sqrt(2 * p * (1 - p)
                        / floor(n * 1.0 / ndays / 2 * days)) / p, 6)
             AS mde_rel
    FROM base, (VALUES (7), (14), (30)) AS h(days)
    ORDER BY days
    """,
    doc="A/B test power planning: for 7/14/30-day horizons at the "
    "observed event volume, the minimum detectable absolute and "
    "relative lift in purchase rate at alpha=0.05 (two-sided) and 80% "
    "power — MDE = (z_a + z_b) * sqrt(2 p (1-p) / n_per_arm), the "
    "standard two-proportion approximation. The design-phase companion "
    "to weekend_purchase_contrast (analysis) and sprt_purchase_rate "
    "(sequential monitoring). One events aggregate crossed with a "
    "3-row literal horizon table.",
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        F.count("*").cast("long").alias("n"),
        F.avg(
            F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
        ).alias("p"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("ndays"),
    )
    horizons = spark.createDataFrame([(7,), (14,), (30,)], "days int")
    j = base.crossJoin(F.broadcast(horizons))
    n_arm = F.floor(
        F.col("n") * 1.0 / F.col("ndays") / 2 * F.col("days")
    )
    mde = (_Z_ALPHA + _Z_BETA) * F.sqrt(
        2 * F.col("p") * (1 - F.col("p")) / n_arm
    )
    return j.select(
        "days",
        n_arm.cast("long").alias("n_per_arm"),
        F.round("p", 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("p"), 6).alias("mde_rel"),
    ).orderBy("days")


@register(
    "cuped_variance_reduction",
    """
    WITH cells AS (
      SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS v
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT user_id, day, v,
             min(day) OVER () + CAST(floor(
               CAST(max(day) OVER () - min(day) OVER () AS BIGINT) / 2.0
             ) AS INTEGER) AS mid
      FROM cells
    ),
    u AS (
      SELECT user_id,
             sum(CASE WHEN day <= mid THEN v ELSE 0.0 END) AS pre,
             sum(CASE WHEN day > mid THEN v ELSE 0.0 END) AS post
      FROM win GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(pre) AS sx, sum(post) AS sy,
             sum(pre * pre) AS sxx, sum(post * post) AS syy,
             sum(pre * post) AS sxy
      FROM u
    ),
    m AS (
      SELECT n,
             (sxy - sx * sy / n) / (n - 1) AS cov,
             (sxx - sx * sx / n) / (n - 1) AS var_pre,
             (syy - sy * sy / n) / (n - 1) AS var_post
      FROM s
    )
    SELECT n AS n_users,
           round(cov / var_pre, 6) AS theta,
           round(cov / sqrt(var_pre * var_post), 6) AS rho,
           round(var_post, 6) AS var_post,
           round(var_post * (1 - cov * cov / (var_pre * var_post)), 6)
             AS var_adjusted,
           round(cov * cov / (var_pre * var_post), 6) AS reduction_frac
    FROM m
    """,
    doc="CUPED variance reduction: using each user's pre-period spend "
    "(first half of the date range) as the control covariate for the "
    "post-period metric, theta = cov/var(pre) and the adjusted metric "
    "variance shrinks by rho^2 — the experiment runs 1/(1-rho^2) times "
    "faster at equal power (Deng et al. 2013). Events reduce to "
    "(user, day) cells, the midpoint rides that table as a global "
    "window, then |users| sums close the whole computation in one "
    "aggregate chain. Pairs with ab_power_mde: its n_per_arm "
    "requirement scales down by exactly reduction_frac.",
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    wall = Window.partitionBy()
    win = cells.select(
        "user_id",
        "day",
        "v",
        F.date_add(
            F.min("day").over(wall),
            F.floor(
                F.datediff(F.max("day").over(wall), F.min("day").over(wall))
                / 2.0
            ).cast("int"),
        ).alias("mid"),
    )
    u = win.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("day") <= F.col("mid"), F.col("v")).otherwise(0.0)
        ).alias("pre"),
        F.sum(
            F.when(F.col("day") > F.col("mid"), F.col("v")).otherwise(0.0)
        ).alias("post"),
    )
    s = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.sum(F.col("post") * F.col("post")).alias("syy"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    var_pre = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_post = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    rho2 = cov * cov / (var_pre * var_post)
    return s.select(
        n.alias("n_users"),
        F.round(cov / var_pre, 6).alias("theta"),
        F.round(cov / F.sqrt(var_pre * var_post), 6).alias("rho"),
        F.round(var_post, 6).alias("var_post"),
        F.round(var_post * (1 - rho2), 6).alias("var_adjusted"),
        F.round(rho2, 6).alias("reduction_frac"),
    )


_SRM_SEED = "srm1"


@register(
    "srm_check_hash_split",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    arms AS (
      SELECT CASE WHEN {hash_uniform_sql("CAST(user_id AS VARCHAR)", _SRM_SEED)}
                       < 0.5 THEN 1 ELSE 0 END AS arm
      FROM u
    ),
    c AS (
      SELECT CAST(sum(arm) AS BIGINT) AS n_a,
             CAST(sum(1 - arm) AS BIGINT) AS n_b
      FROM arms
    )
    SELECT n_a, n_b,
           round(pow(n_a - n_b, 2) * 1.0 / (n_a + n_b), 6) AS chi2,
           round(least(1.0, 2.0 * exp(-pow(n_a - n_b, 2) * 1.0
                                      / (n_a + n_b) / 2.0)), 6) AS p_bound,
           least(1.0, 2.0 * exp(-pow(n_a - n_b, 2) * 1.0
                                / (n_a + n_b) / 2.0)) < 0.001 AS srm_flag
    FROM c
    """,
    doc="Sample-ratio-mismatch check for the seeded md5 hash assignment "
    "used by did_value_estimate / the bootstrap family: distinct users "
    "per arm, the 1-df chi-square against the intended 50/50, a "
    "sub-Gaussian tail-bound p, and the standard p<0.001 SRM alarm — "
    "the first gate any experiment readout must pass (an imbalanced "
    "split invalidates the comparison before any metric is read). One "
    "distinct-user aggregate; the hash is the engine-portable "
    "operators/privacy.hash_uniform pair, so the oracle replays the "
    "assignment bit-for-bit.",
)
def srm_check_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    arms = u.select(
        F.when(
            hash_uniform(F.col("user_id").cast("string"), _SRM_SEED) < 0.5, 1
        )
        .otherwise(0)
        .alias("arm")
    )
    c = arms.agg(
        F.sum("arm").cast("long").alias("n_a"),
        F.sum(1 - F.col("arm")).cast("long").alias("n_b"),
    )
    chi2 = F.pow(F.col("n_a") - F.col("n_b"), 2) * 1.0 / (
        F.col("n_a") + F.col("n_b")
    )
    pb = F.least(F.lit(1.0), 2.0 * F.exp(-chi2 / 2.0))
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        F.round(pb, 6).alias("p_bound"),
        (pb < 0.001).alias("srm_flag"),
    )


@register(
    "degree_assortativity_suppliers",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 1
    ),
    e AS (
      SELECT a.sk AS s1, b.sk AS s2
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT sk, CAST(count(*) AS BIGINT) AS dg FROM (
        SELECT s1 AS sk FROM e UNION ALL SELECT s2 AS sk FROM e
      ) GROUP BY sk
    ),
    sym AS (
      SELECT d1.dg AS da, d2.dg AS db
      FROM e JOIN deg d1 ON e.s1 = d1.sk JOIN deg d2 ON e.s2 = d2.sk
      UNION ALL
      SELECT d2.dg AS da, d1.dg AS db
      FROM e JOIN deg d1 ON e.s1 = d1.sk JOIN deg d2 ON e.s2 = d2.sk
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             sum(da * 1.0) AS sx, sum(db * 1.0) AS sy,
             sum(da * 1.0 * da) AS sxx, sum(db * 1.0 * db) AS syy,
             sum(da * 1.0 * db) AS sxy
      FROM sym
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CASE WHEN (sxx - sx * sx / m) <= 0 OR (syy - sy * sy / m) <= 0
                THEN NULL
                ELSE round((sxy - sx * sy / m)
                           / sqrt((sxx - sx * sx / m)
                                  * (syy - sy * sy / m)), 6) END
             AS assortativity
    FROM s
    """,
    doc="Degree assortativity of the supplier co-supply graph (same "
    "weight-thresholded edges as triangle_count_suppliers): the Pearson "
    "correlation of endpoint degrees over both edge orientations — "
    "positive means hub suppliers co-supply with other hubs (Newman "
    "2002's mixing coefficient). Completes the graph panel: triangles "
    "measure closure, Jaccard measures overlap, assortativity measures "
    "mixing. Edge list and degree table are both graph-sized; degrees "
    "broadcast back onto edges.",
)
def degree_assortativity_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").where(F.col("p_size") == 1)
    ps = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .cache()
    )
    a, b = ps.alias("a"), ps.alias("b")
    e = (
        a.join(
            b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk"))
        )
        .groupBy(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 2)
        .select("s1", "s2")
        .cache()
    )
    deg = (
        e.select(F.col("s1").alias("sk"))
        .unionAll(e.select(F.col("s2").alias("sk")))
        .groupBy("sk")
        .agg(F.count("*").cast("long").alias("dg"))
    )
    d1 = deg.alias("d1")
    d2 = deg.alias("d2")
    joined = (
        e.join(F.broadcast(d1), F.col("s1") == F.col("d1.sk"))
        .join(F.broadcast(d2), F.col("s2") == F.col("d2.sk"))
        .select(F.col("d1.dg").alias("da"), F.col("d2.dg").alias("db"))
    ).cache()
    sym = joined.unionAll(
        joined.select(F.col("db").alias("da"), F.col("da").alias("db"))
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    ne = e.agg(F.count("*").cast("long").alias("n_edges"))
    s = sym.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("da") * 1.0).alias("sx"),
        F.sum(F.col("db") * 1.0).alias("sy"),
        F.sum(F.col("da") * 1.0 * F.col("da")).alias("sxx"),
        F.sum(F.col("db") * 1.0 * F.col("db")).alias("syy"),
        F.sum(F.col("da") * 1.0 * F.col("db")).alias("sxy"),
    )
    m = F.col("m")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / m
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / m
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / m
    # manual corr with a zero-variance guard: a degree-regular graph
    # has undefined assortativity (NULL), not a division error
    assort = F.when(
        (cxx <= 0) | (cyy <= 0), F.lit(None)
    ).otherwise(F.round(cxy / F.sqrt(cxx * cyy), 6))
    return (
        s.select(assort.alias("assortativity"))
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ne))
        .select("n_nodes", "n_edges", "assortativity")
    )


@register(
    "pareto_share_curve",
    """
    WITH cust AS (
      SELECT o_custkey, sum(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend DESC, o_custkey) AS r,
             count(*) OVER () AS n,
             sum(spend) OVER () AS total
      FROM cust
    ),
    cum AS (
      SELECT r, n, total,
             sum(spend) OVER (ORDER BY r) AS cum_spend
      FROM rk
    )
    SELECT pct,
           CAST(greatest(1, CAST(floor(pct / 100.0 * n) AS BIGINT))
                AS BIGINT) AS n_customers,
           round(max(CASE WHEN r <= greatest(1, CAST(floor(pct / 100.0 * n)
                                                     AS BIGINT))
                          THEN cum_spend END) / max(total), 6) AS revenue_share
    FROM cum, (VALUES (1), (5), (10), (20)) AS p(pct)
    GROUP BY pct, n, total ORDER BY pct
    """,
    doc="Pareto revenue-share curve: the fraction of total revenue "
    "contributed by the top 1/5/10/20% of customers by spend — the "
    "curve form of revenue_concentration's single top-20% point and "
    "the planning input for account tiering. Customers aggregate "
    "first; rank/prefix windows ride the |customers| table; the 4-row "
    "literal percent table fans the cumulative curve, and each share "
    "is the cumulative spend at the percentile cutoff row "
    "(deterministic spend-desc/custkey tiebreak).",
)
def pareto_share_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    wall = Window.partitionBy()
    rk = cust.select(
        "spend",
        F.row_number()
        .over(Window.orderBy(F.desc("spend"), F.asc("o_custkey")))
        .alias("r"),
        F.count("*").over(wall).alias("n"),
        F.sum("spend").over(wall).alias("total"),
    )
    wcum = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum = rk.select(
        "r", "n", "total", F.sum("spend").over(wcum).alias("cum_spend")
    )
    pcts = spark.createDataFrame([(1,), (5,), (10,), (20,)], "pct int")
    j = cum.crossJoin(F.broadcast(pcts))
    cutoff = F.greatest(
        F.lit(1), F.floor(F.col("pct") / 100.0 * F.col("n")).cast("long")
    )
    return (
        j.groupBy("pct", "n", "total")
        .agg(
            F.max(F.when(F.col("r") <= cutoff, F.col("cum_spend"))).alias(
                "cut_spend"
            )
        )
        .select(
            "pct",
            F.greatest(
                F.lit(1),
                F.floor(F.col("pct") / 100.0 * F.col("n")).cast("long"),
            )
            .cast("long")
            .alias("n_customers"),
            F.round(F.col("cut_spend") / F.col("total"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("pct")
    )


@register(
    "spend_band_migration",
    """
    WITH cy AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
             sum(o_totalprice) AS spend
      FROM orders GROUP BY 1, 2
    ),
    banded AS (
      SELECT o_custkey, yr,
             CASE WHEN spend < 200000 THEN 'low'
                  WHEN spend < 500000 THEN 'mid'
                  ELSE 'high' END AS band
      FROM cy
    ),
    seq AS (
      SELECT band AS cur_band,
             lag(band) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_band,
             lag(yr) OVER (PARTITION BY o_custkey ORDER BY yr) AS prev_yr,
             yr
      FROM banded
    ),
    pairs AS (
      SELECT prev_band, cur_band, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_band IS NOT NULL AND yr = prev_yr + 1
      GROUP BY 1, 2
    )
    SELECT prev_band, cur_band, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev_band), 6) AS p
    FROM pairs ORDER BY prev_band, cur_band
    """,
    doc="Customer spend-band migration matrix: per customer-year spend "
    "bucketed into fixed low/mid/high bands, then the year-over-year "
    "transition probabilities between bands (consecutive years only — "
    "a gap year breaks the chain rather than faking a transition). "
    "The longitudinal upgrade of customer_ltv_deciles: where do "
    "customers MOVE, not just where they sit. One orders scan -> "
    "|customer-years| -> keyed lag window -> 9-cell matrix with a "
    "row-normalization window over it.",
)
def spend_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cy = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
        )
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    band = (
        F.when(F.col("spend") < 200000, "low")
        .when(F.col("spend") < 500000, "mid")
        .otherwise("high")
    )
    banded = cy.select("o_custkey", "yr", band.alias("band"))
    w = Window.partitionBy("o_custkey").orderBy("yr")
    seq = banded.select(
        F.col("band").alias("cur_band"),
        F.lag("band").over(w).alias("prev_band"),
        F.lag("yr").over(w).alias("prev_yr"),
        "yr",
    ).where(
        F.col("prev_band").isNotNull() & (F.col("yr") == F.col("prev_yr") + 1)
    )
    pairs = seq.groupBy("prev_band", "cur_band").agg(
        F.count("*").cast("long").alias("n")
    )
    return pairs.select(
        "prev_band",
        "cur_band",
        "n",
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev_band")),
            6,
        ).alias("p"),
    ).orderBy("prev_band", "cur_band")


_BT_ITERS = 30  # MM iterations (Hunter 2004; |types|=5 state — free)


@register(
    "bradley_terry_event_types",
    f"""
    WITH RECURSIVE percap AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    duels AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS w_ab,
             sum(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) AS n_ab
      FROM percap a JOIN percap b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT ta, tb, w_ab, n_ab FROM duels WHERE n_ab > 0
    ),
    types AS MATERIALIZED (
      SELECT event_type,
             row_number() OVER (ORDER BY event_type) AS i
      FROM (SELECT DISTINCT ta AS event_type FROM pairs
            UNION SELECT DISTINCT tb FROM pairs)
    ),
    wins AS MATERIALIZED (
      SELECT t.event_type, t.i,
             coalesce((SELECT sum(w_ab) FROM pairs WHERE ta = t.event_type), 0)
             + coalesce((SELECT sum(n_ab - w_ab) FROM pairs
                         WHERE tb = t.event_type), 0) AS w,
             coalesce((SELECT sum(n_ab) FROM pairs WHERE ta = t.event_type), 0)
             + coalesce((SELECT sum(n_ab) FROM pairs
                         WHERE tb = t.event_type), 0) AS n
      FROM types t
    ),
    it AS (
      SELECT 0 AS k,
             (SELECT list(CAST(1.0 AS DOUBLE) ORDER BY i) FROM types) AS p
      UNION ALL
      SELECT s.k + 1 AS k, list(s.pn ORDER BY s.i) AS p
      FROM (
        SELECT it.k AS k, w.i AS i,
               w.w / sum(pr.n_ab / (it.p[ti.i] + it.p[tj.i])) AS pn
        FROM it
        CROSS JOIN wins w
        JOIN pairs pr ON pr.ta = w.event_type OR pr.tb = w.event_type
        JOIN types ti ON ti.event_type = pr.ta
        JOIN types tj ON tj.event_type = pr.tb
        WHERE it.k < {_BT_ITERS}
        GROUP BY it.k, it.p, w.i, w.w
      ) s
      GROUP BY s.k
    ),
    fin AS (SELECT p FROM it WHERE k = {_BT_ITERS}),
    tot AS (SELECT sum(x) AS s FROM fin, unnest(fin.p) AS u(x))
    SELECT t.event_type,
           CAST(w.w AS BIGINT) AS wins,
           CAST(w.n AS BIGINT) AS games,
           round(fin.p[t.i] / tot.s, 6) AS bt_strength
    FROM types t JOIN wins w USING (event_type)
    CROSS JOIN fin CROSS JOIN tot
    ORDER BY t.event_type
    """,
    doc="Bradley-Terry strength estimation via Hunter's (2004) MM "
    "algorithm over pairwise 'duels' between event types: within each "
    "user, type a beats type b when the user emitted a more often; "
    "duel counts aggregate once (|types|^2-bounded), then "
    f"{_BT_ITERS} MM updates p_a <- w_a / sum n_ab/(p_a+p_b) run on "
    "the |types|-sized state (driver-side in Spark; the oracle "
    "replays the identical bounded recursion with the strength "
    "vector as list state). Output normalized to sum 1 — the "
    "preference-strength ranking used for LLM arena-style pairwise "
    "evals. Scale: per-user counts are one shuffle; duels join at "
    "(user x type-pair) density; everything after is constant-sized.",
)
def bradley_terry_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    percap = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
    )
    a, b = percap.alias("a"), percap.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(
            F.sum((F.col("a.c") > F.col("b.c")).cast("int")).alias("w_ab"),
            F.sum((F.col("a.c") != F.col("b.c")).cast("int")).alias("n_ab"),
        )
        .where(F.col("n_ab") > 0)
        .collect()  # |types|^2-bounded
    )
    duels = sorted(duels, key=lambda r: (r["ta"], r["tb"]))  # stable fold
    types = sorted({r["ta"] for r in duels} | {r["tb"] for r in duels})
    idx = {t: i for i, t in enumerate(types)}
    wins = [0.0] * len(types)
    games = [0] * len(types)
    for r in duels:
        wins[idx[r["ta"]]] += r["w_ab"]
        wins[idx[r["tb"]]] += r["n_ab"] - r["w_ab"]
        games[idx[r["ta"]]] += r["n_ab"]
        games[idx[r["tb"]]] += r["n_ab"]
    p = [1.0] * len(types)
    for _ in range(_BT_ITERS):
        denom = [0.0] * len(types)
        for r in duels:
            ia, ib = idx[r["ta"]], idx[r["tb"]]
            term = r["n_ab"] / (p[ia] + p[ib])
            denom[ia] += term
            denom[ib] += term
        p = [
            wins[i] / denom[i] if denom[i] > 0 else p[i]
            for i in range(len(types))
        ]
    s = sum(p)
    rows = [
        (t, int(wins[idx[t]]), int(games[idx[t]]), round(p[idx[t]] / s, 6))
        for t in types
    ]
    return load(spark, sf_dir, "events").sparkSession.createDataFrame(
        rows, "event_type string, wins bigint, games bigint, bt_strength double"
    ).orderBy("event_type")
