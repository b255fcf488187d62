"""Nonparametric statistical tests, changepoint detection, graph
analytics, and CDC-apply — round-6 surface extensions.

Reference capability these generalize: the reference's analytics layer
computes drift/trend statistics over candle series and cross-sectional
aggregates (batch_processor.py steps 7-9); its report §8 reasons about
regime changes qualitatively. This module adds the classical
distribution-free members of that family (rank tests need no normality
assumption, which matches the reference's heavy-tailed trade values),
two changepoint detectors over the daily series the reference charts,
the supplier co-supply graph metrics implied by its supply-side joins,
RiskMetrics EWMA volatility (the recursive cousin of its SMA/EMA
indicators), a CDC last-writer-wins apply with tombstones (the
streaming-upsert semantics its Elasticsearch sink relies on —
stream_processor.py doc_id upsert), and a 7-day STL-style seasonal
decomposition of daily traffic.

Every query is oracle-backed and Python-free in the data path: rank
statistics come from sorted prefix sums over *distinct-value* count
tables (cardinality ≪ row count, so the single-partition ordered window
is over the compressed domain — at 100 TB swap it for a range-partitioned
prefix-sum, same algebra), and the graph queries bound their join fan-out
by an explicit edge-weight threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register, roundz

# ---------------------------------------------------------------------------
# Shared rank helper: avg rank per distinct value via sorted prefix sums
# ---------------------------------------------------------------------------


def _avg_ranks(df: DataFrame, col: str) -> DataFrame:
    """(value, cnt, avg_rank) per distinct value of ``col``.

    Midrank = (# values strictly below) + (cnt + 1)/2 — the standard
    tie-average rank, computed on the distinct-value table so the global
    ordered window runs over the compressed domain, not the raw rows.
    """
    per = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "v",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0).alias(
            "avg_rank"
        ),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


@register(
    "ks_test_purchase_vs_view",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per AS (
      SELECT value, sum(is_a) AS ca, sum(1 - is_a) AS cb FROM ab GROUP BY value
    ),
    tot AS (
      SELECT CAST(sum(is_a) AS BIGINT) AS na,
             CAST(count(*) - sum(is_a) AS BIGINT) AS nb
      FROM ab
    ),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY value) AS cca,
             sum(cb) OVER (ORDER BY value) AS ccb
      FROM per
    ),
    d AS (
      SELECT max(abs(cca * 1.0 / na - ccb * 1.0 / nb)) AS ks FROM cum, tot
    )
    SELECT na AS n_a, nb AS n_b, round(ks, 6) AS ks_d,
           round(least(1.0, 2.0 * exp(-2.0 * (na * nb * 1.0 / (na + nb)) * ks * ks)), 6)
             AS p_value
    FROM d, tot
    """,
    doc="Two-sample Kolmogorov-Smirnov test: does the purchase value "
    "distribution differ from the view value distribution? D = max ECDF "
    "gap via cumulative counts over the distinct-value table, p from the "
    "standard asymptotic tail bound. One groupBy + one ordered prefix "
    "sum over distinct values (compressed domain); at 100 TB the prefix "
    "sum range-partitions by value with per-partition offsets.",
)
def ks_test_purchase_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    ab = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        "value",
    )
    per = ab.groupBy("value").agg(
        F.sum("is_a").alias("ca"), F.sum(F.lit(1) - F.col("is_a")).alias("cb")
    )
    # totals ride the distinct-value table as a global window — no second
    # scan of the raw events, the whole query is one linear plan
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per.select(
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        F.sum("ca").over(wall).cast("long").alias("na"),
        F.sum("cb").over(wall).cast("long").alias("nb"),
    )
    d = cum.groupBy("na", "nb").agg(
        F.max(
            F.abs(F.col("cca") / F.col("na") - F.col("ccb") / F.col("nb"))
        ).alias("ks")
    )
    en = F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))
    return d.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("ks", 6).alias("ks_d"),
        F.round(
            F.least(F.lit(1.0), 2.0 * F.exp(-2.0 * en * F.col("ks") * F.col("ks"))),
            6,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) with tie correction
# ---------------------------------------------------------------------------


@register(
    "mannwhitney_value_shift",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per AS (
      SELECT value, sum(is_a) AS ca, count(*) AS cnt FROM ab GROUP BY value
    ),
    tot AS (
      SELECT CAST(sum(is_a) AS BIGINT) AS na,
             CAST(count(*) - sum(is_a) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS n
      FROM ab
    ),
    rk AS (
      SELECT ca, cnt,
             sum(cnt) OVER (ORDER BY value) - cnt + (cnt + 1) / 2.0 AS avg_rank
      FROM per
    ),
    s AS (
      SELECT sum(ca * avg_rank) AS ra,
             sum(cnt * cnt * cnt - cnt) AS tie3
      FROM rk
    )
    SELECT na AS n_a, nb AS n_b,
           round(ra - na * (na + 1) / 2.0, 4) AS u_stat,
           round((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0 * ((n + 1) - tie3 * 1.0 / (n * (n - 1)))),
                 6) AS z_value
    FROM s, tot
    """,
    doc="Mann-Whitney U rank-sum test (purchase vs view values) with "
    "midranks and the tie-corrected normal approximation — the "
    "distribution-free alternative to welch_ttest_purchase_vs_view. "
    "Rank sums come from the distinct-value prefix-sum table "
    "(no per-row rank shuffle); ties feed the variance correction "
    "exactly. Same scale path as the KS query.",
)
def mannwhitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    ab = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        "value",
    )
    per = ab.groupBy("value").agg(
        F.sum("is_a").alias("ca"), F.count("*").alias("cnt")
    )
    # midranks + sample sizes all ride the distinct-value table (ordered
    # prefix window + global window) — one scan, one linear plan
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    rk = per.select(
        "ca",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0).alias(
            "avg_rank"
        ),
        F.sum("ca").over(wall).cast("long").alias("na"),
        (F.sum("cnt").over(wall) - F.sum("ca").over(wall)).cast("long").alias("nb"),
        F.sum("cnt").over(wall).alias("n"),
    )
    s = rk.groupBy("na", "nb", "n").agg(
        F.sum(F.col("ca") * F.col("avg_rank")).alias("ra"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie3"
        ),
    )
    na, nb, n = F.col("na"), F.col("nb"), F.col("n")
    u = F.col("ra") - na * (na + 1) / 2.0
    var = na * nb / 12.0 * ((n + 1) - F.col("tie3") * 1.0 / (n * (n - 1)))
    return s.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(u, 4).alias("u_stat"),
        F.round((u - na * nb / 2.0) / F.sqrt(var), 6).alias("z_value"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across all event types
# ---------------------------------------------------------------------------


@register(
    "kruskal_wallis_value_by_type",
    """
    WITH per AS (SELECT value, count(*) AS cnt FROM events GROUP BY value),
    rk AS (
      SELECT value, cnt,
             sum(cnt) OVER (ORDER BY value) - cnt + (cnt + 1) / 2.0 AS avg_rank
      FROM per
    ),
    j AS (
      SELECT e.event_type, r.avg_rank FROM events e JOIN rk r USING (value)
    ),
    g AS (
      SELECT event_type, count(*) AS ng, sum(avg_rank) AS rsum
      FROM j GROUP BY event_type
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
    ties AS (SELECT sum(cnt * cnt * cnt - cnt) AS t3 FROM per),
    h AS (
      SELECT CAST(count(*) AS BIGINT) AS k_groups,
             12.0 / (n * (n + 1.0)) * sum(rsum * rsum / ng) - 3.0 * (n + 1)
               AS hstat
      FROM g, tot GROUP BY n
    )
    SELECT n AS n_events, k_groups, round(hstat, 6) AS h_stat,
           round(hstat / (1.0 - t3 * 1.0 / (n * 1.0 * n * n - n)), 6) AS h_adj
    FROM h, tot, ties
    """,
    doc="Kruskal-Wallis H test: do the five event types draw their "
    "values from the same distribution? One scan grouped by (value, "
    "event_type); per-value tie blocks and the <=v cumulative come from "
    "partition/RANGE windows over that compressed table, so per-group "
    "rank sums need no join back to raw rows. The exact tie-correction "
    "divisor falls out of a first-row-per-value flag; the H reduction "
    "is 5 rows.",
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # one scan: group by (value, event_type), then recover per-value
    # totals with a partition window and the <=v cumulative with a RANGE
    # frame (peers included), so midranks never need a join back to rows
    per2 = ev.groupBy("value", "event_type").agg(F.count("*").alias("cg"))
    wv = Window.partitionBy("value")
    wr = Window.orderBy("value").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rv = Window.partitionBy("value").orderBy("event_type")
    r = per2.select(
        "event_type",
        "cg",
        F.sum("cg").over(wv).alias("cv"),
        F.sum("cg").over(wr).alias("cum_le"),
        F.row_number().over(rv).alias("rv"),
    ).select(
        "event_type",
        "cg",
        (F.col("cum_le") - F.col("cv") + (F.col("cv") + 1) / 2.0).alias("avg_rank"),
        F.when(
            F.col("rv") == 1,
            F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"),
        )
        .otherwise(0)
        .alias("t3p"),
    )
    g = r.groupBy("event_type").agg(
        F.sum("cg").alias("ng"),
        F.sum(F.col("cg") * F.col("avg_rank")).alias("rsum"),
        F.sum("t3p").alias("t3g"),
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count("*").alias("k_groups"),
        F.sum(F.col("rsum") * F.col("rsum") / F.col("ng")).alias("hsum"),
        F.sum("t3g").alias("t3"),
    )
    n = F.col("n")
    hstat = 12.0 / (n * (n + 1.0)) * F.col("hsum") - 3.0 * (n + 1)
    return tot.select(
        n.alias("n_events"),
        F.col("k_groups").cast("long").alias("k_groups"),
        F.round(hstat, 6).alias("h_stat"),
        F.round(
            hstat / (1.0 - F.col("t3") * 1.0 / (n * 1.0 * n * n - n)), 6
        ).alias("h_adj"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (lineitem quantity vs extended price)
# ---------------------------------------------------------------------------


@register(
    "spearman_qty_price_corr",
    """
    WITH rq AS (SELECT l_quantity AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
    rqr AS (
      SELECT v, sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS rnk FROM rq
    ),
    rp AS (SELECT l_extendedprice AS v, count(*) AS cnt FROM lineitem GROUP BY 1),
    rpr AS (
      SELECT v, sum(cnt) OVER (ORDER BY v) - cnt + (cnt + 1) / 2.0 AS rnk FROM rp
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(corr(q.rnk, p.rnk), 6) AS spearman_rho
    FROM lineitem l
    JOIN rqr q ON l.l_quantity = q.v
    JOIN rpr p ON l.l_extendedprice = p.v
    """,
    doc="Spearman rank correlation between l_quantity and "
    "l_extendedprice: midranks per column via distinct-value prefix "
    "sums, Pearson corr of the ranks. The quantity rank table is ~50 "
    "rows (broadcast); the price rank table shuffles once on its join "
    "key. Monotone-association sibling of acctbal_spend_corr.",
)
def spearman_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rq = _avg_ranks(li, "l_quantity").select(
        F.col("v").alias("l_quantity"), F.col("avg_rank").alias("rnk_q")
    )
    rp = _avg_ranks(li, "l_extendedprice").select(
        F.col("v").alias("l_extendedprice"), F.col("avg_rank").alias("rnk_p")
    )
    j = li.select("l_quantity", "l_extendedprice").join(
        F.broadcast(rq), "l_quantity"
    ).join(rp, "l_extendedprice")
    return j.agg(
        F.count("*").alias("n"),
        F.round(F.corr("rnk_q", "rnk_p"), 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b on a deterministic hash sample
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_sampled",
    """
    WITH s AS (
      SELECT l_orderkey * 10 + l_linenumber AS k,
             l_quantity AS x, l_extendedprice AS y
      FROM lineitem WHERE l_orderkey % 199 = 0
    ),
    p AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS d,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM s a JOIN s b ON a.k < b.k
    ),
    t AS (
      SELECT CAST(sum(c) AS BIGINT) AS c, CAST(sum(d) AS BIGINT) AS d,
             CAST(sum(tx) AS BIGINT) AS tx, CAST(sum(ty) AS BIGINT) AS ty,
             CAST(count(*) AS BIGINT) AS n0
      FROM p
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n,
           c AS concordant, d AS discordant,
           round((c - d) / sqrt((n0 - tx) * 1.0 * (n0 - ty)), 6) AS tau_b
    FROM t
    """,
    doc="Kendall tau-b (tie-adjusted) between l_quantity and "
    "l_extendedprice on a deterministic 1/199 orderkey sample — the "
    "pairwise O(n^2) definition stays tractable because the sample is "
    "fixed-rate; Spark broadcasts the sampled side into a nested-loop "
    "self-join. At 100 TB the exact statistic swaps to the O(n log n) "
    "merge-sort inversion count per sorted run; the sampled estimator "
    "here is itself the scale answer (sqrt-n error).",
)
def kendall_tau_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 199 == 0)
    s = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    # sample size as a broadcast 1-row scalar — not a global window
    # over the sampled rows (the sample is fixed-RATE, so it still
    # scales with the data; an empty partition spec would funnel it
    # through one WindowExec task — r9 plan-audit guard)
    n_row = s.agg(F.count("*").alias("n"))
    a, b = s.alias("a"), s.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    prod = (ax - bx) * (ay - by)
    p = a.join(F.broadcast(b), F.col("a.k") < F.col("b.k")).select(
        F.when(prod > 0, 1).otherwise(0).alias("c"),
        F.when(prod < 0, 1).otherwise(0).alias("d"),
        F.when(ax == bx, 1).otherwise(0).alias("tx"),
        F.when(ay == by, 1).otherwise(0).alias("ty"),
    )
    t = p.agg(
        F.sum("c").alias("c"),
        F.sum("d").alias("d"),
        F.sum("tx").alias("tx"),
        F.sum("ty").alias("ty"),
        F.count("*").alias("n0"),
    ).crossJoin(F.broadcast(n_row))
    n0, tx, ty = F.col("n0"), F.col("tx"), F.col("ty")
    return t.select(
        "n",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d")) / F.sqrt((n0 - tx) * 1.0 * (n0 - ty)), 6
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-type median-shift tests
# ---------------------------------------------------------------------------


@register(
    "benjamini_hochberg_types",
    """
    WITH med AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS m FROM events
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY event_type
    ),
    p AS (
      SELECT event_type, ng, k * 1.0 / ng AS phat,
             least(1.0, 2.0 * exp(-2.0 * ng * (k * 1.0 / ng - 0.5)
                                         * (k * 1.0 / ng - 0.5))) AS pval
      FROM g
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY pval, event_type) AS bh_rank,
             count(*) OVER () AS m FROM p
    ),
    kmax AS (
      SELECT r.*, max(CASE WHEN pval <= bh_rank * 0.10 / m THEN bh_rank
                           ELSE 0 END) OVER () AS kx
      FROM r
    )
    SELECT event_type, ng AS n_events, round(phat, 6) AS phat,
           round(pval, 6) AS p_value, CAST(bh_rank AS BIGINT) AS bh_rank,
           bh_rank <= kx AS rejected
    FROM kmax ORDER BY bh_rank
    """,
    doc="Benjamini-Hochberg step-up FDR control (alpha=0.10) over five "
    "simultaneous median-shift tests: per event type, the share of "
    "values above the global median, with a Hoeffding-bound p-value "
    "(distribution-free, closed form — computable identically on both "
    "engines with exp alone). The BH step-up is two ordered windows "
    "over 5 rows; the data-scale work is one grouped scan + one exact "
    "median.",
)
def benjamini_hochberg_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    med = ev.agg(F.expr("percentile(value, 0.5)").alias("m"))
    g = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("ng"),
            F.sum(F.when(F.col("value") > F.col("m"), 1).otherwise(0)).alias("k"),
        )
    )
    phat = F.col("k") * 1.0 / F.col("ng")
    p = g.select(
        "event_type",
        "ng",
        phat.alias("phat"),
        F.least(
            F.lit(1.0),
            2.0 * F.exp(-2.0 * F.col("ng") * (phat - 0.5) * (phat - 0.5)),
        ).alias("pval"),
    )
    wo = Window.orderBy("pval", "event_type")
    wall = Window.partitionBy()
    r = p.select(
        "*",
        F.row_number().over(wo).alias("bh_rank"),
        F.count("*").over(wall).alias("m"),
    )
    kx = F.max(
        F.when(
            F.col("pval") <= F.col("bh_rank") * 0.10 / F.col("m"), F.col("bh_rank")
        ).otherwise(0)
    ).over(wall)
    return (
        r.withColumn("kx", kx)
        .select(
            "event_type",
            F.col("ng").alias("n_events"),
            F.round("phat", 6).alias("phat"),
            F.round("pval", 6).alias("p_value"),
            F.col("bh_rank").cast("long").alias("bh_rank"),
            (F.col("bh_rank") <= F.col("kx")).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily event-count series
# ---------------------------------------------------------------------------


@register(
    "cusum_changepoint_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    m AS (SELECT avg(x) AS mu FROM d),
    c AS (
      SELECT day, x,
             sum(x) OVER (ORDER BY day)
               - row_number() OVER (ORDER BY day) * mu AS cusum
      FROM d, m
    )
    SELECT day, x, round(cusum, 6) + 0.0 AS cusum,
           abs(cusum) = max(abs(cusum)) OVER () AS is_peak
    FROM c ORDER BY day
    """,
    doc="CUSUM changepoint detector on daily event counts: cumulative "
    "deviation from the series mean, with the |CUSUM| peak (the "
    "max-likelihood single changepoint under a mean-shift model) "
    "flagged. Integer daily counts make the statistic bit-deterministic "
    "across engines. The series is one grouped scan; the window runs "
    "over n_days rows only. The LAST row's cusum is mathematically "
    "zero (sum - n*mu) but its float sign is accumulation-order "
    "dependent (-0.0 in DuckDB at sf0.001) — sign-normalized via "
    "roundz / + 0.0 (registry.py signed-zero contract).",
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("x"))
    # series mean rides the daily table as a global window (one scan)
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = d.select(
        "day",
        "x",
        (
            F.sum("x").over(wd)
            - F.row_number().over(Window.orderBy("day")) * F.avg("x").over(wall)
        ).alias("cusum"),
    )
    wall = Window.partitionBy()
    return c.select(
        "day",
        "x",
        roundz(F.col("cusum")).alias("cusum"),
        (F.abs("cusum") == F.max(F.abs("cusum")).over(wall)).alias("is_peak"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Pettitt rank changepoint over daily distinct users
# ---------------------------------------------------------------------------


@register(
    "pettitt_changepoint",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    ix AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS i,
             count(*) OVER () AS n
      FROM d
    ),
    pr AS (
      SELECT a.i AS ai, b.i AS bi,
             CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END AS sg
      FROM ix a JOIN ix b ON a.i < b.i
    ),
    u AS (
      SELECT t.i AS ti, t.day, CAST(sum(p.sg) AS BIGINT) AS ut
      FROM ix t JOIN pr p ON p.ai <= t.i AND t.i < p.bi
      GROUP BY t.i, t.day
    ),
    mx AS (SELECT max(abs(ut)) AS k FROM u)
    SELECT (SELECT CAST(max(n) AS BIGINT) FROM ix) AS n_days,
           CAST(k AS BIGINT) AS k_stat,
           (SELECT min(day) FROM u WHERE abs(ut) = (SELECT k FROM mx)) AS cp_day,
           round(least(1.0, 2.0 * exp(-6.0 * k * k
                 / ((SELECT max(n) FROM ix) * 1.0 * (SELECT max(n) FROM ix)
                    * ((SELECT max(n) FROM ix) + 1)))), 6) AS p_approx
    FROM mx
    """,
    doc="Pettitt nonparametric changepoint test on daily distinct-user "
    "counts: U_t sums sign(x_i - x_j) over pairs straddling t (the "
    "oracle computes that literal pairwise form); the Spark plan uses "
    "the exact midrank identity U_t = 2*S_t - t(n+1) (S_t = cumulative "
    "midrank sum), so the whole statistic is windows over the daily "
    "table — one scan, no self-join, and O(n log n) at any series "
    "length. Integer series -> deterministic signs/ranks. The |U| peak "
    "is the changepoint, with the standard exp tail approximation.",
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("x")
    )
    # midrank of x_i among all days: <=x cumulative via RANGE frame
    # (peers included) minus the tie block, plus (ties+1)/2
    wx = Window.partitionBy("x")
    wr = Window.orderBy("x").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    wday = Window.orderBy("day")
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    r = d.select(
        "day",
        (
            F.sum(F.lit(1)).over(wr)
            - F.count("*").over(wx)
            + (F.count("*").over(wx) + 1) / 2.0
        ).alias("rnk"),
        F.count("*").over(wall).alias("n"),
    )
    # U_t = 2*S_t - t(n+1); defined for t = 1..n-1
    u = r.select(
        "day",
        "n",
        (
            2.0 * F.sum("rnk").over(wcum)
            - F.row_number().over(wday) * (F.col("n") + 1.0)
        ).alias("ut"),
        F.row_number().over(wday).alias("t"),
    ).where(F.col("t") < F.col("n"))
    u2 = u.withColumn("mx", F.max(F.abs("ut")).over(wall))
    res = u2.groupBy("n", "mx").agg(
        F.min(F.when(F.abs("ut") == F.col("mx"), F.col("day"))).alias("cp_day")
    )
    k, n = F.col("mx"), F.col("n")
    return res.select(
        n.alias("n_days"),
        k.cast("long").alias("k_stat"),
        "cp_day",
        F.round(
            F.least(
                F.lit(1.0),
                2.0 * F.exp(-6.0 * k * k / (n * 1.0 * n * (n + 1))),
            ),
            6,
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# Supplier co-supply graph: triangle count + clustering coefficient
# ---------------------------------------------------------------------------

_CO_SUPPLY_PS = """
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 1
"""


@register(
    "triangle_count_suppliers",
    f"""
    WITH ps AS ({_CO_SUPPLY_PS}),
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
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS t
      FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    wdg AS (SELECT CAST(sum(dg * (dg - 1) / 2) AS BIGINT) AS w FROM deg)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           t AS n_triangles, w AS n_wedges,
           round(3.0 * t / w, 6) AS global_clustering
    FROM tri, wdg
    """,
    doc="Triangle count + global clustering coefficient of the supplier "
    "co-supply graph (suppliers are adjacent when they ship >= 2 "
    "distinct p_size=1 parts in common — the weight threshold keeps the "
    "graph sparse). Triangles enumerate via the id-ordered orientation "
    "(each triangle counted once); at 100 TB the orientation switches "
    "to degree-ordering so the wedge join fans out from low-degree "
    "endpoints, and the edge build shuffles once on partkey.",
)
def triangle_count_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
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
        .agg(F.count("*").alias("dg"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1")) & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .agg(F.count("*").alias("t"))
    )
    wdg = deg.agg(
        F.sum(F.col("dg") * (F.col("dg") - 1) / 2).cast("long").alias("w")
    )
    nn = deg.agg(F.count("*").alias("n_nodes"))
    ne = e.agg(F.count("*").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wdg))
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.col("w").alias("n_wedges"),
            F.round(3.0 * F.col("t") / F.col("w"), 6).alias("global_clustering"),
        )
    )


# ---------------------------------------------------------------------------
# Jaccard link prediction over the same co-supply graph
# ---------------------------------------------------------------------------


@register(
    "jaccard_supplier_pairs",
    f"""
    WITH ps AS ({_CO_SUPPLY_PS}),
    cardv AS (SELECT sk, CAST(count(*) AS BIGINT) AS c FROM ps GROUP BY sk),
    inter AS (
      SELECT a.sk AS s1, b.sk AS s2, CAST(count(*) AS BIGINT) AS shared
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
      GROUP BY 1, 2
    ),
    j AS (
      SELECT s1, s2, shared, ca.c AS c1, cb.c AS c2,
             shared * 1.0 / (ca.c + cb.c - shared) AS jac
      FROM inter JOIN cardv ca ON ca.sk = s1 JOIN cardv cb ON cb.sk = s2
    )
    SELECT s1, s2, shared, c1, c2, round(jac, 6) AS jaccard
    FROM j ORDER BY jac DESC, s1, s2 LIMIT 20
    """,
    doc="Top-20 supplier pairs by Jaccard similarity of their p_size=1 "
    "part sets — set-overlap link prediction on the co-supply graph. "
    "Intersections come from one partkey-join + pair groupBy; "
    "cardinalities broadcast back. Exact integer-ratio scores make the "
    "top-k order engine-deterministic. At 100 TB the pair generation "
    "prunes via the same >=2-shared threshold before ranking.",
)
def jaccard_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").where(F.col("p_size") == 1)
    ps = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .cache()
    )
    cardv = ps.groupBy("sk").agg(F.count("*").alias("c"))
    a, b = ps.alias("a"), ps.alias("b")
    inter = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .groupBy(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .agg(F.count("*").alias("shared"))
    )
    j = (
        inter.join(
            F.broadcast(cardv.select(F.col("sk").alias("s1"), F.col("c").alias("c1"))),
            "s1",
        )
        .join(
            F.broadcast(cardv.select(F.col("sk").alias("s2"), F.col("c").alias("c2"))),
            "s2",
        )
        .withColumn(
            "jac", F.col("shared") * 1.0 / (F.col("c1") + F.col("c2") - F.col("shared"))
        )
    )
    return (
        j.orderBy(F.desc("jac"), "s1", "s2")
        .limit(20)
        .select("s1", "s2", "shared", "c1", "c2", F.round("jac", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# RiskMetrics EWMA volatility per event-type daily series
# ---------------------------------------------------------------------------


@register(
    "ewma_volatility",
    """
    WITH px AS (
      SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS p
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, day,
             ln(p / lag(p) OVER (PARTITION BY event_type ORDER BY day)) AS r
      FROM px
    ),
    rr AS (
      SELECT event_type, day, r,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM r WHERE r IS NOT NULL
    ),
    v AS (
      SELECT a.event_type, a.day,
             sum(0.06 * power(0.94, a.i - b.i) * b.r * b.r) AS var
      FROM rr a JOIN rr b ON a.event_type = b.event_type AND b.i <= a.i
      GROUP BY 1, 2
    )
    SELECT event_type, day, round(sqrt(var), 6) AS ewma_vol
    FROM v ORDER BY event_type, day
    """,
    doc="RiskMetrics EWMA volatility (lambda=0.94) of daily log returns "
    "per event-type mean-value series — the exponentially-recursive "
    "cousin of the reference's SMA/EMA indicators "
    "(batch_processor.py step 7), expressed in closed form as a "
    "geometric-weight cumulative window (var_t = 0.06 * 0.94^t * "
    "cumsum(0.94^-j r_j^2)) so no sequential state and no self-join is "
    "needed — one scan, keyed windows only. The rescaling trick is "
    "exact here (30-day series); for multi-year series 0.94^-j "
    "overflows double precision around j~10^4, so the scale path "
    "re-bases the exponent per fixed-size segment (same algebra, "
    "segment-local j).",
)
def ewma_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    px = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("p")
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    r = px.select(
        "event_type", "day", F.log(F.col("p") / F.lag("p").over(wk)).alias("r")
    ).where(F.col("r").isNotNull())
    rr = r.select("*", F.row_number().over(wk).alias("i"))
    wcum = wk.rowsBetween(Window.unboundedPreceding, 0)
    v = rr.select(
        "event_type",
        "day",
        (
            0.06
            * F.pow(F.lit(0.94), F.col("i"))
            * F.sum(
                F.pow(F.lit(0.94), -F.col("i")) * F.col("r") * F.col("r")
            ).over(wcum)
        ).alias("var"),
    )
    return v.select(
        "event_type", "day", F.round(F.sqrt("var"), 6).alias("ewma_vol")
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# CDC apply: last-writer-wins upserts with tombstones
# ---------------------------------------------------------------------------


@register(
    "cdc_merge_apply",
    """
    WITH ops AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del, value
      FROM events
      WHERE event_type IN ('signup', 'purchase', 'click', 'error')
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM ops
    ),
    agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops,
             CAST(sum(is_del) AS BIGINT) AS n_deletes
      FROM ops GROUP BY user_id
    )
    SELECT a.user_id, a.n_ops, a.n_deletes,
           r.is_del = 0 AS alive,
           CASE WHEN r.is_del = 0 THEN round(r.value, 6) END AS final_value,
           r.ts AS last_op_ts
    FROM agg a JOIN ranked r ON r.user_id = a.user_id AND r.rn = 1
    ORDER BY a.user_id
    """,
    doc="CDC changelog apply with last-writer-wins + tombstone "
    "semantics: signup/purchase/click are upserts, error is a delete; "
    "a key is alive iff its latest op (total order ts, event_id) is an "
    "upsert — the doc_id-upsert semantics of the reference's "
    "Elasticsearch sink (stream_processor.py:135-155) made explicit, "
    "with delete support the reference lacks. One shuffle on user_id "
    "serves both the latest-op window and the op-count aggregate; at "
    "100 TB this is the standard merge-on-read compaction kernel.",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase", "click", "error")
    )
    ops = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_del"),
        "value",
    )
    wu = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wkey = Window.partitionBy("user_id")
    # op counts ride the same user_id partition window as the latest-op
    # row_number: one shuffle, one scan, no groupBy+join-back
    ranked = ops.select(
        "*",
        F.row_number().over(wu).alias("rn"),
        F.count("*").over(wkey).alias("n_ops"),
        F.sum("is_del").over(wkey).alias("n_deletes"),
    )
    latest = ranked.where(F.col("rn") == 1)
    return (
        latest
        .select(
            "user_id",
            "n_ops",
            "n_deletes",
            (F.col("is_del") == 0).alias("alive"),
            F.when(F.col("is_del") == 0, F.round("value", 6)).alias("final_value"),
            F.col("ts").alias("last_op_ts"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# STL-style seasonal decomposition of daily traffic
# ---------------------------------------------------------------------------


@register(
    "stl_decompose_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT day, y,
             avg(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wn,
             CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) % 7 AS wd
      FROM d
    ),
    ft AS (SELECT * FROM t WHERE wn = 7),
    s AS (SELECT wd, avg(y - trend) AS raw_seas FROM ft GROUP BY wd),
    sc AS (
      SELECT wd, raw_seas - (SELECT avg(raw_seas) FROM s) AS seas FROM s
    )
    SELECT f.day, f.y, round(f.trend, 6) AS trend,
           round(sc.seas, 6) AS seasonal,
           round(f.y - f.trend - sc.seas, 6) AS resid
    FROM ft f JOIN sc ON f.wd = sc.wd ORDER BY f.day
    """,
    doc="Additive STL-style decomposition of the daily event-count "
    "series: trend = centered 7-day moving average (full windows "
    "only), seasonal = weekday-mean of the detrended series re-centered "
    "to sum to zero, remainder = y - trend - seasonal. Weekday index is "
    "an absolute day-diff mod 7 so both engines agree on alignment. "
    "One grouped scan at row scale; everything after runs on n_days "
    "rows.",
)
def stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("y"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "day",
        "y",
        F.avg("y").over(w7).alias("trend"),
        F.count("*").over(w7).alias("wn"),
        (F.datediff("day", F.lit("2024-01-01")).cast("long") % 7).alias("wd"),
    )
    ft = t.where(F.col("wn") == 7)
    # weekday means and their grand mean ride the full-window table as
    # partition/global windows (first-row-per-weekday flags give the
    # mean-of-means) — one scan, no groupBy branches to join back
    wwd = Window.partitionBy("wd")
    wall = Window.partitionBy()
    f2 = ft.select(
        "day",
        "y",
        "trend",
        F.avg(F.col("y") - F.col("trend")).over(wwd).alias("raw_wd"),
        F.row_number().over(Window.partitionBy("wd").orderBy("day")).alias("rnwd"),
    )
    first = F.when(F.col("rnwd") == 1, F.col("raw_wd"))
    sm = F.sum(first).over(wall) / F.count(first).over(wall)
    f3 = f2.withColumn("seas", F.col("raw_wd") - sm)
    return (
        f3
        .select(
            "day",
            "y",
            F.round("trend", 6).alias("trend"),
            F.round("seas", 6).alias("seasonal"),
            F.round(F.col("y") - F.col("trend") - F.col("seas"), 6).alias("resid"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on daily purchase counts
# ---------------------------------------------------------------------------


@register(
    "mann_kendall_trend",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    ix AS (
      SELECT x, row_number() OVER (ORDER BY day) AS i, count(*) OVER () AS n
      FROM d
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM ix a JOIN ix b ON a.i < b.i
    ),
    ties AS (
      SELECT coalesce(sum(t * (t - 1.0) * (2 * t + 5.0)), 0.0) AS tt
      FROM (SELECT count(*) AS t FROM d GROUP BY x HAVING count(*) > 1)
    ),
    v AS (
      SELECT (max(n) * (max(n) - 1.0) * (2 * max(n) + 5.0) - max(tt)) / 18.0
               AS var_s,
             CAST(max(n) AS BIGINT) AS n
      FROM ix, ties
    )
    SELECT n AS n_days, s.s AS s_stat, round(var_s, 6) AS var_s,
           round(CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var_s)
                      WHEN s.s < 0 THEN (s.s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_value,
           CASE WHEN (CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var_s)
                           WHEN s.s < 0 THEN (s.s + 1) / sqrt(var_s)
                           ELSE 0.0 END) > 1.959964 THEN 'increasing'
                WHEN (CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(var_s)
                           WHEN s.s < 0 THEN (s.s + 1) / sqrt(var_s)
                           ELSE 0.0 END) < -1.959964 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM s, v
    """,
    doc="Mann-Kendall monotone-trend test on daily purchase counts: "
    "S sums sign(x_j - x_i) over ordered pairs, variance carries the "
    "exact tie correction, z uses the continuity-corrected normal "
    "approximation with a 5% two-sided trend verdict. Integer daily "
    "counts -> deterministic signs. All pairwise work runs on the "
    "cached n_days-row aggregate (one row-scale scan); at 100 TB the "
    "pair join over a long series swaps to merge-sort inversion "
    "counting, same as Kendall tau.",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    ).cache()
    ix = d.select(
        "x",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    a, b = ix.alias("a"), ix.alias("b")
    s = a.join(F.broadcast(b.drop("n")), F.col("a.i") < F.col("b.i")).groupBy(
        "a.n"
    ).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        ).alias("s")
    )
    ties = (
        d.groupBy("x")
        .agg(F.count("*").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1.0) * (2 * F.col("t") + 5.0)),
                F.lit(0.0),
            ).alias("tt")
        )
    )
    n = F.col("n").cast("double")
    var_s = (n * (n - 1.0) * (2 * n + 5.0) - F.col("tt")) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return (
        s.crossJoin(F.broadcast(ties))
        .withColumn("var_s", var_s)
        .withColumn("z", z)
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            F.round("var_s", 6).alias("var_s"),
            F.round("z", 6).alias("z_value"),
            F.when(F.col("z") > 1.959964, "increasing")
            .when(F.col("z") < -1.959964, "decreasing")
            .otherwise("no trend")
            .alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic hash-seeded bootstrap CI for the mean daily purchase value
# ---------------------------------------------------------------------------

_BOOT_B = 400  # bootstrap replicates


@register(
    "bootstrap_mean_ci",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, avg(value) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    ix AS (
      SELECT x, row_number() OVER (ORDER BY day) AS i, count(*) OVER () AS n
      FROM d
    ),
    grid AS (
      SELECT b.b, t.i AS t, ix.n,
             CAST(floor(((('0x' || substr(md5(CAST(b.b AS VARCHAR) || '_' ||
                    CAST(t.i AS VARCHAR) || '|boot1'), 1, 12))::BIGINT + 0.5)
                    / 281474976710656.0) * ix.n) AS BIGINT) + 1 AS idx
      FROM (SELECT unnest(range(1, {_BOOT_B} + 1)) AS b) b,
           (SELECT i FROM ix) t, (SELECT max(n) AS n FROM ix) ix
    ),
    reps AS (
      SELECT g.b, avg(s.x) AS m
      FROM grid g JOIN ix s ON s.i = g.idx
      GROUP BY g.b
    )
    SELECT (SELECT CAST(max(n) AS BIGINT) FROM ix) AS n_days,
           CAST({_BOOT_B} AS BIGINT) AS n_reps,
           round((SELECT avg(x) FROM d), 6) AS mean_obs,
           round(percentile_cont(0.025) WITHIN GROUP (ORDER BY m), 6) AS ci_lo,
           round(percentile_cont(0.975) WITHIN GROUP (ORDER BY m), 6) AS ci_hi,
           round(stddev_samp(m), 6) AS se_boot
    FROM reps
    """,
    doc="Nonparametric bootstrap CI (95%, percentile method, B=400) for "
    "the mean of the daily purchase-value series. Resampling indices "
    "are md5-seeded (operators/privacy.hash_uniform parity pair), so "
    "both engines draw the SAME replicates and the oracle replays the "
    "CI bit-for-bit — the same determinism discipline as the DP "
    "release family. The raw scan feeds one 30-row daily aggregate; "
    "the B*n replicate grid explodes from the cached series and "
    "broadcast-joins back, so bootstrap cost is independent of corpus "
    "size. At 100 TB the same pattern bootstraps any |groups|-sized "
    "aggregate; resampling raw rows instead uses Poisson(1) hash "
    "weights per row (one scan, no grid).",
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import hash_uniform

    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("x")
    ).cache()
    ix = d.select(
        "x",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    grid = ix.select(
        "i", "n", F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b")
    ).select(
        "b",
        "n",
        (
            F.floor(
                hash_uniform(
                    F.concat_ws(
                        "_", F.col("b").cast("string"), F.col("i").cast("string")
                    ),
                    "boot1",
                )
                * F.col("n")
            )
            + 1
        ).alias("idx"),
    )
    reps = (
        grid.join(F.broadcast(ix.select(F.col("i").alias("idx"), "x")), "idx")
        .groupBy("b")
        .agg(F.avg("x").alias("m"))
    )
    mean_obs = d.agg(F.round(F.avg("x"), 6).alias("mean_obs"))
    nd = ix.agg(F.max("n").alias("n_days"))
    out = reps.agg(
        F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        F.round(F.stddev_samp("m"), 6).alias("se_boot"),
    )
    return (
        out.crossJoin(F.broadcast(mean_obs))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            F.lit(_BOOT_B).cast("long").alias("n_reps"),
            "mean_obs",
            "ci_lo",
            "ci_hi",
            "se_boot",
        )
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------


@register(
    "hurst_rs_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    ix AS (SELECT x, row_number() OVER (ORDER BY day) AS i FROM d),
    g AS (
      SELECT w.w, ix.i, ix.x,
             CAST(floor((ix.i - 1.0) / w.w) AS BIGINT) AS chunk
      FROM ix, (SELECT unnest([5, 10, 15, 30]) AS w) w
    ),
    c AS (
      SELECT w, chunk, i, x,
             avg(x) OVER (PARTITION BY w, chunk) AS mu,
             stddev_pop(x) OVER (PARTITION BY w, chunk) AS sd,
             count(*) OVER (PARTITION BY w, chunk) AS cn
      FROM g
    ),
    cum AS (
      SELECT w, chunk, sd, cn,
             sum(x - mu) OVER (PARTITION BY w, chunk ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS dev
      FROM c
    ),
    rs AS (
      SELECT w, chunk,
             (max(dev) - min(dev)) / max(sd) AS rs
      FROM cum WHERE cn = w AND sd > 0
      GROUP BY w, chunk
    ),
    rw AS (SELECT w, avg(rs) AS rs_mean, count(*) AS n_chunks FROM rs GROUP BY w),
    ols AS (
      SELECT (count(*) * sum(ln(w) * ln(rs_mean)) - sum(ln(w)) * sum(ln(rs_mean)))
             / (count(*) * sum(ln(w) * ln(w)) - sum(ln(w)) * sum(ln(w))) AS h
      FROM rw
    )
    SELECT rw.w, CAST(rw.n_chunks AS BIGINT) AS n_chunks,
           round(rw.rs_mean, 6) AS rs_mean, round(ols.h, 6) AS hurst
    FROM rw, ols ORDER BY rw.w
    """,
    doc="Hurst exponent by rescaled-range analysis of the daily "
    "event-count series: for window sizes {5,10,15,30}, each full "
    "chunk's range of cumulative mean-deviations over its std gives "
    "R/S; H is the log-log OLS slope of mean R/S vs window size "
    "(H=0.5 random walk, >0.5 persistent). The raw scan feeds one "
    "daily aggregate; the 4x replication and all chunk statistics are "
    "windows over the n_days-row series. H rides every output row via "
    "a closed-form OLS aggregate.",
)
def hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("x"))
    ix = d.select("x", F.row_number().over(Window.orderBy("day")).alias("i"))
    g = ix.select(
        "i", "x", F.explode(F.array(*[F.lit(w) for w in (5, 10, 15, 30)])).alias("w")
    ).withColumn("chunk", F.floor((F.col("i") - 1) / F.col("w")).cast("long"))
    wc = Window.partitionBy("w", "chunk")
    wcum = wc.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "w",
        "chunk",
        "i",
        "x",
        F.avg("x").over(wc).alias("mu"),
        F.stddev_pop("x").over(wc).alias("sd"),
        F.count("*").over(wc).alias("cn"),
    )
    cum = c.select(
        "w",
        "chunk",
        "sd",
        "cn",
        F.sum(F.col("x") - F.col("mu")).over(wcum).alias("dev"),
    )
    rs = (
        cum.where((F.col("cn") == F.col("w")) & (F.col("sd") > 0))
        .groupBy("w", "chunk")
        .agg(((F.max("dev") - F.min("dev")) / F.max("sd")).alias("rs"))
    )
    rw = rs.groupBy("w").agg(
        F.avg("rs").alias("rs_mean"), F.count("*").alias("n_chunks")
    )
    # the log-log OLS slope rides the 4-row per-window table as global
    # window aggregates — one linear plan, no branch re-executing the chain
    lw, lr = F.log(F.col("w")), F.log(F.col("rs_mean"))
    wall = Window.partitionBy()
    cnt = F.count("*").over(wall)
    h = (cnt * F.sum(lw * lr).over(wall) - F.sum(lw).over(wall) * F.sum(lr).over(wall)) / (
        cnt * F.sum(lw * lw).over(wall) - F.sum(lw).over(wall) * F.sum(lw).over(wall)
    )
    return (
        rw.withColumn("h", h)
        .select(
            "w",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.round("rs_mean", 6).alias("rs_mean"),
            F.round("h", 6).alias("hurst"),
        )
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# Ljung-Box white-noise test over the hourly mean-value series
# ---------------------------------------------------------------------------


@register(
    "ljung_box_hourly",
    """
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
             avg(value) AS v
      FROM events GROUP BY 1
    ),
    ix0 AS (
      SELECT v, row_number() OVER (ORDER BY h) AS i,
             count(*) OVER () AS n, avg(v) OVER () AS xbar
      FROM hourly
    ),
    ix AS (
      SELECT v, i, n, xbar,
             sum((v - xbar) * (v - xbar)) OVER () AS ss
      FROM ix0
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS lag),
    rho AS (
      SELECT l.lag, max(a.n) AS n,
             sum((a.v - a.xbar) * (b.v - b.xbar)) / max(a.ss) AS r
      FROM lags l
      JOIN ix a ON a.i > l.lag
      JOIN ix b ON b.i = a.i - l.lag
      GROUP BY l.lag
    ),
    rho2 AS (
      SELECT lag, r, max(n) OVER () AS nn FROM rho
    )
    SELECT lag, round(r, 6) AS rho,
           round(nn * (nn + 2.0)
                 * sum(r * r / (nn - lag))
                     OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 6) AS q_cum
    FROM rho2 ORDER BY lag
    """,
    doc="Ljung-Box white-noise test on the hourly mean-value series: "
    "positional autocorrelations rho_k (standard covariance estimator, "
    "global mean/SS via windows) for lags 1..10, with the cumulative "
    "Q_m = n(n+2) sum rho_k^2/(n-k) per lag — reject white noise when "
    "Q_m exceeds chi-square(m). The raw scan feeds one hourly "
    "aggregate (cached); lag pairing joins the 720-row series to "
    "itself positionally. Companion to acf_value_lags (which reports "
    "Pearson-of-pairs ACF).",
)
def ljung_box_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_micros

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (F.floor(epoch_micros(F.date_trunc("hour", F.col("ts"))) / 3_600_000_000)).alias("h")
    ).agg(F.avg("value").alias("v")).cache()
    wall = Window.partitionBy()
    ix = hourly.select(
        "v",
        F.row_number().over(Window.orderBy("h")).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.avg("v").over(wall).alias("xbar"),
        F.sum(
            (F.col("v") - F.avg("v").over(wall))
            * (F.col("v") - F.avg("v").over(wall))
        )
        .over(wall)
        .alias("ss"),
    )
    lags = spark.range(1, 11).select(F.col("id").cast("int").alias("lag"))
    a, b = ix.alias("a"), ix.alias("b")
    rho = (
        F.broadcast(lags)
        .join(a, F.col("a.i") > F.col("lag"))
        .join(b, F.col("b.i") == F.col("a.i") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.max("a.n").alias("n"),
            (
                F.sum(
                    (F.col("a.v") - F.col("a.xbar"))
                    * (F.col("b.v") - F.col("b.xbar"))
                )
                / F.max("a.ss")
            ).alias("r"),
        )
    )
    wl = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    nw = F.max("n").over(Window.partitionBy())
    return rho.select(
        "lag",
        F.round("r", 6).alias("rho"),
        F.round(
            nw * (nw + 2.0) * F.sum(F.col("r") * F.col("r") / (nw - F.col("lag"))).over(wl),
            6,
        ).alias("q_cum"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily count series
# ---------------------------------------------------------------------------


@register(
    "runs_test_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med FROM d
    ),
    s AS (
      SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS sgn
      FROM d, med WHERE x <> med
    ),
    r AS (
      SELECT sgn,
             CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                  OR sgn <> lag(sgn) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS new_run
      FROM s
    ),
    agg AS (
      SELECT CAST(sum(sgn) AS BIGINT) AS n1,
             CAST(count(*) - sum(sgn) AS BIGINT) AS n2,
             CAST(sum(new_run) AS BIGINT) AS runs
      FROM r
    )
    SELECT n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))),
                 6) AS z_value
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test for randomness of the daily "
    "event-count series: dichotomize around the series median "
    "(median-equal days dropped, as is standard), count sign runs via "
    "one lag window, and compare to the exact run-count normal "
    "approximation. Integer counts + an engine-identical interpolated "
    "median make the dichotomy deterministic. One row-scale scan; "
    "everything else is n_days-row windows.",
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("x"))
    wall = Window.partitionBy()
    m = d.select(
        "day", "x", F.expr("percentile(x, 0.5)").over(wall).alias("med")
    )
    s = m.where(F.col("x") != F.col("med")).select(
        "day", F.when(F.col("x") > F.col("med"), 1).otherwise(0).alias("sgn")
    )
    wd = Window.orderBy("day")
    r = s.select(
        "sgn",
        F.when(
            F.lag("sgn").over(wd).isNull() | (F.col("sgn") != F.lag("sgn").over(wd)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = r.agg(
        F.sum("sgn").alias("n1"),
        (F.count("*") - F.sum("sgn")).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))
    )
    return agg.select(
        n1.alias("n1"),
        n2.alias("n2"),
        runs.alias("runs"),
        F.round((runs - mu) / F.sqrt(var), 6).alias("z_value"),
    )


# ---------------------------------------------------------------------------
# Friedman test: event types ranked within each day
# ---------------------------------------------------------------------------


@register(
    "friedman_type_ranks",
    """
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT day, event_type,
             sum(1) OVER (PARTITION BY day ORDER BY x
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - count(*) OVER (PARTITION BY day, x)
               + (count(*) OVER (PARTITION BY day, x) + 1) / 2.0 AS r
      FROM c
    ),
    g AS (
      SELECT event_type, sum(r) AS rsum, count(*) AS n
      FROM rk GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(rsum * rsum) AS ss
      FROM g
    )
    SELECT g.event_type, CAST(g.n AS BIGINT) AS n_days,
           round(g.rsum, 1) AS rank_sum,
           round(12.0 / (tot.n * tot.k * (tot.k + 1)) * tot.ss
                 - 3.0 * tot.n * (tot.k + 1), 6) AS chi2_f
    FROM g, tot ORDER BY g.event_type
    """,
    doc="Friedman test: within each day (block), rank the five event "
    "types by their daily count (midranks for ties via the "
    "partition+RANGE window pair), then chi2_F = 12/(nk(k+1)) * sum "
    "R_j^2 - 3n(k+1) across type rank sums. Integer counts make "
    "within-day ranks engine-deterministic. One scan into a "
    "|days x types| aggregate; all ranking is windows over that "
    "table. The repeated-measures cousin of kruskal_wallis.",
)
def friedman_type_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("x"))
    wle = Window.partitionBy("day").orderBy("x").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtie = Window.partitionBy("day", "x")
    rk = c.select(
        "event_type",
        (
            F.sum(F.lit(1)).over(wle)
            - F.count("*").over(wtie)
            + (F.count("*").over(wtie) + 1) / 2.0
        ).alias("r"),
    )
    g = rk.groupBy("event_type").agg(
        F.sum("r").alias("rsum"), F.count("*").alias("n")
    )
    wall = Window.partitionBy()
    n = F.max("n").over(wall)
    k = F.count("*").over(wall)
    ss = F.sum(F.col("rsum") * F.col("rsum")).over(wall)
    return (
        g.select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round("rsum", 1).alias("rank_sum"),
            F.round(
                12.0 / (n * k * (k + 1)) * ss - 3.0 * n * (k + 1), 6
            ).alias("chi2_f"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Forecast evaluation: pinball loss for quantile predictions
# ---------------------------------------------------------------------------


@register(
    "pinball_loss_eval",
    """
    WITH train AS (
      SELECT event_type, value FROM events
      WHERE CAST(ts AS DATE) < DATE '2024-01-21'
    ),
    test AS (
      SELECT event_type, value FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-21'
    ),
    pw AS (
      SELECT event_type,
             percentile_cont(0.1) WITHIN GROUP (ORDER BY value) AS p1,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p2,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY value) AS p3
      FROM train GROUP BY event_type
    ),
    pred AS (
      SELECT event_type, CAST(0.1 AS DOUBLE) AS q, p1 AS p FROM pw
      UNION ALL SELECT event_type, CAST(0.5 AS DOUBLE), p2 FROM pw
      UNION ALL SELECT event_type, CAST(0.9 AS DOUBLE), p3 FROM pw
    )
    SELECT p.event_type, p.q, round(p.p, 6) AS pred,
           CAST(count(*) AS BIGINT) AS n_test,
           round(avg(greatest(p.q * (s.value - p.p),
                              (p.q - 1.0) * (s.value - p.p))), 6) AS pinball
    FROM pred p JOIN test s ON s.event_type = p.event_type
    GROUP BY p.event_type, p.q, p.p
    ORDER BY p.event_type, p.q
    """,
    doc="Quantile-forecast evaluation by pinball (quantile) loss: fit "
    "per-type value quantiles {0.1, 0.5, 0.9} on the first 20 days, "
    "score them on the last 10 — the proper scoring rule for the "
    "reference's forecast surface (app.py:195-244) generalized to "
    "quantile predictions. The 15-row prediction table broadcast-joins "
    "back to the test partition; train/test scans read disjoint "
    "day-partition ranges (partition-prunable at 100 TB).",
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    train = ev.where(day < F.lit("2024-01-21"))
    test = ev.where(day >= F.lit("2024-01-21"))
    qs = [0.1, 0.5, 0.9]
    pred = train.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{i}")
            for i, q in enumerate(qs)
        ]
    )
    pred = pred.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(q).alias("q"), F.col(f"p{i}").alias("p"))
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("qp"),
    ).select("event_type", F.col("qp.q").alias("q"), F.col("qp.p").alias("p"))
    j = test.join(F.broadcast(pred), "event_type")
    err = F.col("value") - F.col("p")
    return (
        j.groupBy("event_type", "q", "p")
        .agg(
            F.count("*").alias("n_test"),
            F.round(
                F.avg(F.greatest(F.col("q") * err, (F.col("q") - 1.0) * err)), 6
            ).alias("pinball"),
        )
        .select(
            "event_type",
            "q",
            F.round("p", 6).alias("pred"),
            "n_test",
            "pinball",
        )
        .orderBy("event_type", "q")
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval with empirical coverage
# ---------------------------------------------------------------------------


@register(
    "conformal_interval_coverage",
    """
    WITH fit AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS pred
      FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-16'
      GROUP BY event_type
    ),
    calib AS (
      SELECT e.event_type,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY abs(e.value - f.pred))
               AS qhat
      FROM events e JOIN fit f ON f.event_type = e.event_type
      WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
        AND CAST(ts AS DATE) < DATE '2024-01-23'
      GROUP BY e.event_type
    )
    SELECT e.event_type, round(f.pred, 6) AS pred, round(c.qhat, 6) AS qhat,
           CAST(count(*) AS BIGINT) AS n_test,
           round(avg(CASE WHEN abs(e.value - f.pred) <= c.qhat
                          THEN 1.0 ELSE 0.0 END), 6) AS coverage
    FROM events e
    JOIN fit f ON f.event_type = e.event_type
    JOIN calib c ON c.event_type = e.event_type
    WHERE CAST(ts AS DATE) >= DATE '2024-01-23'
    GROUP BY e.event_type, f.pred, c.qhat
    ORDER BY e.event_type
    """,
    doc="Split-conformal prediction interval: fit a per-type median "
    "predictor on days 1-15, take the 90th percentile of absolute "
    "calibration residuals on days 16-22 as the conformal radius, and "
    "report empirical coverage on days 23-30 (distribution-free "
    "~90% guarantee). All three passes read disjoint day ranges "
    "(partition-prunable); the per-type predictor and radius tables "
    "broadcast back. Both engines compute identical interpolated "
    "percentiles, so the coverage indicator is deterministic.",
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    fit = (
        ev.where(day < F.lit("2024-01-16"))
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("pred"))
    )
    calib = (
        ev.where((day >= F.lit("2024-01-16")) & (day < F.lit("2024-01-23")))
        .join(F.broadcast(fit), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - pred), 0.9)").alias("qhat")
        )
    )
    test = ev.where(day >= F.lit("2024-01-23"))
    j = test.join(F.broadcast(fit), "event_type").join(
        F.broadcast(calib), "event_type"
    )
    return (
        j.groupBy("event_type", "pred", "qhat")
        .agg(
            F.count("*").alias("n_test"),
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("value") - F.col("pred")) <= F.col("qhat"),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("coverage"),
        )
        .select(
            "event_type",
            F.round("pred", 6).alias("pred"),
            F.round("qhat", 6).alias("qhat"),
            "n_test",
            "coverage",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast skill: MASE on the last week
# ---------------------------------------------------------------------------


@register(
    "seasonal_naive_mase",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    l AS (
      SELECT event_type, day, x,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1
      FROM d
    )
    SELECT event_type,
           round(avg(CASE WHEN day >= DATE '2024-01-24'
                          THEN abs(x - x7) END), 6) AS mae_seasonal,
           round(avg(CASE WHEN day < DATE '2024-01-24'
                          THEN abs(x - x1) END), 6) AS mae_naive_train,
           round(avg(CASE WHEN day >= DATE '2024-01-24'
                          THEN abs(x - x7) END)
                 / avg(CASE WHEN day < DATE '2024-01-24'
                            THEN abs(x - x1) END), 6) AS mase
    FROM l
    WHERE x1 IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Forecast skill of the seasonal-naive model (predict each of "
    "the last 7 days by the value one week earlier) as MASE: test MAE "
    "over the one-step naive's training MAE — MASE < 1 beats the "
    "naive baseline. Integer daily counts make every absolute error "
    "deterministic. One scan into the |types x days| aggregate, two "
    "lag windows, one conditional aggregate — a single linear plan.",
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "day",
        "x",
        F.lag("x", 7).over(wk).alias("x7"),
        F.lag("x", 1).over(wk).alias("x1"),
    ).where(F.col("x1").isNotNull())
    test = F.col("day") >= F.lit("2024-01-24")
    mae_s = F.avg(F.when(test, F.abs(F.col("x") - F.col("x7"))))
    mae_n = F.avg(F.when(~test, F.abs(F.col("x") - F.col("x1"))))
    return (
        l.groupBy("event_type")
        .agg(
            F.round(mae_s, 6).alias("mae_seasonal"),
            F.round(mae_n, 6).alias("mae_naive_train"),
            F.round(mae_s / mae_n, 6).alias("mase"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 2x2 inference panel: weekend vs weekday purchase rate
# ---------------------------------------------------------------------------


@register(
    "weekend_purchase_contrast",
    """
    WITH f AS (
      SELECT CASE WHEN CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
                       IN (2, 3) THEN 1 ELSE 0 END AS wkend,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN wkend = 1 THEN y ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN wkend = 1 THEN 1 - y ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN wkend = 0 THEN y ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN wkend = 0 THEN 1 - y ELSE 0 END) AS BIGINT) AS d
      FROM f
    ),
    e AS (
      SELECT a, b, c, d,
             a * 1.0 / (a + b) AS p1, c * 1.0 / (c + d) AS p2,
             (a + c) * 1.0 / (a + b + c + d) AS pp,
             a + b AS n1, c + d AS n2
      FROM c
    ),
    z AS (
      SELECT a, b, c, d, p1, p2,
             (p1 - p2) / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)) AS zstat
      FROM e
    )
    SELECT CAST(a + b AS BIGINT) AS n_weekend,
           CAST(c + d AS BIGINT) AS n_weekday,
           round(p1, 6) AS rate_weekend,
           round(p2, 6) AS rate_weekday,
           round(zstat, 6) AS z,
           round(least(1.0, 2.0 * exp(-zstat * zstat / 2.0)), 6) AS p_bound,
           round(a * 1.0 * d / (b * 1.0 * c), 6) AS odds_ratio,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS or_ci_lo,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS or_ci_hi
    FROM z
    """,
    doc="2x2 inference panel for weekend vs weekday purchase rates: "
    "pooled two-proportion z statistic, a sub-Gaussian tail bound "
    "p <= 2 exp(-z^2/2) (conservative, engine-portable — no erf "
    "needed), the odds ratio, and its Woolf 95% CI on the log scale. "
    "Weekend = days-since-epoch mod 7 in {2,3} (Sat/Sun; engine-stable "
    "arithmetic weekday). One conditional aggregate over a single "
    "events scan — the whole panel is closed-form from four cells.",
)
def weekend_purchase_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wkend = (
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7).isin(2, 3)
    ).cast("int")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    c = ev.select(wkend.alias("wkend"), y.alias("y")).agg(
        F.sum(F.when(F.col("wkend") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("wkend") == 1, 1 - F.col("y")).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(F.col("wkend") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("wkend") == 0, 1 - F.col("y")).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    a, b, cc, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    n1, n2 = a + b, cc + d
    p1, p2 = a * 1.0 / n1, cc * 1.0 / n2
    pp = (a + cc) * 1.0 / (n1 + n2)
    zstat = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    lor = F.log(a * 1.0 * d / (b * 1.0 * cc))
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / cc + 1.0 / d)
    return c.select(
        n1.cast("long").alias("n_weekend"),
        n2.cast("long").alias("n_weekday"),
        F.round(p1, 6).alias("rate_weekend"),
        F.round(p2, 6).alias("rate_weekday"),
        F.round(zstat, 6).alias("z"),
        F.round(
            F.least(F.lit(1.0), 2.0 * F.exp(-zstat * zstat / 2.0)), 6
        ).alias("p_bound"),
        F.round(F.exp(lor), 6).alias("odds_ratio"),
        F.round(F.exp(lor - 1.959964 * se), 6).alias("or_ci_lo"),
        F.round(F.exp(lor + 1.959964 * se), 6).alias("or_ci_hi"),
    )


# ---------------------------------------------------------------------------
# Dunn's post-hoc pairwise test (after Kruskal-Wallis)
# ---------------------------------------------------------------------------


@register(
    "dunn_posthoc_pairwise",
    """
    WITH per2 AS (
      SELECT value, event_type, count(*) AS cg FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, cg,
             sum(cg) OVER (ORDER BY value RANGE UNBOUNDED PRECEDING)
               - sum(cg) OVER (PARTITION BY value)
               + (sum(cg) OVER (PARTITION BY value) + 1) / 2.0 AS avg_rank,
             CASE WHEN row_number() OVER (PARTITION BY value
                                          ORDER BY event_type) = 1
                  THEN pow(sum(cg) OVER (PARTITION BY value), 3)
                       - sum(cg) OVER (PARTITION BY value)
                  ELSE 0 END AS t3p
      FROM per2
    ),
    g AS (
      SELECT event_type, CAST(sum(cg) AS BIGINT) AS ng,
             sum(cg * avg_rank) AS rsum, sum(t3p) AS t3g
      FROM rk GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, sum(t3g) AS t3 FROM g
    ),
    pairs AS (
      SELECT x.event_type AS type_a, yy.event_type AS type_b,
             x.ng AS na, yy.ng AS nb,
             x.rsum / x.ng - yy.rsum / yy.ng AS rdiff,
             t.n, t.t3
      FROM g x JOIN g yy ON x.event_type < yy.event_type, tot t
    ),
    z AS (
      SELECT type_a, type_b, na, nb,
             rdiff / sqrt((n * (n + 1.0) / 12.0
                           - t3 / (12.0 * (n - 1.0)))
                          * (1.0 / na + 1.0 / nb)) AS zstat
      FROM pairs
    )
    SELECT type_a, type_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(zstat, 6) AS z,
           round(least(1.0, 2.0 * exp(-zstat * zstat / 2.0)), 6) AS p_bound,
           abs(zstat) > 2.241403 AS significant
    FROM z ORDER BY type_a, type_b
    """,
    doc="Dunn's post-hoc pairwise comparisons following "
    "kruskal_wallis_value_by_type: for each of the 10 event-type "
    "pairs, the standardized mean-rank difference with the exact tie "
    "correction (T = sum(t^3 - t) over value-tie blocks), a "
    "sub-Gaussian tail bound p, and a Bonferroni-style significance "
    "flag at family alpha 0.25 (|z| > 2.2414 per pair, 10 pairs). "
    "Midranks reuse the KW one-scan idiom: partition/RANGE windows "
    "over the (value, type) aggregate, never a join back to rows; the "
    "pairwise join is over the 5-row group table.",
)
def dunn_posthoc_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per2 = ev.groupBy("value", "event_type").agg(F.count("*").alias("cg"))
    wv = Window.partitionBy("value")
    wr = Window.orderBy("value").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rv = Window.partitionBy("value").orderBy("event_type")
    r = per2.select(
        "event_type",
        "cg",
        F.sum("cg").over(wv).alias("cv"),
        F.sum("cg").over(wr).alias("cum_le"),
        F.row_number().over(rv).alias("rv"),
    ).select(
        "event_type",
        "cg",
        (F.col("cum_le") - F.col("cv") + (F.col("cv") + 1) / 2.0).alias(
            "avg_rank"
        ),
        F.when(
            F.col("rv") == 1,
            F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"),
        )
        .otherwise(0)
        .alias("t3p"),
    )
    # the 5-row group table feeds three consumers (both pair sides and
    # the totals) — cache it so the row-scale scan runs once
    g = r.groupBy("event_type").agg(
        F.sum("cg").cast("long").alias("ng"),
        F.sum(F.col("cg") * F.col("avg_rank")).alias("rsum"),
        F.sum("t3p").alias("t3g"),
    ).cache()
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("t3g").alias("t3")
    )
    x = g.alias("x")
    yy = g.alias("yy")
    pairs = (
        x.join(yy, F.col("x.event_type") < F.col("yy.event_type"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("x.event_type").alias("type_a"),
            F.col("yy.event_type").alias("type_b"),
            F.col("x.ng").alias("na"),
            F.col("yy.ng").alias("nb"),
            (
                F.col("x.rsum") / F.col("x.ng")
                - F.col("yy.rsum") / F.col("yy.ng")
            ).alias("rdiff"),
            "n",
            "t3",
        )
    )
    n = F.col("n")
    sigma = F.sqrt(
        (n * (n + 1.0) / 12.0 - F.col("t3") / (12.0 * (n - 1.0)))
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    zstat = F.col("rdiff") / sigma
    return pairs.select(
        "type_a",
        "type_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(zstat, 6).alias("z"),
        F.round(
            F.least(F.lit(1.0), 2.0 * F.exp(-zstat * zstat / 2.0)), 6
        ).alias("p_bound"),
        (F.abs(zstat) > 2.241403).alias("significant"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Round-6j: Wasserstein-1 distance and the log-rank survival test
# ---------------------------------------------------------------------------


@register(
    "wasserstein_value_shift",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per AS (
      SELECT value, sum(is_a) AS ca, sum(1 - is_a) AS cb FROM ab GROUP BY value
    ),
    tot AS (
      SELECT CAST(sum(is_a) AS BIGINT) AS na,
             CAST(count(*) - sum(is_a) AS BIGINT) AS nb
      FROM ab
    ),
    cum AS (
      SELECT value,
             sum(ca) OVER (ORDER BY value) AS cca,
             sum(cb) OVER (ORDER BY value) AS ccb,
             lead(value) OVER (ORDER BY value) AS v_next
      FROM per
    )
    SELECT tot.na AS n_a, tot.nb AS n_b,
           round(sum(abs(cca * 1.0 / na - ccb * 1.0 / nb)
                     * (v_next - value)), 6) AS w1
    FROM cum CROSS JOIN tot
    WHERE v_next IS NOT NULL
    GROUP BY tot.na, tot.nb
    """,
    doc="Wasserstein-1 (earth mover's) distance between the purchase "
    "and view value distributions, computed EXACTLY as the area "
    "between the two empirical CDFs (integral of |F_a - F_b| over the "
    "merged support) — the magnitude-aware companion to "
    "ks_test_purchase_vs_view's sup-norm: KS sees the worst gap, W1 "
    "sees how much value has to MOVE, which is the quantity cost/ "
    "uplift models care about. All counts exact integers through the "
    "cumulative windows; one |distinct-values| sort, no pairing.",
)
def wasserstein_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    ab = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        "value",
    )
    per = ab.groupBy("value").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    tot = ab.agg(
        F.sum("is_a").cast("bigint").alias("na"),
        (F.count("*") - F.sum("is_a")).cast("bigint").alias("nb"),
    )
    w = Window.orderBy("value")
    cum = per.select(
        "value",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        F.lead("value").over(w).alias("v_next"),
    )
    return (
        cum.where(F.col("v_next").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("cca") * 1.0 / F.col("na")
                        - F.col("ccb") * 1.0 / F.col("nb")
                    )
                    * (F.col("v_next") - F.col("value"))
                ),
                6,
            ).alias("w1")
        )
        .select(
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "w1"
        )
    )


@register(
    "logrank_ship_priority",
    """
    WITH lat AS (
      SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT) AS t,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    per_t AS (
      SELECT t, sum(g1) AS d1, count(*) AS d FROM lat GROUP BY t
    ),
    risk AS (
      SELECT t, d1, d,
             sum(d1) OVER (ORDER BY t DESC) AS n1,
             sum(d) OVER (ORDER BY t DESC) AS n
      FROM per_t
    ),
    terms AS (
      SELECT d1, d * n1 * 1.0 / n AS e1,
             CASE WHEN n > 1 THEN
               d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n) * (n - d) / (n - 1)
             ELSE 0 END AS v
      FROM risk
    ),
    s AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1, sum(e1) AS e1, sum(v) AS v
      FROM terms
    )
    SELECT (SELECT CAST(sum(g1) AS BIGINT) FROM lat) AS n_urgent,
           (SELECT CAST(count(*) - sum(g1) AS BIGINT) FROM lat) AS n_low,
           o1, round(e1, 6) AS e1,
           round((o1 - e1) / sqrt(v), 6) AS z,
           round(pow(o1 - e1, 2) / v, 6) AS chi2
    FROM s
    """,
    doc="Log-rank (Mantel-Cox) test comparing URGENT vs LOW order-to-"
    "ship latency 'survival': at every distinct latency t, observed "
    "urgent-line shipments d1 vs the hypergeometric expectation d*n1/n over "
    "the at-risk sets, summed into the standard z / chi-square(1) "
    "statistic — the hypothesis-test companion to kaplan_meier_ship_"
    "latency (KM draws the curves; log-rank says whether they differ). "
    "No censoring in this fixture so every row is an event. At-risk "
    "counts are ONE descending cumulative window over the |distinct "
    "latencies| table; everything upstream is a grouped integer count.",
)
def logrank_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g1"),
    )
    per_t = lat.groupBy("t").agg(
        F.sum("g1").alias("d1"), F.count("*").alias("d")
    )
    wdesc = Window.orderBy(F.desc("t"))
    risk = per_t.select(
        "d1",
        "d",
        F.sum("d1").over(wdesc).alias("n1"),
        F.sum("d").over(wdesc).alias("n"),
    )
    frac = F.col("n1") * 1.0 / F.col("n")
    terms = risk.select(
        "d1",
        (F.col("d") * frac).alias("e1"),
        F.when(
            F.col("n") > 1,
            F.col("d") * frac * (1 - frac) * (F.col("n") - F.col("d"))
            / (F.col("n") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    s = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1").alias("e1"),
        F.sum("v").alias("v"),
    )
    sizes = lat.agg(
        F.sum("g1").cast("bigint").alias("n_urgent"),
        (F.count("*") - F.sum("g1")).cast("bigint").alias("n_low"),
    )
    return sizes.crossJoin(s).select(
        "n_urgent",
        "n_low",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round((F.col("o1") - F.col("e1")) / F.sqrt("v"), 6).alias("z"),
        F.round(F.pow(F.col("o1") - F.col("e1"), 2) / F.col("v"), 6).alias(
            "chi2"
        ),
    )


_PH_DELTA = 0.005  # magnitude tolerance
_PH_LAMBDA_SD = 3.0  # alarm at gap > 3 sd of the daily series


@register(
    "page_hinkley_daily_value",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, avg(value) AS x
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT day, x,
             avg(x) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS xbar
      FROM d
    ),
    m AS (
      SELECT day, x,
             sum(x - xbar - {_PH_DELTA})
               OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
      FROM r
    ),
    g AS (
      SELECT day, x, mt,
             mt - min(mt) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS gap,
             stddev_samp(x) OVER () AS sd
      FROM m
    )
    SELECT day, round(x, 6) AS x, round(mt, 6) AS mt,
           round(gap, 6) AS gap,
           CAST(gap > {_PH_LAMBDA_SD} * sd AS INTEGER) AS alarm
    FROM g ORDER BY day
    """,
    doc="Page-Hinkley drift detector (Page 1954; the streaming-ML "
    "standard for concept drift, cf. Gama et al. 2014) replayed "
    "offline on daily mean event values: cumulative deviation from "
    "the RUNNING mean (minus tolerance delta), alarmed when the gap "
    "to its running minimum exceeds 3 series-sd. Completes the "
    "changepoint trio (CUSUM = known-mean shift, Pettitt = rank "
    "changepoint, PH = sequential drift alarm). Cumulative windows "
    "are sequential folds — both engines iterate the same day order, "
    "so the statistic replays bit-for-bit; the series is one grouped "
    "scan, windows over |days| rows only.",
)
def page_hinkley_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    r = d.select("day", "x", F.avg("x").over(wcum).alias("xbar"))
    m = r.select(
        "day",
        "x",
        F.sum(F.col("x") - F.col("xbar") - _PH_DELTA).over(wcum).alias("mt"),
    )
    g = m.select(
        "day",
        "x",
        "mt",
        (F.col("mt") - F.min("mt").over(wcum)).alias("gap"),
        F.stddev_samp("x").over(wall).alias("sd"),
    )
    return g.select(
        "day",
        F.round("x", 6).alias("x"),
        F.round("mt", 6).alias("mt"),
        F.round("gap", 6).alias("gap"),
        (F.col("gap") > _PH_LAMBDA_SD * F.col("sd")).cast("int").alias("alarm"),
    ).orderBy("day")


_HBOS_BINS = 10


@register(
    "hbos_outlier_topk",
    f"""
    WITH f AS (
      SELECT event_id,
             value,
             CAST(extract(hour FROM ts) AS BIGINT) AS hod,
             CAST(extract(dow FROM ts) AS BIGINT) AS dow
      FROM events
    ),
    vr AS (SELECT min(value) AS lo, max(value) AS hi FROM f),
    b AS (
      SELECT event_id, value, hod, dow,
             least(CAST(floor((value - vr.lo) / (vr.hi - vr.lo)
                              * {_HBOS_BINS}) AS BIGINT),
                   {_HBOS_BINS - 1}) AS vbin
      FROM f CROSS JOIN vr
    ),
    hv AS (SELECT vbin, count(*) AS c FROM b GROUP BY vbin),
    hh AS (SELECT hod, count(*) AS c FROM b GROUP BY hod),
    hd AS (SELECT dow, count(*) AS c FROM b GROUP BY dow),
    mx AS (
      SELECT (SELECT max(c) FROM hv) AS mv,
             (SELECT max(c) FROM hh) AS mh,
             (SELECT max(c) FROM hd) AS md
    ),
    scored AS (
      SELECT b.event_id, b.value, b.hod, b.dow,
             ln(mx.mv * 1.0 / hv.c) + ln(mx.mh * 1.0 / hh.c)
             + ln(mx.md * 1.0 / hd.c) AS score
      FROM b
      JOIN hv USING (vbin) JOIN hh USING (hod) JOIN hd USING (dow)
      CROSS JOIN mx
    )
    SELECT event_id, round(value, 6) AS value, hod, dow,
           round(score, 6) AS hbos_score
    FROM scored
    ORDER BY round(score, 6) DESC, event_id
    LIMIT 20
    """,
    doc="HBOS anomaly scores (Goldstein & Dengel 2012), top-20: per "
    "feature (value decile-width bins, hour-of-day, day-of-week) a "
    "max-normalized histogram; score = sum of log(max_height / "
    "bin_height) — events in jointly rare bins float to the top. The "
    "linear-time unsupervised outlier baseline (assumes feature "
    "independence — by design). Scale: three histogram aggregates "
    "(bounded bins), broadcast joins of the bin tables back onto one "
    "scan, top-k heap; no distance computations, no pairs.",
)
def hbos_outlier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    f = ev.select(
        "event_id",
        "value",
        F.hour("ts").cast("long").alias("hod"),
        F.dayofweek("ts").cast("long").alias("dow0"),
    ).withColumn("dow", F.col("dow0") - 1).drop("dow0")
    # value range as a broadcast 1-row scalar — not a min/max window
    # over raw events (empty partition spec = one WindowExec task;
    # r9 plan-audit guard)
    vr = f.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    b = f.crossJoin(F.broadcast(vr)).select(
        "event_id",
        "value",
        "hod",
        "dow",
        F.least(
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * _HBOS_BINS
            ).cast("long"),
            F.lit(_HBOS_BINS - 1),
        ).alias("vbin"),
    )
    # r14 (guide §2.4/§1.2): the three per-dimension histograms each
    # re-executed the scan + range-join subtree `b` (separate grouping
    # keys -> no exchange reuse), and the three max scalars re-ran the
    # histograms again — ~5 full passes for <=131 histogram rows. ONE
    # melted pass (explode each event onto its 3 (kind, key) votes,
    # one map-side-reduced aggregate) now builds all three histograms;
    # the <=131-row result is cached in-query and feeds the three
    # broadcast lookups and the max scalars. Counts are identical
    # integers, so scores and the top-k hash are unchanged.
    melted = (
        b.select(
            F.explode(
                F.array(
                    F.struct(F.lit("v").alias("k"), F.col("vbin").alias("key")),
                    F.struct(F.lit("h").alias("k"), F.col("hod").alias("key")),
                    F.struct(F.lit("d").alias("k"), F.col("dow").alias("key")),
                )
            ).alias("kv")
        )
        .groupBy(F.col("kv.k").alias("k"), F.col("kv.key").alias("key"))
        .agg(F.count("*").alias("cnt"))
        .cache()
    )
    hv = melted.filter(F.col("k") == "v").select(
        F.col("key").alias("vbin"), F.col("cnt").alias("cv")
    )
    hh = melted.filter(F.col("k") == "h").select(
        F.col("key").alias("hod"), F.col("cnt").alias("ch")
    )
    hd = melted.filter(F.col("k") == "d").select(
        F.col("key").alias("dow"), F.col("cnt").alias("cd")
    )
    mx = (
        hv.agg(F.max("cv").alias("mv"))
        .crossJoin(hh.agg(F.max("ch").alias("mh")))
        .crossJoin(hd.agg(F.max("cd").alias("md")))
    )
    scored = (
        b.join(F.broadcast(hv), "vbin")
        .join(F.broadcast(hh), "hod")
        .join(F.broadcast(hd), "dow")
        .crossJoin(F.broadcast(mx))
        .select(
            "event_id",
            "value",
            "hod",
            "dow",
            (
                F.log(F.col("mv") / F.col("cv"))
                + F.log(F.col("mh") / F.col("ch"))
                + F.log(F.col("md") / F.col("cd"))
            ).alias("score"),
        )
    )
    return (
        scored.select(
            "event_id",
            F.round("value", 6).alias("value"),
            "hod",
            "dow",
            F.round("score", 6).alias("hbos_score"),
        )
        .orderBy(F.desc(F.round(F.col("hbos_score"), 6)), F.asc("event_id"))
        .limit(20)
    )


@register(
    "energy_distance_purchase_vs_view",
    """
    WITH ab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a, value
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per AS (
      SELECT value AS v,
             CAST(sum(is_a) AS DOUBLE) AS ca,
             CAST(sum(1 - is_a) AS DOUBLE) AS cb
      FROM ab GROUP BY value
    ),
    cum AS (
      SELECT v, ca, cb,
             sum(ca) OVER w AS cau, sum(cb) OVER w AS cbu,
             sum(ca * v) OVER w AS sau, sum(cb * v) OVER w AS sbu,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
             sum(ca * v) OVER () AS sat, sum(cb * v) OVER () AS sbt
      FROM per
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    sums AS (
      SELECT
        sum(ca * (v * cbu - sbu + (sbt - sbu) - v * (nb - cbu))) AS dxy,
        sum(ca * (v * cau - sau + (sat - sau) - v * (na - cau))) AS dxx,
        sum(cb * (v * cbu - sbu + (sbt - sbu) - v * (nb - cbu))) AS dyy,
        max(na) AS na, max(nb) AS nb
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           round(dxy / (na * nb), 6) AS e_xy,
           round(dxx / (na * na), 6) AS e_xx,
           round(dyy / (nb * nb), 6) AS e_yy,
           round(2 * dxy / (na * nb) - dxx / (na * na) - dyy / (nb * nb), 6)
             AS energy_dist_sq,
           round((na * nb / (na + nb))
                 * (2 * dxy / (na * nb) - dxx / (na * na) - dyy / (nb * nb)),
                 6) AS statistic
    FROM sums
    """,
    doc="Energy-distance two-sample statistic (Szekely & Rizzo 2004) "
    "for purchase vs view values, computed EXACTLY in O(n log n): in "
    "1-D every cross-mean E|X-Y| reduces to cumulative count/sum "
    "windows over the value-grouped table (for each v, sum_w "
    "cnt(w)|v-w| telescopes into prefix sums), so no pair term ever "
    "materializes. V-statistic form (self-pairs contribute 0); the "
    "test statistic is the standard n_a n_b/(n_a+n_b) scaling. "
    "Completes the two-sample family: KS (sup-norm), Mann-Whitney "
    "(rank), Wasserstein (L1 of CDFs), energy (metric/characteristic-"
    "function). One grouped aggregate + one ordered window chain over "
    "|distinct values| rows.",
)
def energy_distance_purchase_vs_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    per = (
        ev.select(
            (F.col("event_type") == "purchase").cast("int").alias("is_a"),
            F.col("value").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum("is_a").cast("double").alias("ca"),
            F.sum(1 - F.col("is_a")).cast("double").alias("cb"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per.select(
        "v",
        "ca",
        "cb",
        F.sum("ca").over(wcum).alias("cau"),
        F.sum("cb").over(wcum).alias("cbu"),
        F.sum(F.col("ca") * F.col("v")).over(wcum).alias("sau"),
        F.sum(F.col("cb") * F.col("v")).over(wcum).alias("sbu"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
        F.sum(F.col("ca") * F.col("v")).over(wall).alias("sat"),
        F.sum(F.col("cb") * F.col("v")).over(wall).alias("sbt"),
    )
    v = F.col("v")
    dxy_t = v * F.col("cbu") - F.col("sbu") + (F.col("sbt") - F.col("sbu")) - v * (
        F.col("nb") - F.col("cbu")
    )
    dxx_t = v * F.col("cau") - F.col("sau") + (F.col("sat") - F.col("sau")) - v * (
        F.col("na") - F.col("cau")
    )
    sums = cum.agg(
        F.sum(F.col("ca") * dxy_t).alias("dxy"),
        F.sum(F.col("ca") * dxx_t).alias("dxx"),
        F.sum(F.col("cb") * dxy_t).alias("dyy"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    na, nb = F.col("na"), F.col("nb")
    d2 = (
        2 * F.col("dxy") / (na * nb)
        - F.col("dxx") / (na * na)
        - F.col("dyy") / (nb * nb)
    )
    return sums.select(
        na.cast("bigint").alias("na"),
        nb.cast("bigint").alias("nb"),
        F.round(F.col("dxy") / (na * nb), 6).alias("e_xy"),
        F.round(F.col("dxx") / (na * na), 6).alias("e_xx"),
        F.round(F.col("dyy") / (nb * nb), 6).alias("e_yy"),
        F.round(d2, 6).alias("energy_dist_sq"),
        F.round((na * nb / (na + nb)) * d2, 6).alias("statistic"),
    )


_TRUSS_K = 4  # k-truss: every surviving edge in >= k-2 = 2 triangles
_TRUSS_ROUNDS = 3

_TRUSS_ROUND_SQL = """
    tri{r} AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM e{p} e1 JOIN e{p} e2 ON e1.s2 = e2.s1
      JOIN e{p} e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    sup{r} AS (
      SELECT s1, s2, count(*) AS sup FROM (
        SELECT a AS s1, b AS s2 FROM tri{r}
        UNION ALL SELECT b, c FROM tri{r}
        UNION ALL SELECT a, c FROM tri{r}
      ) GROUP BY s1, s2
    ),
    e{r} AS MATERIALIZED (
      SELECT e.s1, e.s2 FROM e{p} e JOIN sup{r} s
        ON e.s1 = s.s1 AND e.s2 = s.s2
      WHERE s.sup >= {k2}
    )"""


def _truss_oracle() -> str:
    rounds = ",".join(
        _TRUSS_ROUND_SQL.format(r=i, p=i - 1, k2=_TRUSS_K - 2)
        for i in range(1, _TRUSS_ROUNDS + 1)
    )
    last, prev = _TRUSS_ROUNDS, _TRUSS_ROUNDS - 1
    return f"""
    WITH ps AS ({_CO_SUPPLY_PS}),
    e0 AS MATERIALIZED (
      SELECT a.sk AS s1, b.sk AS s2
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    {rounds}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges_initial,
           (SELECT CAST(count(*) AS BIGINT) FROM e{last}) AS n_edges_truss,
           (SELECT CAST(count(DISTINCT sk) AS BIGINT) FROM (
              SELECT s1 AS sk FROM e{last} UNION ALL SELECT s2 FROM e{last}))
             AS n_suppliers_truss,
           (SELECT count(*) FROM e{last}) = (SELECT count(*) FROM e{prev})
             AS converged
    """


@register(
    "ktruss_suppliers",
    _truss_oracle(),
    doc=f"{_TRUSS_K}-truss of the supplier co-supply graph (Cohen "
    "2008): iteratively drop every edge in fewer than k-2 triangles — "
    "the cohesion upgrade of the k-core (every k-truss edge sits in a "
    "dense near-clique; cores only bound degree). "
    f"{_TRUSS_ROUNDS} unrolled peel rounds with an in-result "
    "convergence certificate (edge count unchanged in the last "
    "round). Each round is one oriented-wedge triangle enumeration "
    "(id-ordered, each triangle once) + one edge-keyed support "
    "aggregate + a semi-filter on a monotonically SHRINKING edge set; "
    "the oracle replays identical rounds via MATERIALIZED CTEs. At "
    "100 TB the orientation switches to degree-ordering so wedges fan "
    "out from low-degree endpoints (the triangle_count note).",
)
def ktruss_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").where(F.col("p_size") == 1)
    ps = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    e = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .groupBy(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 2)
        .select("s1", "s2")
        .localCheckpoint(eager=True)
    )
    n0 = e.count()
    # EARLY EXIT (r9, same proof as kcore_parts): the edge set is a
    # monotone shrinking chain under peeling, so an unchanged count
    # after a round means an unchanged SET — a fixpoint — and every
    # remaining unrolled round would re-enumerate the same triangles
    # to drop nothing. The oracle replays all rounds; post-fixpoint
    # rounds are identity, so results match. Counts are already paid
    # per round (the convergence certificate needs them); this also
    # drops the redundant loop-head recount of the checkpointed set.
    n_cur = n0
    prev_n = n0
    spark_ = li.sparkSession
    out_schema = (
        "n_edges_initial bigint, n_edges_truss bigint, "
        "n_suppliers_truss bigint, converged boolean"
    )
    # r13 OPT: cardinality-gated DRIVER peel (the pagerank/HITS/
    # connected_components collect class). The whole query reduces to
    # one row of counts over the filtered co-supply graph, and n0 is a
    # driver-known int already paid for the convergence certificate.
    # Below the gate (default 100k edges, env-overridable) the peel is
    # pure INTEGER set logic — oriented wedge intersection, identical
    # triangle multiset, identical support counts, zero float risk —
    # replayed on the driver with |edges|-bounded state, replacing
    # 3 rounds x (2 joins + union-aggregate + semi-join + count) of
    # fixed per-job overhead (measured: 35 -> ~6 Spark jobs,
    # 3.87 -> ~1.1 s warm at sf0.1). Above the gate the distributed
    # loop below runs unchanged; parity pinned in
    # tests/test_graph_peel.py (driver == distributed on fixtures).
    driver_max = int(
        os.environ.get("SPARK_GRAFT_TRUSS_DRIVER_MAX", str(100_000))
    )
    if n0 <= driver_max:
        out: dict = {}
        edges = set()
        for r in e.collect():
            u, v = r[0], r[1]
            edges.add((u, v))
            out.setdefault(u, set()).add(v)
        empty: set = set()
        for _ in range(_TRUSS_ROUNDS):
            prev_n = n_cur
            support: dict = {}
            for u, v in edges:
                for c in out.get(u, empty) & out.get(v, empty):
                    for ed in ((u, v), (v, c), (u, c)):
                        support[ed] = support.get(ed, 0) + 1
            edges = {
                ed for ed, s in support.items() if s >= _TRUSS_K - 2
            }
            out = {}
            for u, v in edges:
                out.setdefault(u, set()).add(v)
            n_cur = len(edges)
            if n_cur == prev_n:
                break
        n_sup_d = len({x for ed in edges for x in ed})
        return spark_.createDataFrame(
            [(int(n0), int(n_cur), int(n_sup_d), bool(n_cur == prev_n))],
            out_schema,
        )
    # r13: the per-round edge count is a DRIVER-KNOWN int (paid for the
    # convergence certificate anyway) — use it to pick the join
    # strategy deliberately (guide §3.1): below the gate the wedge
    # extension and the closing-edge probe build broadcast hash tables
    # (zero shuffles per round) instead of AQE guessing from
    # checkpointed-RDD sizes it cannot estimate. Past the gate (true
    # 100 TB edge sets) the hint is off and the joins shuffle as
    # before; the hint changes strategy only, never rows.
    bcast_edges_max = int(
        os.environ.get("SPARK_GRAFT_TRUSS_BCAST_MAX", str(2_000_000))
    )
    for _ in range(_TRUSS_ROUNDS):
        prev_n = n_cur
        hint = F.broadcast if n_cur <= bcast_edges_max else (lambda df: df)
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        tri = (
            e1.join(hint(e2), F.col("e1.s2") == F.col("e2.s1"))
            .join(
                hint(e3),
                (F.col("e3.s1") == F.col("e1.s1"))
                & (F.col("e3.s2") == F.col("e2.s2")),
            )
            .select(
                F.col("e1.s1").alias("a"),
                F.col("e1.s2").alias("b"),
                F.col("e2.s2").alias("c"),
            )
        )
        sup = (
            tri.select(F.col("a").alias("s1"), F.col("b").alias("s2"))
            .unionAll(tri.select(F.col("b").alias("s1"), F.col("c").alias("s2")))
            .unionAll(tri.select(F.col("a").alias("s1"), F.col("c").alias("s2")))
            .groupBy("s1", "s2")
            .agg(F.count("*").alias("sup"))
            .where(F.col("sup") >= _TRUSS_K - 2)
            .select("s1", "s2")
        )
        e = e.join(hint(sup), ["s1", "s2"], "left_semi").localCheckpoint(
            eager=True
        )
        n_cur = e.count()
        if n_cur == prev_n:
            break
    n_final = n_cur
    n_sup = (
        e.select(F.col("s1").alias("sk"))
        .unionAll(e.select(F.col("s2").alias("sk")))
        .select("sk")
        .distinct()
        .count()
    )
    spark_ = li.sparkSession
    return spark_.createDataFrame(
        [(int(n0), int(n_final), int(n_sup), bool(n_final == prev_n))],
        "n_edges_initial bigint, n_edges_truss bigint, "
        "n_suppliers_truss bigint, converged boolean",
    )
