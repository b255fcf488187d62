"""Model-evaluation and corpus-law extensions — round-6 continuation.

Reference capability these generalize: the reference evaluates its
trained scorer by ranking quality and error plots (app.py model
endpoints, report §7) and profiles its corpus qualitatively; this
module adds the decile lift/gain table and step-interpolated PR-AUC
(the imbalanced-data companions to auc_value_predicts_purchase), the
classical variance-decomposition tests over the weekday revenue
profile (one-way ANOVA + Brown-Forsythe Levene), a lag-1 Granger
causality F-test between the daily view and purchase series (the
cross-series cousin of capm_beta_alpha's OLS machinery), and a
Heaps'-law vocabulary-growth fit (the corpus-scaling companion to
zipf_token_slope).

Scale posture: ranking metrics aggregate to the distinct-score domain
before any ordered window (AUC idiom — no global row sort); the ANOVA
family reduces to 7-group sums; Granger reduces to a |days| table and
closed-form 2-regressor normal equations; Heaps joins two |docs|-sized
per-doc tables. Nothing runs an ordered window over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# Distinct-score (positives, negatives) counts — shared by the ranking
# metrics; the AUC idiom: aggregate BEFORE sorting, so the global sort
# touches |distinct scores|, never |rows|.
_PER_SCORE = """
      SELECT round(value, 6) AS s,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
"""


def _per_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.round("value", 6).alias("s")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("pos"),
        F.count("*").cast("long").alias("n"),
    )


@register(
    "lift_gain_deciles",
    f"""
    WITH per_score AS ({_PER_SCORE}),
    cum AS (
      SELECT s, n, pos,
             sum(n) OVER (ORDER BY s DESC) AS cum_rows,
             sum(pos) OVER (ORDER BY s DESC) AS cum_pos,
             sum(n) OVER () AS n_tot,
             sum(pos) OVER () AS p_tot
      FROM per_score
    ),
    dec AS (
      SELECT CAST(ceil(10.0 * cum_rows / n_tot) AS BIGINT) AS decile,
             n, pos, cum_rows, cum_pos, n_tot, p_tot
      FROM cum
    )
    SELECT decile,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           round(max(cum_pos) * 1.0 / max(p_tot), 6) AS cum_gain,
           round((max(cum_pos) * 1.0 / max(cum_rows))
                 / (max(p_tot) * 1.0 / max(n_tot)), 6) AS cum_lift
    FROM dec GROUP BY decile ORDER BY decile
    """,
    doc="Decile lift/gain table for `value` scoring the purchase label: "
    "rank rows by score descending, cut into ten tie-coherent deciles "
    "(a tied score never splits across deciles — deciles are assigned "
    "by cumulative END position, so the table is deterministic without "
    "a row-level tiebreak), and report per-decile positives, cumulative "
    "gain (share of all positives captured) and cumulative lift vs the "
    "base rate. The campaign-targeting view of the same ranking that "
    "auc_value_predicts_purchase scores globally. Ordered windows run "
    "over the distinct-score domain only.",
)
def lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_score(spark, sf_dir)
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = per.select(
        "n",
        "pos",
        F.sum("n").over(wdesc).alias("cum_rows"),
        F.sum("pos").over(wdesc).alias("cum_pos"),
        F.sum("n").over(wall).alias("n_tot"),
        F.sum("pos").over(wall).alias("p_tot"),
    )
    dec = cum.select(
        F.ceil(10.0 * F.col("cum_rows") / F.col("n_tot"))
        .cast("long")
        .alias("decile"),
        "n",
        "pos",
        "cum_rows",
        "cum_pos",
        "n_tot",
        "p_tot",
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.round(F.max("cum_pos") * 1.0 / F.max("p_tot"), 6).alias(
                "cum_gain"
            ),
            F.round(
                (F.max("cum_pos") * 1.0 / F.max("cum_rows"))
                / (F.max("p_tot") * 1.0 / F.max("n_tot")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


@register(
    "pr_auc_value",
    f"""
    WITH per_score AS ({_PER_SCORE}),
    cum AS (
      SELECT sum(n) OVER (ORDER BY s DESC) AS cum_rows,
             sum(pos) OVER (ORDER BY s DESC) AS cum_pos,
             sum(n) OVER () AS n_tot,
             sum(pos) OVER () AS p_tot
      FROM per_score
    ),
    pts AS (
      SELECT cum_pos * 1.0 / p_tot AS recall,
             cum_pos * 1.0 / cum_rows AS prec,
             lag(cum_pos * 1.0 / p_tot, 1, 0.0) OVER (ORDER BY cum_rows)
               AS recall_prev,
             n_tot, p_tot
      FROM cum
    )
    SELECT CAST(max(p_tot) AS BIGINT) AS n_pos,
           CAST(max(n_tot) - max(p_tot) AS BIGINT) AS n_neg,
           round(max(p_tot) * 1.0 / max(n_tot), 6) AS prevalence,
           round(sum((recall - recall_prev) * prec), 6) AS pr_auc
    FROM pts
    """,
    doc="Precision-recall AUC of `value` scoring the purchase label, "
    "step-interpolated over distinct-score blocks (each tied block "
    "contributes its recall increment times the precision at the block "
    "boundary — deterministic without a row-level tiebreak, the IR "
    "convention). The imbalanced-data companion to ROC AUC: its floor "
    "is the prevalence, not 0.5. Same compressed-domain shape as the "
    "AUC query: one grouped aggregate, two layered ordered windows "
    "over distinct scores.",
)
def pr_auc_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_score(spark, sf_dir)
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = per.select(
        F.sum("n").over(wdesc).alias("cum_rows"),
        F.sum("pos").over(wdesc).alias("cum_pos"),
        F.sum("n").over(wall).alias("n_tot"),
        F.sum("pos").over(wall).alias("p_tot"),
    )
    recall = F.col("cum_pos") * 1.0 / F.col("p_tot")
    pts = cum.select(
        recall.alias("recall"),
        (F.col("cum_pos") * 1.0 / F.col("cum_rows")).alias("prec"),
        F.lag(recall, 1, 0.0).over(Window.orderBy("cum_rows")).alias(
            "recall_prev"
        ),
        "n_tot",
        "p_tot",
    )
    return pts.agg(
        F.max("p_tot").cast("long").alias("n_pos"),
        (F.max("n_tot") - F.max("p_tot")).cast("long").alias("n_neg"),
        F.round(F.max("p_tot") * 1.0 / F.max("n_tot"), 6).alias("prevalence"),
        F.round(
            F.sum((F.col("recall") - F.col("recall_prev")) * F.col("prec")), 6
        ).alias("pr_auc"),
    )


# Engine-stable weekday: days since 1970-01-01 mod 7 (0 = Thursday).
_DAILY_DOW = """
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
               AS dow,
             CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2
"""


def _daily_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return daily.select(
        (F.datediff("day", F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow"),
        "day",
        "rev",
    )


@register(
    "anova_weekday_revenue",
    f"""
    WITH d AS ({_DAILY_DOW}),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
             sum(rev) AS s1, sum(rev * rev) AS s2
      FROM d GROUP BY dow
    ),
    t AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(s1) AS st,
             sum(s1 * s1 / n_g) AS sb_raw,
             sum(s2) AS ss
      FROM g
    )
    SELECT n AS n_days, k AS k_groups,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(n - k AS BIGINT) AS df2,
           round(((sb_raw - st * st / n) / (k - 1))
                 / ((ss - sb_raw) / (n - k)), 6) AS f_stat,
           round((sb_raw - st * st / n)
                 / (ss - st * st / n), 6) AS eta_sq
    FROM t
    """,
    doc="One-way ANOVA of daily revenue by weekday: F = between-group "
    "over within-group mean square, eta-squared the variance explained "
    "by weekday — the formal version of seasonal_hourly_factors' "
    "profile. Weekday is days-since-epoch mod 7 (engine-stable, no "
    "locale-dependent dayofweek). Orders reduce to |days| rows, then "
    "7-group sums, then a single-row closed form: SSB and SSW both "
    "come from raw sums, so the whole test is one linear aggregate "
    "chain with no second pass.",
)
def anova_weekday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_dow(spark, sf_dir)
    g = d.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("rev").alias("s1"),
        F.sum(F.col("rev") * F.col("rev")).alias("s2"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum("s1").alias("st"),
        F.sum(F.col("s1") * F.col("s1") / F.col("n_g")).alias("sb_raw"),
        F.sum("s2").alias("ss"),
    )
    ssb = F.col("sb_raw") - F.col("st") * F.col("st") / F.col("n")
    ssw = F.col("ss") - F.col("sb_raw")
    sst = F.col("ss") - F.col("st") * F.col("st") / F.col("n")
    return t.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


@register(
    "levene_brown_forsythe",
    f"""
    WITH d AS ({_DAILY_DOW}),
    med AS (
      SELECT dow,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY rev) AS med
      FROM d GROUP BY dow
    ),
    z AS (
      SELECT d.dow, abs(d.rev - med.med) AS z
      FROM d JOIN med ON d.dow = med.dow
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
             sum(z) AS s1, sum(z * z) AS s2
      FROM z GROUP BY dow
    ),
    t AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(s1) AS st,
             sum(s1 * s1 / n_g) AS sb_raw,
             sum(s2) AS ss
      FROM g
    )
    SELECT n AS n_days, k AS k_groups,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(n - k AS BIGINT) AS df2,
           round(((sb_raw - st * st / n) / (k - 1))
                 / ((ss - sb_raw) / (n - k)), 6) AS f_stat
    FROM t
    """,
    doc="Brown-Forsythe Levene test for variance homogeneity of daily "
    "revenue across weekdays: ANOVA on absolute deviations from the "
    "GROUP MEDIAN (the robust variant — group means would be fooled by "
    "the heavy right tail). Validates the equal-variance assumption "
    "behind anova_weekday_revenue. The daily table is cached once; "
    "group medians (7 rows) broadcast back onto it; the rest is the "
    "same closed-form sum algebra as the ANOVA. At 100 TB the median "
    "step swaps to approx_percentile partials.",
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_dow(spark, sf_dir).cache()
    med = d.groupBy("dow").agg(F.percentile("rev", 0.5).alias("med"))
    z = d.join(F.broadcast(med), "dow").select(
        "dow", F.abs(F.col("rev") - F.col("med")).alias("z")
    )
    g = z.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum("s1").alias("st"),
        F.sum(F.col("s1") * F.col("s1") / F.col("n_g")).alias("sb_raw"),
        F.sum("s2").alias("ss"),
    )
    ssb = F.col("sb_raw") - F.col("st") * F.col("st") / F.col("n")
    ssw = F.col("ss") - F.col("sb_raw")
    return t.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


@register(
    "granger_lag1_purchases",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS p,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT p AS y,
             lag(p) OVER (ORDER BY day) AS x1,
             lag(v) OVER (ORDER BY day) AS x2
      FROM d
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
             sum(x1 * x2) AS s12,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM lagged WHERE x1 IS NOT NULL AND x2 IS NOT NULL
    ),
    c AS (
      SELECT n,
             s11 - sx1 * sx1 / n AS c11,
             s22 - sx2 * sx2 / n AS c22,
             s12 - sx1 * sx2 / n AS c12,
             s1y - sx1 * sy / n AS c1y,
             s2y - sx2 * sy / n AS c2y,
             syy - sy * sy / n AS cyy
      FROM s
    ),
    fit AS (
      SELECT n, cyy,
             (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
             (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2,
             cyy - c1y * c1y / c11 AS sse_r,
             cyy - ((c22 * c1y - c12 * c2y) * c1y
                    + (c11 * c2y - c12 * c1y) * c2y)
                   / (c11 * c22 - c12 * c12) AS sse_u
      FROM c
    )
    SELECT n AS n_days,
           round(b2, 6) AS coef_lag_views,
           round(1.0 - sse_u / cyy, 6) AS r2_unrestricted,
           round(1.0 - sse_r / cyy, 6) AS r2_restricted,
           round((sse_r - sse_u) / (sse_u / (n - 3)), 6) AS f_stat
    FROM fit
    """,
    doc="Lag-1 Granger causality test: do yesterday's views predict "
    "today's purchases beyond yesterday's purchases? Unrestricted OLS "
    "p_t ~ p_(t-1) + v_(t-1) vs restricted p_t ~ p_(t-1), F = SSE "
    "reduction over unrestricted mean square. The 2-regressor normal "
    "equations are solved in closed form from centered sums, so the "
    "whole test is one events scan -> |days| table -> one lag window "
    "-> single-row aggregate (the cross-series extension of "
    "capm_beta_alpha's machinery).",
)
def granger_lag1_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("v"),
    )
    w = Window.orderBy("day")
    lagged = d.select(
        F.col("p").alias("y"),
        F.lag("p").over(w).alias("x1"),
        F.lag("v").over(w).alias("x2"),
    ).where(F.col("x1").isNotNull() & F.col("x2").isNotNull())
    s = lagged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("sx1") * F.col("sx1") / n
    c22 = F.col("s22") - F.col("sx2") * F.col("sx2") / n
    c12 = F.col("s12") - F.col("sx1") * F.col("sx2") / n
    c1y = F.col("s1y") - F.col("sx1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("sx2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b2 = (c11 * c2y - c12 * c1y) / det
    b1 = (c22 * c1y - c12 * c2y) / det
    sse_u = cyy - (b1 * c1y + b2 * c2y)
    sse_r = cyy - c1y * c1y / c11
    return s.select(
        n.alias("n_days"),
        F.round(b2, 6).alias("coef_lag_views"),
        F.round(1.0 - sse_u / cyy, 6).alias("r2_unrestricted"),
        F.round(1.0 - sse_r / cyy, 6).alias("r2_restricted"),
        F.round((sse_r - sse_u) / (sse_u / (n - 3)), 6).alias("f_stat"),
    )


@register(
    "heaps_law_fit",
    """
    WITH tok AS (
      SELECT doc_id, t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY doc_id
    ),
    first_occ AS (
      SELECT min(doc_id) AS doc_id FROM tok GROUP BY token
    ),
    new_per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nv
      FROM first_occ GROUP BY doc_id
    ),
    cum AS (
      SELECT sum(p.nt) OVER (ORDER BY p.doc_id) AS cum_n,
             sum(coalesce(nd.nv, 0)) OVER (ORDER BY p.doc_id) AS cum_v
      FROM per_doc p LEFT JOIN new_per_doc nd ON p.doc_id = nd.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(cum_n) AS BIGINT) AS total_tokens,
           CAST(max(cum_v) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(CAST(cum_v AS DOUBLE)),
                            ln(CAST(cum_n AS DOUBLE))), 4) AS heaps_beta,
           round(exp(regr_intercept(ln(CAST(cum_v AS DOUBLE)),
                                    ln(CAST(cum_n AS DOUBLE)))), 4) AS heaps_k,
           round(regr_r2(ln(CAST(cum_v AS DOUBLE)),
                         ln(CAST(cum_n AS DOUBLE))), 4) AS r2
    FROM cum WHERE cum_n > 0
    """,
    doc="Heaps'-law vocabulary-growth fit V(N) = K N^beta over the "
    "corpus in doc_id order: per-doc token counts and per-doc NEW-token "
    "counts (a token is new at its min doc_id — first-occurrence "
    "attribution, no running distinct needed) cumulate into the "
    "(tokens-seen, vocab-seen) curve, then a log-log regression "
    "recovers K and beta (natural text sits near beta 0.4-0.6; "
    "beta -> 1 flags synthetic/unmergeable vocab — the growth "
    "companion to zipf_token_slope's static fit). Token explode is one "
    "map-side pass consumed by two vocab/doc-bounded aggregates; the "
    "ordered window runs over |docs| rows.",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tok = tok.cache()
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("nt")
    )
    first_occ = tok.groupBy("token").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first_occ.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("nv")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "nt",
            F.coalesce("nv", F.lit(0)).alias("nv"),
        )
        .select(
            F.sum("nt").over(w).alias("cum_n"),
            F.sum("nv").over(w).alias("cum_v"),
        )
        .where(F.col("cum_n") > 0)
    )
    lv = F.log(F.col("cum_v").cast("double"))
    ln_ = F.log(F.col("cum_n").cast("double"))
    return cum.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max("cum_n").cast("long").alias("total_tokens"),
        F.max("cum_v").cast("long").alias("vocab_size"),
        F.round(F.regr_slope(lv, ln_), 4).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(lv, ln_)), 4).alias("heaps_k"),
        F.round(F.regr_r2(lv, ln_), 4).alias("r2"),
    )


@register(
    "youden_optimal_threshold",
    f"""
    WITH per_score AS ({_PER_SCORE}),
    cum AS (
      SELECT s,
             sum(pos) OVER (ORDER BY s DESC) AS tp,
             sum(n - pos) OVER (ORDER BY s DESC) AS fp,
             sum(pos) OVER () AS p_tot,
             sum(n - pos) OVER () AS n_tot
      FROM per_score
    ),
    j AS (
      SELECT s, tp, fp, p_tot, n_tot,
             tp * 1.0 / p_tot - fp * 1.0 / n_tot AS jstat
      FROM cum
    ),
    best AS (
      SELECT s, tp, fp, p_tot, n_tot, jstat,
             row_number() OVER (ORDER BY jstat DESC, s DESC) AS r
      FROM j
    )
    SELECT round(s, 6) AS threshold,
           round(tp * 1.0 / p_tot, 6) AS tpr,
           round(fp * 1.0 / n_tot, 6) AS fpr,
           round(jstat, 6) AS youden_j,
           CAST(tp AS BIGINT) AS n_tp,
           CAST(fp AS BIGINT) AS n_fp
    FROM best WHERE r = 1
    """,
    doc="Youden-optimal decision threshold for `value` scoring the "
    "purchase label: the score cutoff maximizing J = TPR - FPR (ties "
    "broken toward the higher threshold), with the operating point it "
    "buys. max J equals the KS separation between the positive and "
    "negative score distributions, so this also certifies the "
    "classifier's KS. Completes the ranking family: AUC summarizes the "
    "whole curve, PR-AUC the imbalanced view, lift/gain the campaign "
    "view — this picks the single deployable cutoff. Same "
    "distinct-score compressed domain as all of them.",
)
def youden_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_score(spark, sf_dir)
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = per.select(
        "s",
        F.sum("pos").over(wdesc).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(wdesc).alias("fp"),
        F.sum("pos").over(wall).alias("p_tot"),
        F.sum(F.col("n") - F.col("pos")).over(wall).alias("n_tot"),
    )
    j = cum.select(
        "s",
        "tp",
        "fp",
        "p_tot",
        "n_tot",
        (F.col("tp") * 1.0 / F.col("p_tot") - F.col("fp") * 1.0 / F.col("n_tot")).alias(
            "jstat"
        ),
    )
    best = j.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("jstat"), F.desc("s")))
        .alias("r"),
    ).where(F.col("r") == 1)
    return best.select(
        F.round("s", 6).alias("threshold"),
        F.round(F.col("tp") * 1.0 / F.col("p_tot"), 6).alias("tpr"),
        F.round(F.col("fp") * 1.0 / F.col("n_tot"), 6).alias("fpr"),
        F.round("jstat", 6).alias("youden_j"),
        F.col("tp").cast("long").alias("n_tp"),
        F.col("fp").cast("long").alias("n_fp"),
    )


_COS_EMB = """
    round(
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
      6)
"""


@register(
    "lexical_semantic_agreement",
    f"""
    WITH tok AS (
      SELECT doc_id, t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
    idf AS (
      SELECT token,
             ln((SELECT count(*) FROM documents) * 1.0
                / count(DISTINCT doc_id)) AS idf
      FROM tok GROUP BY token
    ),
    vec AS (
      SELECT tf.doc_id, tf.token, tf.c * idf.idf AS w
      FROM tf JOIN idf USING (token)
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM vec GROUP BY doc_id),
    q AS (SELECT token, w FROM vec WHERE doc_id = 0),
    dots AS (
      SELECT v.doc_id, sum(v.w * q.w) AS dot
      FROM vec v JOIN q USING (token) WHERE v.doc_id <> 0
      GROUP BY v.doc_id
    ),
    lex AS (
      SELECT d.doc_id,
             row_number() OVER (
               ORDER BY d.dot / (n.nrm
                 * (SELECT nrm FROM nrm WHERE doc_id = 0)) DESC, d.doc_id
             ) AS r
      FROM dots d JOIN nrm n USING (doc_id)
    ),
    sem AS (
      SELECT a.vec_id,
             row_number() OVER (ORDER BY {_COS_EMB} DESC, a.vec_id) AS r
      FROM embeddings a,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) b
      WHERE a.vec_id <> 0
    ),
    ov AS (
      SELECT CAST(count(*) AS BIGINT) AS overlap
      FROM (SELECT doc_id FROM lex WHERE r <= 10) l
      JOIN (SELECT vec_id FROM sem WHERE r <= 10) s ON l.doc_id = s.vec_id
    )
    SELECT CAST(10 AS BIGINT) AS k,
           overlap,
           round(overlap * 1.0 / (20 - overlap), 6) AS jaccard
    FROM ov
    """,
    doc="Lexical-vs-semantic retrieval agreement for query document 0: "
    "the top-10 neighbors under TF-IDF cosine (sparse lexical vectors "
    "over the corpus vocabulary) against the top-10 under embedding "
    "cosine, reported as overlap and Jaccard — the hybrid-search "
    "diagnostic that says whether the two retrieval modalities are "
    "redundant (high overlap) or complementary (low; fuse them, as "
    "the RAG pipeline does). Lexical scoring: |docs x vocab| tf-idf "
    "table, query vector broadcast back, grouped dot products; "
    "semantic: the knn_cosine_bruteforce chain. Both top-10s use "
    "deterministic score-desc/id tiebreaks.",
)
def lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tok = tok.cache()
    n_docs = docs.count()
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    idf = tok.groupBy("token").agg(
        F.log(
            F.lit(float(n_docs)) / F.countDistinct("doc_id")
        ).alias("idf")
    )
    vec = tf.join(F.broadcast(idf), "token").select(
        "doc_id", "token", (F.col("c") * F.col("idf")).alias("w")
    )
    vec = vec.cache()
    nrm = vec.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    q = vec.where(F.col("doc_id") == 0).select(
        F.col("token"), F.col("w").alias("qw")
    )
    qnrm = float(
        nrm.where(F.col("doc_id") == 0).collect()[0]["nrm"]
    )  # driver-sized scalar (the query's own norm)
    dots = (
        vec.where(F.col("doc_id") != 0)
        .join(F.broadcast(q), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    lex = (
        dots.join(nrm, "doc_id")
        .select(
            "doc_id",
            (F.col("dot") / (F.col("nrm") * F.lit(qnrm))).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    from ..operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    sem = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=10
    ).select(F.col("vec_id").alias("doc_id"))
    overlap = lex.join(sem, "doc_id").count()
    return spark.createDataFrame(
        [(10, overlap, round(overlap / (20 - overlap), 6))],
        "k long, overlap long, jaccard double",
    )
