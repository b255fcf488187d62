"""Spectral seasonality detection and closed-form cross-validation —
round-6 continuation series/eval extensions.

Reference capability these generalize: the reference eyeballs weekly
seasonality on its dashboards (report §8) and validates its forecaster
with a single holdout (model notebooks); this module adds the
discrete-periodogram scan that finds the dominant period numerically
and a 5-fold cross-validated RMSE for the linear daily-revenue
forecaster where every fold's fit AND its test error come from the
same closed-form sums (the leave-fold-out subtraction trick used by
target_encode_kfold, applied to regression).

Scale posture: both queries reduce the raw scan to the |days| table
first; the periodogram fans that table out by a 29-element literal
period list (bounded), and CV works on a 5-row fold-sum table with a
global window — no per-row refit, no join back to raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register, roundz

_PERIODS = list(range(2, 31))


@register(
    "periodogram_top_periods",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    std AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             (rev - avg(rev) OVER ()) / stddev_samp(rev) OVER () AS r,
             count(*) OVER () AS n
      FROM daily
    ),
    fan AS (
      SELECT p.p, s.t, s.r, s.n
      FROM std s CROSS JOIN (SELECT unnest(ARRAY{_PERIODS}) AS p) p
    )
    SELECT p AS period,
           round((pow(sum(r * cos(2 * pi() * t / p)), 2)
                  + pow(sum(r * sin(2 * pi() * t / p)), 2))
                 / max(n), 6) AS power
    FROM fan GROUP BY p ORDER BY p
    """,
    doc="Discrete periodogram of standardized daily revenue over "
    "candidate periods 2-30 days: spectral power at period p is "
    "|sum r_t e^(-2pi i t/p)|^2 / n — the weekly cycle shows up as the "
    "p=7 peak (plus harmonics), turning the dashboard's eyeballed "
    "seasonality into a number. Standardizing first keeps the power "
    "O(1) so the 6-decimal round is robust to summation-order float "
    "noise. One orders scan -> |days| table; the 29-element literal "
    "period list fans out the compressed domain only (29 x |days| "
    "rows), then grouped trig sums — no FFT machinery needed at this "
    "period range, and the shape is embarrassingly parallel at 100 TB.",
)
def periodogram_top_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wall = Window.partitionBy()
    std = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (
            (F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("r"),
        F.count("*").over(wall).alias("n"),
    )
    periods = spark.range(2, 31).select(F.col("id").alias("p"))
    fan = std.crossJoin(F.broadcast(periods))
    ang = 2 * F.lit(3.141592653589793) * F.col("t") / F.col("p")
    return (
        fan.groupBy("p")
        .agg(
            F.round(
                (
                    F.pow(F.sum(F.col("r") * F.cos(ang)), 2)
                    + F.pow(F.sum(F.col("r") * F.sin(ang)), 2)
                )
                / F.max("n"),
                6,
            ).alias("power")
        )
        .select(F.col("p").alias("period"), "power")
        .orderBy("period")
    )


@register(
    "cv_rmse_linreg_daily",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev FROM daily
    ),
    folds AS (
      SELECT t % 5 AS fold, CAST(count(*) AS BIGINT) AS n_f,
             sum(t * 1.0) AS st, sum(rev) AS sy,
             sum(t * 1.0 * t) AS stt, sum(t * rev) AS sty,
             sum(rev * rev) AS syy
      FROM idx GROUP BY 1
    ),
    g AS (
      SELECT fold, n_f, st, sy, stt, sty, syy,
             sum(n_f) OVER () - n_f AS n_tr,
             sum(st) OVER () - st AS st_tr,
             sum(sy) OVER () - sy AS sy_tr,
             sum(stt) OVER () - stt AS stt_tr,
             sum(sty) OVER () - sty AS sty_tr
      FROM folds
    ),
    fit AS (
      SELECT fold, n_f, st, sy, stt, sty, syy,
             (sty_tr - st_tr * sy_tr / n_tr)
               / (stt_tr - st_tr * st_tr / n_tr) AS b,
             sy_tr / n_tr - (sty_tr - st_tr * sy_tr / n_tr)
               / (stt_tr - st_tr * st_tr / n_tr) * st_tr / n_tr AS a
      FROM g
    )
    SELECT fold, n_f AS n_test,
           round(sqrt((syy - 2 * a * sy - 2 * b * sty
                       + 2 * a * b * st + a * a * n_f + b * b * stt)
                      / n_f), 6) AS rmse
    FROM fit ORDER BY fold
    """,
    doc="5-fold cross-validated RMSE of the linear daily-revenue "
    "forecaster (rev ~ day index, folds = t mod 5): each fold's OLS fit "
    "uses the leave-fold-out sums (global window minus the fold's own "
    "row — the target_encode_kfold subtraction trick), and the held-out "
    "RMSE expands algebraically from the SAME per-fold sufficient "
    "statistics, so there is no per-fold refit and no join back to "
    "rows: one orders scan -> |days| -> 5-row fold table -> closed "
    "form. The honest generalization number behind forecast_linear.",
)
def cv_rmse_linreg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "rev"
    )
    folds = idx.groupBy((F.col("t") % 5).alias("fold")).agg(
        F.count("*").cast("long").alias("n_f"),
        F.sum(F.col("t") * 1.0).alias("st"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("t") * 1.0 * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("rev")).alias("sty"),
        F.sum(F.col("rev") * F.col("rev")).alias("syy"),
    )
    wall = Window.partitionBy()
    g = folds.select(
        "*",
        (F.sum("n_f").over(wall) - F.col("n_f")).alias("n_tr"),
        (F.sum("st").over(wall) - F.col("st")).alias("st_tr"),
        (F.sum("sy").over(wall) - F.col("sy")).alias("sy_tr"),
        (F.sum("stt").over(wall) - F.col("stt")).alias("stt_tr"),
        (F.sum("sty").over(wall) - F.col("sty")).alias("sty_tr"),
    )
    b = (
        F.col("sty_tr") - F.col("st_tr") * F.col("sy_tr") / F.col("n_tr")
    ) / (F.col("stt_tr") - F.col("st_tr") * F.col("st_tr") / F.col("n_tr"))
    a = F.col("sy_tr") / F.col("n_tr") - b * F.col("st_tr") / F.col("n_tr")
    mse = (
        F.col("syy")
        - 2 * a * F.col("sy")
        - 2 * b * F.col("sty")
        + 2 * a * b * F.col("st")
        + a * a * F.col("n_f")
        + b * b * F.col("stt")
    ) / F.col("n_f")
    return (
        g.select(
            "fold",
            F.col("n_f").alias("n_test"),
            F.round(F.sqrt(mse), 6).alias("rmse"),
        )
        .orderBy("fold")
    )


@register(
    "regression_diagnostics_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x2,
             sum(value) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT day, x1, x2, y,
             count(*) OVER () AS n,
             sum(x1) OVER () AS sx1, sum(x2) OVER () AS sx2,
             sum(y) OVER () AS sy,
             sum(x1 * x1) OVER () AS s11, sum(x2 * x2) OVER () AS s22,
             sum(x1 * x2) OVER () AS s12,
             sum(x1 * y) OVER () AS s1y, sum(x2 * y) OVER () AS s2y,
             sum(y * y) OVER () AS syy
      FROM d
    ),
    c AS (
      SELECT day, x1, x2, y, n,
             s11 - sx1 * sx1 / n AS c11, s22 - sx2 * sx2 / n AS c22,
             s12 - sx1 * sx2 / n AS c12,
             s1y - sx1 * sy / n AS c1y, s2y - sx2 * sy / n AS c2y,
             syy - sy * sy / n AS cyy,
             sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
      FROM s
    ),
    fit AS (
      SELECT day, y, n, cyy, c11, c22, c12,
             (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
             (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2,
             c1y, c2y, mx1, mx2, my, x1, x2
      FROM c
    ),
    resid AS (
      SELECT day, n, cyy, c11, c22, c12, b1, b2, c1y, c2y,
             y - (my - b1 * mx1 - b2 * mx2) - b1 * x1 - b2 * x2 AS e
      FROM fit
    ),
    dw AS (
      SELECT n, cyy, c11, c22, c12, b1, b2, c1y, c2y, e,
             e - lag(e) OVER (ORDER BY day) AS de
      FROM resid
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           round(max(b1), 6) AS beta_purchases,
           round(max(b2), 6) AS beta_views,
           round((max(b1) * max(c1y) + max(b2) * max(c2y)) / max(cyy), 6)
             AS r2,
           round(1.0 - (1.0 - (max(b1) * max(c1y) + max(b2) * max(c2y))
                        / max(cyy))
                 * (max(n) - 1.0) / (max(n) - 3.0), 6) AS adj_r2,
           round(1.0 / (1.0 - max(c12) * max(c12)
                        / (max(c11) * max(c22))), 6) AS vif,
           round(sum(de * de) / sum(e * e), 6) AS durbin_watson
    FROM dw
    """,
    doc="Regression diagnostics panel for daily revenue on daily "
    "purchase and view counts: R-squared / adjusted R-squared from the "
    "closed-form 2-regressor fit, the variance inflation factor "
    "1/(1 - r12^2) quantifying collinearity between the regressors, "
    "and the Durbin-Watson statistic on the residual series (near 2 = "
    "no serial correlation; the assumption check behind every OLS "
    "trend query in the registry). The betas ride the |days| table as "
    "global-window sums so the residuals are computed in the SAME "
    "linear chain — no coefficient join-back, no second scan.",
)
def regression_diagnostics_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("x1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("x2"),
        F.sum("value").alias("y"),
    )
    wall = Window.partitionBy()
    s = d.select(
        "day",
        "x1",
        "x2",
        "y",
        F.count("*").over(wall).alias("n"),
        F.sum("x1").over(wall).alias("sx1"),
        F.sum("x2").over(wall).alias("sx2"),
        F.sum("y").over(wall).alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).over(wall).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).over(wall).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).over(wall).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).over(wall).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).over(wall).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("sx1") * F.col("sx1") / n
    c22 = F.col("s22") - F.col("sx2") * F.col("sx2") / n
    c12 = F.col("s12") - F.col("sx1") * F.col("sx2") / n
    c1y = F.col("s1y") - F.col("sx1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("sx2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    a = (
        F.col("sy") / n
        - b1 * F.col("sx1") / n
        - b2 * F.col("sx2") / n
    )
    resid = s.select(
        "day",
        "n",
        cyy.alias("cyy"),
        c11.alias("c11"),
        c22.alias("c22"),
        c12.alias("c12"),
        b1.alias("b1"),
        b2.alias("b2"),
        c1y.alias("c1y"),
        c2y.alias("c2y"),
        (F.col("y") - a - b1 * F.col("x1") - b2 * F.col("x2")).alias("e"),
    )
    dw = resid.select(
        "*", (F.col("e") - F.lag("e").over(Window.orderBy("day"))).alias("de")
    )
    r2 = (F.max("b1") * F.max("c1y") + F.max("b2") * F.max("c2y")) / F.max(
        "cyy"
    )
    return dw.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("b1"), 6).alias("beta_purchases"),
        F.round(F.max("b2"), 6).alias("beta_views"),
        F.round(r2, 6).alias("r2"),
        F.round(
            1.0 - (1.0 - r2) * (F.max("n") - 1.0) / (F.max("n") - 3.0), 6
        ).alias("adj_r2"),
        F.round(
            1.0
            / (1.0 - F.max("c12") * F.max("c12") / (F.max("c11") * F.max("c22"))),
            6,
        ).alias("vif"),
        F.round(
            F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e")),
            6,
        ).alias("durbin_watson"),
    )


@register(
    "engle_granger_cointegration",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS p,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    cumser AS (
      SELECT day,
             sum(p) OVER (ORDER BY day) AS cp,
             sum(v) OVER (ORDER BY day) AS cv
      FROM d
    ),
    s AS (
      SELECT day, cp, cv,
             count(*) OVER () AS n,
             sum(cv) OVER () AS sx, sum(cp) OVER () AS sy,
             sum(cv * cv) OVER () AS sxx, sum(cv * cp) OVER () AS sxy
      FROM cumser
    ),
    resid AS (
      SELECT day, n,
             cp - (sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                   * sx / n)
                - (sxy - sx * sy / n) / (sxx - sx * sx / n) * cv AS e
      FROM s
    ),
    lagged AS (
      SELECT n, e,
             lag(e) OVER (ORDER BY day) AS e1
      FROM resid
    ),
    adf AS (
      SELECT CAST(max(n) AS BIGINT) AS n_days,
             sum(e1 * (e - e1)) / sum(e1 * e1) AS gamma,
             sum(e1 * e1) AS see1,
             CAST(count(e1) AS BIGINT) AS m
      FROM lagged WHERE e1 IS NOT NULL
    ),
    sse AS (
      SELECT a.n_days, a.gamma, a.see1, a.m,
             sum(pow((l.e - l.e1) - a.gamma * l.e1, 2)) AS ss
      FROM lagged l, adf a WHERE l.e1 IS NOT NULL
      GROUP BY a.n_days, a.gamma, a.see1, a.m
    )
    SELECT n_days,
           round(gamma, 6) AS gamma,
           round(gamma / sqrt((ss / (m - 1)) / see1), 6) AS adf_t,
           gamma / sqrt((ss / (m - 1)) / see1) < -3.34 AS cointegrated_5pct
    FROM sse
    """,
    doc="Engle-Granger two-step cointegration test between the "
    "cumulative purchase and view series: step 1 fits the long-run "
    "relation cp ~ cv in closed form (coefficients ride the |days| "
    "table as global windows — residuals in the same chain, no "
    "join-back); step 2 runs the no-constant ADF regression "
    "delta_e ~ e_(t-1) and compares the t-statistic to the -3.34 "
    "Engle-Granger 5% critical value (2 variables, no trend). Two "
    "integrated counting series from the same user population SHOULD "
    "cointegrate — a break in this relation flags a structural change "
    "upstream. One events scan; every window runs over |days|.",
)
def engle_granger_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("v"),
    )
    wday = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cumser = d.select(
        "day",
        F.sum("p").over(wday).alias("cp"),
        F.sum("v").over(wday).alias("cv"),
    )
    wall = Window.partitionBy()
    s = cumser.select(
        "day",
        "cp",
        "cv",
        F.count("*").over(wall).alias("n"),
        F.sum("cv").over(wall).alias("sx"),
        F.sum("cp").over(wall).alias("sy"),
        F.sum(F.col("cv") * F.col("cv")).over(wall).alias("sxx"),
        F.sum(F.col("cv") * F.col("cp")).over(wall).alias("sxy"),
    )
    n = F.col("n")
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    a = F.col("sy") / n - b * F.col("sx") / n
    resid = s.select(
        "day", "n", (F.col("cp") - a - b * F.col("cv")).alias("e")
    )
    lagged = resid.select(
        "n", "e", F.lag("e").over(Window.orderBy("day")).alias("e1")
    ).where(F.col("e1").isNotNull())
    # gamma rides the lagged table as a global window, so the ADF
    # residual sum-of-squares is a plain aggregate over the same rows
    g1 = lagged.select(
        "n",
        "e",
        "e1",
        (
            F.sum(F.col("e1") * (F.col("e") - F.col("e1"))).over(wall)
            / F.sum(F.col("e1") * F.col("e1")).over(wall)
        ).alias("gamma"),
        F.sum(F.col("e1") * F.col("e1")).over(wall).alias("see1"),
        F.count("e1").over(wall).alias("m"),
    )
    adf = g1.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("gamma").alias("gamma"),
        F.max("see1").alias("see1"),
        F.max("m").cast("long").alias("m"),
        F.sum(
            F.pow(
                (F.col("e") - F.col("e1")) - F.col("gamma") * F.col("e1"), 2
            )
        ).alias("ss"),
    )
    t = F.col("gamma") / F.sqrt(
        (F.col("ss") / (F.col("m") - 1)) / F.col("see1")
    )
    return adf.select(
        "n_days",
        F.round("gamma", 6).alias("gamma"),
        F.round(t, 6).alias("adf_t"),
        (t < -3.34).alias("cointegrated_5pct"),
    )


@register(
    "newey_west_trend_test",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev FROM daily
    ),
    s AS (
      SELECT t, rev,
             count(*) OVER () AS n,
             sum(t * 1.0) OVER () AS sx, sum(rev) OVER () AS sy,
             sum(t * 1.0 * t) OVER () AS sxx, sum(t * rev) OVER () AS sxy
      FROM idx
    ),
    resid AS (
      SELECT t, n,
             t - sx / n AS xc,
             rev - (sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                    * sx / n)
                 - (sxy - sx * sy / n) / (sxx - sx * sx / n) * t AS e,
             sxx - sx * sx / n AS cxx,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b
      FROM s
    ),
    u AS (
      SELECT t, n, cxx, b, xc * e AS u,
             lag(xc * e, 1) OVER (ORDER BY t) AS u1,
             lag(xc * e, 2) OVER (ORDER BY t) AS u2,
             lag(xc * e, 3) OVER (ORDER BY t) AS u3,
             lag(xc * e, 4) OVER (ORDER BY t) AS u4,
             lag(xc * e, 5) OVER (ORDER BY t) AS u5
      FROM resid
    ),
    lrv AS (
      SELECT CAST(max(n) AS BIGINT) AS n_days, max(cxx) AS cxx, max(b) AS b,
             sum(u * u)
             + 2 * (5.0/6.0) * sum(u * coalesce(u1, 0.0))
             + 2 * (4.0/6.0) * sum(u * coalesce(u2, 0.0))
             + 2 * (3.0/6.0) * sum(u * coalesce(u3, 0.0))
             + 2 * (2.0/6.0) * sum(u * coalesce(u4, 0.0))
             + 2 * (1.0/6.0) * sum(u * coalesce(u5, 0.0)) AS s_hac
      FROM u
    )
    SELECT n_days,
           round(b, 6) AS slope,
           round(sqrt(s_hac) / cxx, 6) AS hac_se,
           round(b / (sqrt(s_hac) / cxx), 6) AS t_hac,
           round(least(1.0, 2.0 * exp(-pow(b / (sqrt(s_hac) / cxx), 2)
                                      / 2.0)), 6) AS p_bound
    FROM lrv
    """,
    doc="Newey-West HAC test of the daily-revenue time trend: the OLS "
    "slope's standard error replaces the iid formula with the "
    "Bartlett-weighted long-run variance of the score series x_c*e "
    "(lags 1-5), so serial correlation — which durbin_watson showed — "
    "no longer understates the SE. Slope and residuals come from "
    "global-window sums over the |days| table; the five lag columns "
    "share one ordered window; a sub-Gaussian bound gives the "
    "engine-portable p. The honest version of linreg_value_trend's "
    "significance.",
)
def newey_west_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "rev"
    )
    wall = Window.partitionBy()
    s = idx.select(
        "t",
        "rev",
        F.count("*").over(wall).alias("n"),
        F.sum(F.col("t") * 1.0).over(wall).alias("sx"),
        F.sum("rev").over(wall).alias("sy"),
        F.sum(F.col("t") * 1.0 * F.col("t")).over(wall).alias("sxx"),
        F.sum(F.col("t") * F.col("rev")).over(wall).alias("sxy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / cxx
    a = F.col("sy") / n - b * F.col("sx") / n
    resid = s.select(
        "t",
        "n",
        (F.col("t") - F.col("sx") / n).alias("xc"),
        (F.col("rev") - a - b * F.col("t")).alias("e"),
        cxx.alias("cxx"),
        b.alias("b"),
    )
    wt = Window.orderBy("t")
    u0 = F.col("xc") * F.col("e")
    u = resid.select(
        "t",
        "n",
        "cxx",
        "b",
        u0.alias("u"),
        *[F.lag(u0, lag).over(wt).alias(f"u{lag}") for lag in range(1, 6)],
    )
    s_hac = F.sum(F.col("u") * F.col("u"))
    for lag in range(1, 6):
        s_hac = s_hac + 2.0 * ((6.0 - lag) / 6.0) * F.sum(
            F.col("u") * F.coalesce(F.col(f"u{lag}"), F.lit(0.0))
        )
    lrv = u.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max("cxx").alias("cxx"),
        F.max("b").alias("b"),
        s_hac.alias("s_hac"),
    )
    se = F.sqrt(F.col("s_hac")) / F.col("cxx")
    t = F.col("b") / se
    return lrv.select(
        "n_days",
        F.round("b", 6).alias("slope"),
        F.round(se, 6).alias("hac_se"),
        F.round(t, 6).alias("t_hac"),
        F.round(
            F.least(F.lit(1.0), 2.0 * F.exp(-F.pow(t, 2) / 2.0)), 6
        ).alias("p_bound"),
    )


@register(
    "breusch_pagan_daily",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev FROM daily
    ),
    s AS (
      SELECT t, rev,
             count(*) OVER () AS n,
             sum(t * 1.0) OVER () AS sx, sum(rev) OVER () AS sy,
             sum(t * 1.0 * t) OVER () AS sxx, sum(t * rev) OVER () AS sxy
      FROM idx
    ),
    resid AS (
      SELECT t, n, sx, sxx,
             pow(rev - (sy / n - (sxy - sx * sy / n)
                        / (sxx - sx * sx / n) * sx / n)
                     - (sxy - sx * sy / n) / (sxx - sx * sx / n) * t,
                 2) AS e2
      FROM s
    ),
    aux AS (
      SELECT n,
             sum(e2) OVER () AS se2, sum(t * e2) OVER () AS ste2,
             sum(e2 * e2) OVER () AS se4,
             sx, sxx, t, e2
      FROM resid
    ),
    r2 AS (
      SELECT CAST(max(n) AS BIGINT) AS n_days,
             pow(max(ste2) - max(sx) * max(se2) / max(n), 2)
               / ((max(sxx) - max(sx) * max(sx) / max(n))
                  * (max(se4) - max(se2) * max(se2) / max(n))) AS r2aux
      FROM aux
    )
    SELECT n_days,
           round(n_days * r2aux, 6) AS bp_stat,
           round(least(1.0, 2.0 * exp(-n_days * r2aux / 2.0)), 6) AS p_bound,
           n_days * r2aux > 3.841 AS heteroskedastic_5pct
    FROM r2
    """,
    doc="Breusch-Pagan heteroskedasticity test for the daily-revenue "
    "trend regression: squared residuals are regressed on the day "
    "index (the studentized Koenker form n*R-squared, chi-square 1 df "
    "— 3.841 critical value at 5%). Heteroskedastic residuals mean the "
    "iid OLS standard errors are wrong in a different way than serial "
    "correlation (Durbin-Watson) — together with newey_west_trend_test "
    "this completes the assumption audit for the trend family. Same "
    "shape: global-window sums over |days|, one scan, no join.",
)
def breusch_pagan_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "rev"
    )
    wall = Window.partitionBy()
    s = idx.select(
        "t",
        "rev",
        F.count("*").over(wall).alias("n"),
        F.sum(F.col("t") * 1.0).over(wall).alias("sx"),
        F.sum("rev").over(wall).alias("sy"),
        F.sum(F.col("t") * 1.0 * F.col("t")).over(wall).alias("sxx"),
        F.sum(F.col("t") * F.col("rev")).over(wall).alias("sxy"),
    )
    n = F.col("n")
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    a = F.col("sy") / n - b * F.col("sx") / n
    resid = s.select(
        "t",
        "n",
        "sx",
        "sxx",
        F.pow(F.col("rev") - a - b * F.col("t"), 2).alias("e2"),
    )
    aux = resid.select(
        "n",
        "sx",
        "sxx",
        "t",
        "e2",
        F.sum("e2").over(wall).alias("se2"),
        F.sum(F.col("t") * F.col("e2")).over(wall).alias("ste2"),
        F.sum(F.col("e2") * F.col("e2")).over(wall).alias("se4"),
    )
    r2aux = F.pow(
        F.max("ste2") - F.max("sx") * F.max("se2") / F.max("n"), 2
    ) / (
        (F.max("sxx") - F.max("sx") * F.max("sx") / F.max("n"))
        * (F.max("se4") - F.max("se2") * F.max("se2") / F.max("n"))
    )
    out = aux.agg(
        F.max("n").cast("long").alias("n_days"), r2aux.alias("r2aux")
    )
    bp = F.col("n_days") * F.col("r2aux")
    return out.select(
        "n_days",
        F.round(bp, 6).alias("bp_stat"),
        F.round(F.least(F.lit(1.0), 2.0 * F.exp(-bp / 2.0)), 6).alias(
            "p_bound"
        ),
        (bp > 3.841).alias("heteroskedastic_5pct"),
    )


@register(
    "lad_trend_profile",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev FROM daily
    ),
    s AS (
      SELECT t, rev,
             (sum(t * rev) OVER () - sum(t * 1.0) OVER ()
                * sum(rev) OVER () / count(*) OVER ())
             / (sum(t * 1.0 * t) OVER () - sum(t * 1.0) OVER ()
                * sum(t * 1.0) OVER () / count(*) OVER ()) AS b_ols
      FROM idx
    ),
    fan AS (
      SELECT g.i, s.t, s.rev, s.b_ols,
             s.rev - s.b_ols * (g.i / 8.0) * s.t AS u
      FROM s CROSS JOIN (SELECT unnest(range(0, 17)) AS i) g
    ),
    med AS (
      SELECT i, percentile_cont(0.5) WITHIN GROUP (ORDER BY u) AS a
      FROM fan GROUP BY i
    ),
    loss AS (
      SELECT f.i,
             max(f.b_ols) * (f.i / 8.0) AS slope,
             avg(abs(f.u - m.a)) / 2.0 AS pinball
      FROM fan f JOIN med m ON f.i = m.i
      GROUP BY f.i
    )
    SELECT CAST(i AS BIGINT) AS grid_i,
           round(slope, 6) + 0.0 AS slope,
           round(pinball, 6) AS pinball_loss,
           pinball = min(pinball) OVER () AS is_best
    FROM loss ORDER BY grid_i
    """,
    doc="Median (LAD) trend regression by profile search: for 17 slope "
    "candidates spanning 0-2x the OLS slope, the optimal intercept in "
    "closed form is the median of the de-trended series, and the "
    "tau=0.5 pinball loss reduces to half the mean absolute residual — "
    "so the robust regression that normally needs iterative "
    "reweighting becomes one grouped-percentile pass over a "
    "|days| x 17 fanout (the OLS slope rides the daily table as "
    "global-window sums; the grid is a literal broadcast). The "
    "LAD answer to linreg_value_trend when outlier days drag OLS.",
)
def lad_trend_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "rev"
    )
    wall = Window.partitionBy()
    n = F.count("*").over(wall)
    sx = F.sum(F.col("t") * 1.0).over(wall)
    sy = F.sum("rev").over(wall)
    sxx = F.sum(F.col("t") * 1.0 * F.col("t")).over(wall)
    sxy = F.sum(F.col("t") * F.col("rev")).over(wall)
    s = idx.select(
        "t",
        "rev",
        ((sxy - sx * sy / n) / (sxx - sx * sx / n)).alias("b_ols"),
    )
    grid = spark.range(0, 17).select(F.col("id").alias("i"))
    fan = s.crossJoin(F.broadcast(grid)).select(
        "i",
        "t",
        "rev",
        "b_ols",
        (
            F.col("rev") - F.col("b_ols") * (F.col("i") / 8.0) * F.col("t")
        ).alias("u"),
    )
    fan = fan.cache()
    med = fan.groupBy("i").agg(F.percentile("u", 0.5).alias("a"))
    loss = (
        fan.join(F.broadcast(med), "i")
        .groupBy("i")
        .agg(
            (F.max("b_ols") * (F.col("i") / 8.0)).alias("slope"),
            (F.avg(F.abs(F.col("u") - F.col("a"))) / 2.0).alias("pinball"),
        )
    )
    return loss.select(
        F.col("i").cast("long").alias("grid_i"),
        # roundz: grid_i=0 has slope = b_ols * 0, which is IEEE -0.0
        # when b_ols < 0 — DuckDB preserves the sign, Spark's round
        # canonicalizes (surfaced by the sf0.1 bit-exact sweep, r11)
        roundz(F.col("slope")).alias("slope"),
        F.round("pinball", 6).alias("pinball_loss"),
        (F.col("pinball") == F.min("pinball").over(wall)).alias("is_best"),
    ).orderBy("grid_i")
