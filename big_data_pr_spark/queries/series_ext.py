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
from .registry import register

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
