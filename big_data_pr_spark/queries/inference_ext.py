"""Resampling inference and regularized regression — an exact
engine-deterministic permutation test and a closed-form ridge path.

Reference capability these generalize: the reference's notebooks
validate differences by eyeballing dashboard panels; a data engine
needs distribution-free significance (the permutation test — no
normality assumption, unlike welch_ttest_purchase_vs_view) and a
shrinkage-aware trend fit (the ridge path — the regularized
counterpart of regression_diagnostics_daily's OLS).

Engine determinism: the permutation labels are not pseudo-random from
an RNG (engines differ) but derived from md5(event_id || '_' || r) —
the same cross-engine hash trick split_by_hash uses — so both engines
materialize the IDENTICAL R permutations; extremeness is compared on
6-dp-rounded diffs so float summation order cannot flip a boundary
permutation. The ridge solve is the explicit 2x2 closed form, no
iterative optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

_N_PERM = 200


@register(
    "permutation_test_value",
    f"""
    WITH ev AS MATERIALIZED (
      SELECT event_id, event_type, value FROM events
      WHERE event_type IN ('purchase', 'view')
    ),
    sizes AS (
      SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
      FROM ev
    ),
    obs AS (
      SELECT avg(CASE WHEN event_type = 'purchase' THEN value END)
             - avg(CASE WHEN event_type = 'view' THEN value END) AS d
      FROM ev
    ),
    fan AS (
      SELECT r.r, e.event_id, e.value,
             row_number() OVER (
               PARTITION BY r.r
               ORDER BY md5(e.event_id || '_' || r.r), e.event_id
             ) AS rk
      FROM ev e CROSS JOIN (SELECT unnest(range(1, {_N_PERM + 1})) AS r) r
    ),
    perm AS (
      SELECT f.r,
             avg(CASE WHEN f.rk <= s.np THEN f.value END)
             - avg(CASE WHEN f.rk > s.np THEN f.value END) AS d
      FROM fan f CROSS JOIN sizes s
      GROUP BY f.r
    )
    SELECT round(o.d, 4) AS obs_diff,
           CAST({_N_PERM} AS BIGINT) AS n_perm,
           CAST(sum(CASE WHEN round(abs(p.d), 6) >= round(abs(o.d), 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((1 + sum(CASE WHEN round(abs(p.d), 6) >= round(abs(o.d), 6)
                               THEN 1 ELSE 0 END))
                 * 1.0 / ({_N_PERM} + 1), 6) AS p_value
    FROM perm p CROSS JOIN obs o
    GROUP BY o.d
    """,
    doc="Exact two-sample permutation test for mean(value): purchase vs "
    f"view, {_N_PERM} label permutations. Each permutation re-ranks "
    "the pooled rows by md5(event_id_r) and assigns the first "
    "n_purchase ranks to the treatment group — a true permutation "
    "(group sizes preserved), identical on both engines because the "
    "hash IS the randomness. p = (1 + #extreme)/(R+1) with the "
    "add-one correction. Distribution-free twin of "
    "welch_ttest_purchase_vs_view. Cost shape: |rows| x R fan-out, "
    "per-permutation rank (partitioned sort) + one grouped avg — "
    "embarrassingly parallel across permutations; at 100 TB the "
    "permutation axis is the natural partition key and R caps the "
    "blow-up explicitly.",
)
def permutation_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_id", "event_type", "value")
    )
    sizes = ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np")
    )
    obs = ev.agg(
        (
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value")))
            - F.avg(F.when(F.col("event_type") == "view", F.col("value")))
        ).alias("d")
    )
    rr = spark.range(1, _N_PERM + 1).select(F.col("id").alias("r"))
    w = Window.partitionBy("r").orderBy(
        F.md5(F.concat_ws("_", "event_id", "r")), F.col("event_id")
    )
    fan = ev.crossJoin(F.broadcast(rr)).select(
        "r", "event_id", "value", F.row_number().over(w).alias("rk")
    )
    perm = (
        fan.crossJoin(F.broadcast(sizes))
        .groupBy("r")
        .agg(
            (
                F.avg(F.when(F.col("rk") <= F.col("np"), F.col("value")))
                - F.avg(F.when(F.col("rk") > F.col("np"), F.col("value")))
            ).alias("d")
        )
    )
    extreme = F.sum(
        F.when(
            F.round(F.abs(F.col("d")), 6) >= F.round(F.abs(F.col("od")), 6), 1
        ).otherwise(0)
    )
    return (
        perm.crossJoin(F.broadcast(obs.select(F.col("d").alias("od"))))
        .groupBy("od")
        .agg(
            F.lit(_N_PERM).cast("bigint").alias("n_perm"),
            extreme.cast("bigint").alias("n_extreme"),
            F.round(
                (1 + extreme) * F.lit(1.0) / (_N_PERM + 1), 6
            ).alias("p_value"),
        )
        .select(
            F.round("od", 4).alias("obs_diff"), "n_perm", "n_extreme", "p_value"
        )
    )


_LAMBDAS = [0.0, 1.0, 10.0, 100.0]


@register(
    "ridge_trend_path",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    z AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev,
             count(*) OVER () AS n
      FROM daily
    ),
    feats AS (
      SELECT (t - avg(t) OVER ()) / stddev_samp(t) OVER () AS x1,
             (t * t - avg(t * t) OVER ()) / stddev_samp(t * t) OVER () AS x2,
             rev - avg(rev) OVER () AS y,
             stddev_samp(rev) OVER () AS sy,
             max(n) OVER () AS n
      FROM z
    ),
    moments AS (
      SELECT sum(x1 * x1) AS a11, sum(x1 * x2) AS a12, sum(x2 * x2) AS a22,
             sum(x1 * y / sy) AS b1, sum(x2 * y / sy) AS b2,
             sum(y * y / (sy * sy)) AS syy, max(n) AS n
      FROM feats
    ),
    fits AS (
      SELECT l.lam,
             ((a22 + l.lam) * b1 - a12 * b2)
               / ((a11 + l.lam) * (a22 + l.lam) - a12 * a12) AS beta1,
             ((a11 + l.lam) * b2 - a12 * b1)
               / ((a11 + l.lam) * (a22 + l.lam) - a12 * a12) AS beta2,
             syy, a11, a12, a22, b1, b2, n
      FROM moments CROSS JOIN (SELECT CAST(unnest(ARRAY{_LAMBDAS}) AS DOUBLE) AS lam) l
    )
    SELECT CAST(lam AS DOUBLE) AS lambda,
           round(beta1, 6) AS beta_t,
           round(beta2, 6) AS beta_t2,
           round(sqrt((syy - 2 * (beta1 * b1 + beta2 * b2)
                       + beta1 * beta1 * a11 + 2 * beta1 * beta2 * a12
                       + beta2 * beta2 * a22) / n), 6) AS rmse_std
    FROM fits ORDER BY lam
    """,
    doc="Ridge regularization path for the standardized quadratic trend "
    "of daily revenue: features x1=t, x2=t^2 (z-scored, collinear by "
    "construction — exactly where ridge matters), response in SD "
    "units, lambda in {0, 1, 10, 100}. Coefficients come from the "
    "explicit 2x2 closed form ((X'X + lambda I)^-1 X'y via Cramer), "
    "and the in-sample RMSE expands ||y - Xb||^2 from the same five "
    "scalar moments — so the whole path is ONE pass over the |days| "
    "table plus a 4-row literal fan-out, no per-lambda refit. "
    "lambda=0 reproduces OLS; the path shows the quadratic term "
    "shrinking first (it carries less independent signal).",
)
def ridge_trend_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wall = Window.partitionBy()
    z = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        "rev",
        F.count("*").over(wall).alias("n"),
    )
    t2 = (F.col("t") * F.col("t")).alias("tt")
    feats = z.select(
        (
            (F.col("t") - F.avg("t").over(wall)) / F.stddev_samp("t").over(wall)
        ).alias("x1"),
        (
            (t2 - F.avg(F.col("t") * F.col("t")).over(wall))
            / F.stddev_samp(F.col("t") * F.col("t")).over(wall)
        ).alias("x2"),
        (F.col("rev") - F.avg("rev").over(wall)).alias("y"),
        F.stddev_samp("rev").over(wall).alias("sy"),
        F.max("n").over(wall).alias("n"),
    )
    moments = feats.agg(
        F.sum(F.col("x1") * F.col("x1")).alias("a11"),
        F.sum(F.col("x1") * F.col("x2")).alias("a12"),
        F.sum(F.col("x2") * F.col("x2")).alias("a22"),
        F.sum(F.col("x1") * F.col("y") / F.col("sy")).alias("b1"),
        F.sum(F.col("x2") * F.col("y") / F.col("sy")).alias("b2"),
        F.sum(F.col("y") * F.col("y") / (F.col("sy") * F.col("sy"))).alias("syy"),
        F.max("n").alias("n"),
    )
    lams = spark.createDataFrame([(l,) for l in _LAMBDAS], "lam double")
    det = (F.col("a11") + F.col("lam")) * (F.col("a22") + F.col("lam")) - F.col(
        "a12"
    ) * F.col("a12")
    beta1 = ((F.col("a22") + F.col("lam")) * F.col("b1") - F.col("a12") * F.col("b2")) / det
    beta2 = ((F.col("a11") + F.col("lam")) * F.col("b2") - F.col("a12") * F.col("b1")) / det
    fits = moments.crossJoin(F.broadcast(lams)).select(
        "lam", beta1.alias("beta1"), beta2.alias("beta2"),
        "syy", "a11", "a12", "a22", "b1", "b2", "n",
    )
    sse = (
        F.col("syy")
        - 2 * (F.col("beta1") * F.col("b1") + F.col("beta2") * F.col("b2"))
        + F.col("beta1") * F.col("beta1") * F.col("a11")
        + 2 * F.col("beta1") * F.col("beta2") * F.col("a12")
        + F.col("beta2") * F.col("beta2") * F.col("a22")
    )
    return fits.select(
        F.col("lam").alias("lambda"),
        F.round("beta1", 6).alias("beta_t"),
        F.round("beta2", 6).alias("beta_t2"),
        F.round(F.sqrt(sse / F.col("n")), 6).alias("rmse_std"),
    ).orderBy("lambda")
