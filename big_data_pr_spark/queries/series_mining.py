"""Time-series mining extensions — AR model fitting, spectral entropy,
iterative outlier peeling, symbolic discretization, motif discovery.

Reference capability these generalize: the reference's analytics stop at
SMA overlays and an XGBoost forecaster (batch_processor.py steps 8-9,
app.py:203-233); a training-data/analytics engine additionally needs
*model-selection* primitives — how autocorrelated is the series (AR
coefficients), is there exploitable structure at all (spectral
entropy), which points would poison a fit (ESD peeling), and what
repeated shapes exist (SAX motifs / matrix-profile-style motif pairs).

Scale posture: every query first collapses the raw scan to the |days|
table (one shuffle), then works on that compressed domain — window
functions over ~thousands of rows, bounded fan-outs (29 periods, 5 ESD
rounds, 7-day subsequences within one year). Nothing here joins back to
raw rows, so the shapes are unchanged at 100 TB: the reduce dominates
and is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

_DAILY_SQL = """
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )


@register(
    "yule_walker_ar2",
    f"""
    WITH {_DAILY_SQL},
    c AS (
      SELECT rev,
             avg(rev) OVER () AS m,
             count(*) OVER () AS n,
             lag(rev, 1) OVER (ORDER BY day) AS l1,
             lag(rev, 2) OVER (ORDER BY day) AS l2
      FROM daily
    ),
    cov AS (
      SELECT max(n) AS n,
             sum((rev - m) * (rev - m)) / max(n) AS c0,
             sum(CASE WHEN l1 IS NOT NULL THEN (rev - m) * (l1 - m) END)
               / max(n) AS c1,
             sum(CASE WHEN l2 IS NOT NULL THEN (rev - m) * (l2 - m) END)
               / max(n) AS c2
      FROM c
    ),
    acf AS (
      SELECT n, c0, c1 / c0 AS r1, c2 / c0 AS r2 FROM cov
    ),
    fit AS (
      SELECT n, c0, r1, r2,
             r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
      FROM acf
    ),
    resid AS (
      SELECT sum(pow((rev - m) - f.phi1 * (l1 - m) - f.phi2 * (l2 - m), 2))
               / count(*) AS mse
      FROM c CROSS JOIN fit f
      WHERE l2 IS NOT NULL
    )
    SELECT CAST(f.n AS BIGINT) AS n_days,
           round(f.r1, 6) AS r1,
           round(f.r2, 6) AS r2,
           round(f.phi1, 6) AS phi1,
           round(f.phi2, 6) AS phi2,
           round(1 - f.phi1 * f.r1 - f.phi2 * f.r2, 6) AS innovation_ratio,
           round(sqrt(r.mse / f.c0), 6) AS rmse_std
    FROM fit f CROSS JOIN resid r
    """,
    doc="Yule-Walker AR(2) fit on daily revenue: lag-1/lag-2 "
    "autocovariances c_k = sum (x_t-m)(x_{t-k}-m)/n give r_k = c_k/c0, "
    "then the closed-form phi1 = r1(1-r2)/(1-r1^2), "
    "phi2 = (r2-r1^2)/(1-r1^2); innovation_ratio = 1 - phi1 r1 - "
    "phi2 r2 is the fitted white-noise variance as a share of total "
    "variance, and rmse_std the in-sample one-step error in SD units. "
    "One orders scan -> |days| rows; two lag windows + one global agg. "
    "The reference jumps straight to XGBoost (app.py:203) — this is the "
    "classical identification step that says whether a linear "
    "short-memory model already explains the series.",
)
def yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    c = _daily(spark, sf_dir).select(
        "rev",
        F.avg("rev").over(wall).alias("m"),
        F.count("*").over(wall).alias("n"),
        F.lag("rev", 1).over(w).alias("l1"),
        F.lag("rev", 2).over(w).alias("l2"),
    )
    cov = c.agg(
        F.max("n").alias("n"),
        (F.sum((F.col("rev") - F.col("m")) * (F.col("rev") - F.col("m"))) / F.max("n")).alias("c0"),
        (
            F.sum(
                F.when(
                    F.col("l1").isNotNull(),
                    (F.col("rev") - F.col("m")) * (F.col("l1") - F.col("m")),
                )
            )
            / F.max("n")
        ).alias("c1"),
        (
            F.sum(
                F.when(
                    F.col("l2").isNotNull(),
                    (F.col("rev") - F.col("m")) * (F.col("l2") - F.col("m")),
                )
            )
            / F.max("n")
        ).alias("c2"),
    )
    fit = cov.select(
        "n",
        "c0",
        (F.col("c1") / F.col("c0")).alias("r1"),
        (F.col("c2") / F.col("c0")).alias("r2"),
    ).select(
        "n",
        "c0",
        "r1",
        "r2",
        (F.col("r1") * (1 - F.col("r2")) / (1 - F.col("r1") * F.col("r1"))).alias("phi1"),
        ((F.col("r2") - F.col("r1") * F.col("r1")) / (1 - F.col("r1") * F.col("r1"))).alias("phi2"),
    )
    resid = (
        c.filter(F.col("l2").isNotNull())
        .crossJoin(F.broadcast(fit).select("phi1", "phi2"))
        .agg(
            (
                F.sum(
                    F.pow(
                        (F.col("rev") - F.col("m"))
                        - F.col("phi1") * (F.col("l1") - F.col("m"))
                        - F.col("phi2") * (F.col("l2") - F.col("m")),
                        F.lit(2),
                    )
                )
                / F.count("*")
            ).alias("mse")
        )
    )
    return fit.crossJoin(F.broadcast(resid)).select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("r1", 6).alias("r1"),
        F.round("r2", 6).alias("r2"),
        F.round("phi1", 6).alias("phi1"),
        F.round("phi2", 6).alias("phi2"),
        F.round(1 - F.col("phi1") * F.col("r1") - F.col("phi2") * F.col("r2"), 6).alias(
            "innovation_ratio"
        ),
        F.round(F.sqrt(F.col("mse") / F.col("c0")), 6).alias("rmse_std"),
    )


@register(
    "spectral_entropy_daily",
    f"""
    WITH {_DAILY_SQL},
    std AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             (rev - avg(rev) OVER ()) / stddev_samp(rev) OVER () AS r
      FROM daily
    ),
    fan AS (
      SELECT p.p, s.t, s.r
      FROM std s CROSS JOIN (SELECT unnest(range(2, 31)) AS p) p
    ),
    power AS (
      SELECT p,
             pow(sum(r * cos(2 * pi() * t / p)), 2)
               + pow(sum(r * sin(2 * pi() * t / p)), 2) AS pw
      FROM fan GROUP BY p
    ),
    q AS (
      SELECT p, pw / sum(pw) OVER () AS q FROM power
    )
    SELECT CAST(count(*) AS BIGINT) AS n_periods,
           round(-sum(q * ln(q)), 6) AS entropy,
           round(-sum(q * ln(q)) / ln(count(*)), 6) AS entropy_norm,
           CAST(max_by(p, q) AS BIGINT) AS top_period,
           round(max(q), 6) AS top_share
    FROM q
    """,
    doc="Spectral entropy of the daily-revenue periodogram over periods "
    "2-30: normalize the spectral powers to a distribution q_p and "
    "report H = -sum q ln q (and H/ln 29). Low entropy = concentrated "
    "spectrum = forecastable seasonality; entropy_norm near 1 = white "
    "noise. top_period/top_share name the dominant cycle (the weekly "
    "p=7 peak). Same standardized-series periodogram as "
    "periodogram_top_periods, collapsed to the model-selection scalar "
    "used to decide if seasonal terms belong in the forecaster at all.",
)
def spectral_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    wall = Window.partitionBy()
    std = _daily(spark, sf_dir).select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (
            (F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("r"),
    )
    periods = spark.range(2, 31).select(F.col("id").alias("p"))
    two_pi_t_over_p = F.lit(2.0) * F.lit(3.141592653589793) * F.col("t") / F.col("p")
    power = (
        std.crossJoin(F.broadcast(periods))
        .groupBy("p")
        .agg(
            (
                F.pow(F.sum(F.col("r") * F.cos(two_pi_t_over_p)), F.lit(2))
                + F.pow(F.sum(F.col("r") * F.sin(two_pi_t_over_p)), F.lit(2))
            ).alias("pw")
        )
    )
    q = power.select("p", (F.col("pw") / F.sum("pw").over(wall)).alias("q"))
    return q.agg(
        F.count("*").cast("bigint").alias("n_periods"),
        F.round(-F.sum(F.col("q") * F.log(F.col("q"))), 6).alias("entropy"),
        F.round(
            -F.sum(F.col("q") * F.log(F.col("q"))) / F.log(F.count("*")), 6
        ).alias("entropy_norm"),
        F.max_by("p", "q").cast("bigint").alias("top_period"),
        F.round(F.max("q"), 6).alias("top_share"),
    )


_ESD_ROUNDS = 5


def _esd_oracle() -> str:
    # Unrolled peeling: round i computes mean/sd over the surviving set,
    # removes the single max-|z| day (day ASC tie-break), and records it.
    ctes = [f"WITH {_DAILY_SQL}", "s0 AS (SELECT day, rev FROM daily)"]
    outs = []
    for i in range(_ESD_ROUNDS):
        ctes.append(
            f"""
    z{i} AS (
      SELECT day, rev,
             abs(rev - avg(rev) OVER ()) / stddev_samp(rev) OVER () AS z
      FROM s{i}
    ),
    pick{i} AS (
      SELECT day, rev, z FROM z{i} ORDER BY z DESC, day ASC LIMIT 1
    ),
    s{i + 1} AS (
      SELECT s.day, s.rev FROM s{i} s
      WHERE s.day <> (SELECT day FROM pick{i})
    )"""
        )
        outs.append(
            f"SELECT {i + 1} AS round, day, round(rev, 2) AS rev,"
            f" round(z, 6) AS esd_stat FROM pick{i}"
        )
    return ",\n".join([ctes[0] + ",\n" + ",\n".join(ctes[1:])]) + "\n" + "\nUNION ALL\n".join(outs) + "\nORDER BY round"


@register(
    "esd_anomalies_daily",
    _esd_oracle(),
    doc="Generalized-ESD-style iterative outlier peeling on daily "
    "revenue, 5 rounds: each round recomputes mean/SD over the "
    "surviving days and removes the single most extreme day (|z| DESC, "
    "day ASC tie-break), so masked outliers that a one-shot z-score "
    "misses surface once their neighbors are peeled. Emits (round, "
    "day, rev, esd_stat). The loop is bounded (5) and runs on the "
    "post-aggregation |days| table, so each round is one window pass "
    "over thousands of rows regardless of raw scale; the unrolled "
    "DuckDB oracle replays the identical peeling order.",
)
def esd_anomalies_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    wall = Window.partitionBy()
    remaining = _daily(spark, sf_dir).localCheckpoint(eager=False)
    picks = []
    for i in range(_ESD_ROUNDS):
        z = remaining.select(
            "day",
            "rev",
            (
                F.abs(F.col("rev") - F.avg("rev").over(wall))
                / F.stddev_samp("rev").over(wall)
            ).alias("z"),
        )
        pick = z.orderBy(F.desc("z"), F.asc("day")).limit(1)
        picks.append(
            pick.select(
                F.lit(i + 1).alias("round"),
                "day",
                F.round("rev", 2).alias("rev"),
                F.round("z", 6).alias("esd_stat"),
            )
        )
        # anti-join keeps the peel distributed; the surviving set is the
        # |days| table minus i rows, checkpointed so round i+1's plan
        # doesn't re-derive rounds 0..i
        remaining = remaining.join(
            F.broadcast(pick.select("day")), on="day", how="left_anti"
        ).localCheckpoint(eager=False)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("round")


@register(
    "sax_daily_motifs",
    f"""
    WITH {_DAILY_SQL},
    z AS (
      SELECT day,
             (rev - avg(rev) OVER ()) / stddev_samp(rev) OVER () AS z
      FROM daily
    ),
    sym AS (
      SELECT day,
             CASE WHEN z < -0.6745 THEN 'a'
                  WHEN z < 0 THEN 'b'
                  WHEN z < 0.6745 THEN 'c'
                  ELSE 'd' END AS s
      FROM z
    ),
    grams AS (
      SELECT s
             || lead(s, 1) OVER (ORDER BY day)
             || lead(s, 2) OVER (ORDER BY day) AS motif
      FROM sym
    )
    SELECT motif, CAST(count(*) AS BIGINT) AS cnt
    FROM grams WHERE motif IS NOT NULL
    GROUP BY motif
    HAVING count(*) >= 5
    ORDER BY cnt DESC, motif
    """,
    doc="SAX symbolic discretization of daily revenue: z-normalize, cut "
    "at the 4-symbol Gaussian breakpoints (-0.6745, 0, 0.6745) so each "
    "symbol is equiprobable under N(0,1), then count 3-symbol motifs "
    "(lead-window n-grams) occurring >= 5 times. Symbolic motifs are "
    "the standard first pass for shape mining on long series because "
    "the alphabet collapses the float domain to a countable one — the "
    "count is a plain groupBy that scales linearly; only the "
    "z-normalization needs the two global moments.",
)
def sax_daily_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    wall = Window.partitionBy()
    w = Window.orderBy("day")
    z = _daily(spark, sf_dir).select(
        "day",
        (
            (F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("z"),
    )
    sym = z.select(
        "day",
        F.when(F.col("z") < -0.6745, "a")
        .when(F.col("z") < 0, "b")
        .when(F.col("z") < 0.6745, "c")
        .otherwise("d")
        .alias("s"),
    )
    grams = sym.select(
        F.concat(
            F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)
        ).alias("motif")
    )
    return (
        grams.filter(F.col("motif").isNotNull())
        .groupBy("motif")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .orderBy(F.desc("cnt"), F.asc("motif"))
    )


_MOTIF_W = 7


@register(
    "top_motif_pair_daily",
    f"""
    WITH {_DAILY_SQL},
    yr AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev
      FROM daily WHERE day >= DATE '1996-01-01' AND day < DATE '1997-01-01'
    ),
    win AS (
      SELECT t, rev,
             avg(rev) OVER w AS m,
             stddev_samp(rev) OVER w AS sd,
             count(*) OVER w AS wn
      FROM yr
      WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW AND {_MOTIF_W - 1} FOLLOWING)
    ),
    starts AS (SELECT t, m, sd FROM win WHERE wn = {_MOTIF_W}),
    el AS (
      SELECT s.t, o.k, (y.rev - s.m) / s.sd AS zz
      FROM starts s
      CROSS JOIN (SELECT unnest(range(0, {_MOTIF_W})) AS k) o
      JOIN yr y ON y.t = s.t + o.k
    ),
    pairs AS (
      SELECT a.t AS i, b.t AS j,
             sum(a.zz * b.zz) / {_MOTIF_W} AS corr
      FROM el a JOIN el b ON a.k = b.k AND b.t >= a.t + {_MOTIF_W}
      GROUP BY a.t, b.t
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           round(sqrt(greatest(2.0 * {_MOTIF_W} * (1 - corr), 0)), 4) AS zdist
    FROM pairs
    ORDER BY zdist ASC, i ASC, j ASC
    LIMIT 5
    """,
    doc="Matrix-profile-style motif discovery over 1996's daily revenue: "
    "every 7-day subsequence is z-normalized by its own window "
    "mean/SD, non-overlapping pairs (j >= i+7, the trivial-match "
    "exclusion zone) are scored by z-normalized Euclidean distance "
    "d^2 = 2w(1-corr), and the 5 closest pairs are the motifs. The "
    "aligned-offset equi-join (on k) replaces the naive O(n^2 w) scan "
    "with a shuffle join on the exploded (start, offset) table — the "
    "year bound keeps pairs ~64k here, and at scale the same shape "
    "partitions by series/segment before pairing.",
)
def top_motif_pair_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    yr = (
        _daily(spark, sf_dir)
        .filter(
            (F.col("day") >= F.lit("1996-01-01").cast("date"))
            & (F.col("day") < F.lit("1997-01-01").cast("date"))
        )
        .select(F.row_number().over(Window.orderBy("day")).alias("t"), "rev")
    )
    w = Window.orderBy("t").rowsBetween(Window.currentRow, _MOTIF_W - 1)
    win = yr.select(
        "t",
        "rev",
        F.avg("rev").over(w).alias("m"),
        F.stddev_samp("rev").over(w).alias("sd"),
        F.count("*").over(w).alias("wn"),
    )
    starts = win.filter(F.col("wn") == _MOTIF_W).select("t", "m", "sd")
    offsets = spark.range(0, _MOTIF_W).select(F.col("id").alias("k"))
    el = (
        starts.alias("s")
        .crossJoin(F.broadcast(offsets))
        .join(yr.alias("y"), F.col("y.t") == F.col("s.t") + F.col("k"))
        .select(
            F.col("s.t").alias("t"),
            "k",
            ((F.col("y.rev") - F.col("s.m")) / F.col("s.sd")).alias("zz"),
        )
    )
    pairs = (
        el.alias("a")
        .join(
            el.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("b.t") >= F.col("a.t") + _MOTIF_W),
        )
        .groupBy(F.col("a.t").alias("i"), F.col("b.t").alias("j"))
        .agg((F.sum(F.col("a.zz") * F.col("b.zz")) / _MOTIF_W).alias("corr"))
    )
    return (
        pairs.select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.lit(2.0) * _MOTIF_W * (1 - F.col("corr")), F.lit(0.0)
                    )
                ),
                4,
            ).alias("zdist"),
        )
        .orderBy(F.asc("zdist"), F.asc("i"), F.asc("j"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive smoothing (level + trend + weekly season),
# exact engine-parallel recursion
# ---------------------------------------------------------------------------

_HW_ALPHA = 0.2
_HW_BETA = 0.05
_HW_GAMMA = 0.1
_HW_L = 7
_HW_H = 14


def _hw_oracle() -> str:
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    # init from the first 14 days in EXPLICIT left-associative order so
    # the float adds match the Python loop bit-for-bit
    xs = " + ".join(f"x{i}" for i in range(1, 8))
    xs2 = " + ".join(f"x{i}" for i in range(8, 15))
    x_cases = ",\n             ".join(
        f"max(CASE WHEN t = {i} THEN x END) AS x{i}" for i in range(1, 15)
    )
    sa_init = ",\n             ".join(
        f"x{j + 1} - l0 AS sa{j}" for j in range(_HW_L)
    )
    sa_cols = ", ".join(f"sa{j}" for j in range(_HW_L))
    s_old = "CASE " + " ".join(
        f"WHEN (nx.t - 1) % {_HW_L} = {j} THEN v.sa{j}" for j in range(_HW_L)
    ) + " END"
    sa_next = ", ".join(
        f"CASE WHEN (nx.t - 1) % {_HW_L} = {j} "
        f"THEN {g} * (nx.x - ({a} * (nx.x - ({s_old})) "
        f"+ (1 - {a}) * (v.l + v.b))) + (1 - {g}) * v.sa{j} "
        f"ELSE v.sa{j} END AS sa{j}"
        for j in range(_HW_L)
    )
    fc = "\n      UNION ALL\n".join(
        f"""      SELECT {h} AS h,
             round(l + {h} * b + CASE """
        + " ".join(
            f"WHEN (n + {h} - 1) % {_HW_L} = {j} THEN sa{j}"
            for j in range(_HW_L)
        )
        + f""" END, 2) AS forecast,
             round(sqrt(sse / (n - {_HW_L * 2})), 2) AS rmse
      FROM fin"""
        for h in range(1, _HW_H + 1)
    )
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    obs AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY day) AS t, rev AS x,
             count(*) OVER () AS n
      FROM daily
    ),
    init AS (
      SELECT {x_cases}
      FROM obs WHERE t <= 14
    ),
    init2 AS (
      SELECT ({xs}) / {_HW_L} AS l0,
             (({xs2}) / {_HW_L} - ({xs}) / {_HW_L}) / {_HW_L} AS b0
      FROM init
    ),
    init3 AS (
      SELECT l0, b0, {sa_init}
      FROM init2 CROSS JOIN init
    ),
    v AS (
      SELECT CAST(0 AS BIGINT) AS t, l0 AS l, b0 AS b, {sa_cols},
             CAST(0.0 AS DOUBLE) AS sse
      FROM init3
      UNION ALL
      SELECT nx.t,
             {a} * (nx.x - ({s_old})) + (1 - {a}) * (v.l + v.b) AS l,
             {b} * (({a} * (nx.x - ({s_old})) + (1 - {a}) * (v.l + v.b))
                    - v.l) + (1 - {b}) * v.b AS b,
             {sa_next},
             v.sse + pow(nx.x - (v.l + v.b + ({s_old})), 2) AS sse
      FROM v JOIN obs nx ON nx.t = v.t + 1
    ),
    fin AS (
      SELECT v.l, v.b, {sa_cols}, v.sse, o.n
      FROM v JOIN (SELECT max(n) AS n FROM obs) o ON v.t = o.n
    )
{fc}
    ORDER BY h
    """


@register(
    "holt_winters_additive",
    _hw_oracle(),
    doc="Holt-Winters additive smoothing of daily revenue — level + "
    f"trend + weekly ({_HW_L}-slot) seasonal state, alpha={_HW_ALPHA} "
    f"beta={_HW_BETA} gamma={_HW_GAMMA} — with a {_HW_H}-day-ahead "
    "forecast and the in-sample one-step RMSE. The recursion is run "
    "bit-identically on both engines: initialization sums are written "
    "in explicit left-associative order, every update uses the same "
    "expression tree (alpha*(x-s) + (1-alpha)*(l+b) etc.), and IEEE "
    "double arithmetic is deterministic, so the DuckDB recursive-CTE "
    "replay matches the applyInPandas loop exactly; final rounding to "
    "2 decimal places is belt-and-braces. Extends holt_linear_"
    "forecast (level+trend closed form) with the seasonal component "
    "the periodogram says dominates (p=7). The sequential pass runs "
    "on the post-aggregation |days| series inside one applyInPandas "
    "group — per-series parallel at scale, scan+reduce dominated.",
)
def holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    daily = _daily(spark, sf_dir)

    def hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        x = [float(v) for v in pdf["rev"]]
        n = len(x)
        L, a, b_, g = _HW_L, _HW_ALPHA, _HW_BETA, _HW_GAMMA
        l0 = (x[0] + x[1] + x[2] + x[3] + x[4] + x[5] + x[6]) / L
        m2 = (x[7] + x[8] + x[9] + x[10] + x[11] + x[12] + x[13]) / L
        b0 = (m2 - l0) / L
        sa = [x[j] - l0 for j in range(L)]
        lv, tr, sse = l0, b0, 0.0
        for t in range(1, n + 1):
            xi = x[t - 1]
            slot = (t - 1) % L
            s_old = sa[slot]
            fitted = lv + tr + s_old
            l_new = a * (xi - s_old) + (1 - a) * (lv + tr)
            tr = b_ * (l_new - lv) + (1 - b_) * tr
            sa[slot] = g * (xi - l_new) + (1 - g) * s_old
            sse = sse + (xi - fitted) ** 2
            lv = l_new
        rmse = (sse / (n - 2 * L)) ** 0.5
        rows = []
        for h in range(1, _HW_H + 1):
            slot = (n + h - 1) % L
            rows.append(
                (h, round(lv + h * tr + sa[slot], 2), round(rmse, 2))
            )
        return pd.DataFrame(rows, columns=["h", "forecast", "rmse"])

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(hw, "h long, forecast double, rmse double")
        .orderBy("h")
    )


_THETA_ALPHA = 0.3
_THETA_H = 7


@register(
    "theta_forecast_daily",
    f"""
    WITH {_DAILY_SQL},
    idx AS (
      SELECT rev,
             row_number() OVER (ORDER BY day) AS j,
             count(*) OVER () AS n
      FROM daily
    ),
    fit AS (
      SELECT
        max(n) AS n,
        (max(n) * sum(j * rev) - sum(j) * sum(rev))
          / (max(n) * sum(j * j) - sum(j) * sum(j)) AS b,
        coalesce(sum(CASE WHEN j >= 2
                     THEN {_THETA_ALPHA} * pow({1 - _THETA_ALPHA}, n - j) * rev
                     END), 0)
          + sum(CASE WHEN j = 1
                THEN pow({1 - _THETA_ALPHA}, n - 1) * rev ELSE 0 END) AS level
      FROM idx
    )
    SELECT CAST(h.h AS INT) AS h,
           round(fit.level + h.h * fit.b / 2, 2) AS forecast,
           CAST(fit.n AS BIGINT) AS n_days,
           round(fit.b / 2, 4) AS drift_per_step
    FROM fit, unnest(generate_series(1, {_THETA_H})) AS h(h)
    ORDER BY h
    """,
    doc="""Theta-method daily revenue forecast (Assimakopoulos &
    Nikolopoulos 2000, via the Hyndman-Billah equivalence): simple
    exponential smoothing (alpha=0.3, closed-form geometric-weight sum
    — no recursion needed) plus half the OLS trend slope as drift,
    h=1..7 ahead. Reduces the scan to the |days| domain in one shuffle;
    the fit is a single global aggregate, so the shape is unchanged at
    100 TB.""",
)
def theta_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    idx = daily.select(
        "rev",
        F.row_number().over(w).alias("j"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    a = _THETA_ALPHA
    fit = idx.agg(
        F.max("n").alias("n"),
        (
            (F.max("n") * F.sum(F.col("j") * F.col("rev"))
             - F.sum("j") * F.sum("rev"))
            / (F.max("n") * F.sum(F.col("j") * F.col("j"))
               - F.sum("j") * F.sum("j"))
        ).alias("b"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("j") >= 2,
                        F.lit(a)
                        * F.pow(F.lit(1 - a), F.col("n") - F.col("j"))
                        * F.col("rev"),
                    )
                ),
                F.lit(0.0),
            )
            + F.sum(
                F.when(
                    F.col("j") == 1,
                    F.pow(F.lit(1 - a), F.col("n") - 1) * F.col("rev"),
                ).otherwise(F.lit(0.0))
            )
        ).alias("level"),
    )
    horizons = spark.range(1, _THETA_H + 1).select(F.col("id").alias("h"))
    return (
        fit.crossJoin(F.broadcast(horizons))
        .select(
            F.col("h").cast("int").alias("h"),
            F.round(F.col("level") + F.col("h") * F.col("b") / 2, 2).alias(
                "forecast"
            ),
            F.col("n").cast("bigint").alias("n_days"),
            F.round(F.col("b") / 2, 4).alias("drift_per_step"),
        )
        .orderBy("h")
    )


_CROSTON_ALPHA = 0.3
_CROSTON_MIN_VALUE = 250.0


@register(
    "croston_demand_rate",
    f"""
    WITH base AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS z
      FROM events WHERE value > {_CROSTON_MIN_VALUE} GROUP BY 1, 2
    ),
    g AS (SELECT min(date_trunc('day', ts)) AS d0 FROM events),
    arr AS (
      SELECT event_type, z,
             CAST(date_diff('day', g.d0, base.day) AS DOUBLE) + 1 AS d,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             count(*) OVER (PARTITION BY event_type) AS m,
             lag(CAST(date_diff('day', g.d0, base.day) AS DOUBLE) + 1)
               OVER (PARTITION BY event_type ORDER BY day) AS prev_d
      FROM base CROSS JOIN g
    ),
    ses AS (
      SELECT event_type,
             CAST(max(m) AS BIGINT) AS n_arrivals,
             coalesce(sum(CASE WHEN k >= 2
                          THEN {_CROSTON_ALPHA}
                               * pow({1 - _CROSTON_ALPHA}, m - k) * z END), 0)
               + sum(CASE WHEN k = 1
                     THEN pow({1 - _CROSTON_ALPHA}, m - 1) * z ELSE 0 END)
               AS z_hat,
             coalesce(sum(CASE WHEN k >= 2
                          THEN {_CROSTON_ALPHA}
                               * pow({1 - _CROSTON_ALPHA}, m - k)
                               * (d - prev_d) END), 0)
               + sum(CASE WHEN k = 1
                     THEN pow({1 - _CROSTON_ALPHA}, m - 1) * d ELSE 0 END)
               AS p_hat
      FROM arr GROUP BY event_type
    )
    SELECT event_type, n_arrivals,
           round(z_hat, 4) AS z_hat,
           round(p_hat, 4) AS p_hat,
           round(z_hat / p_hat, 4) AS demand_rate
    FROM ses ORDER BY event_type
    """,
    doc="""Croston's method for intermittent demand: per event type,
    daily counts of high-value events (value > 250) form a sparse
    arrival series; SES (alpha=0.3, closed-form geometric weights) runs
    separately over the nonzero demand SIZES and the inter-arrival
    INTERVALS, and the demand rate is their ratio. The raw scan
    collapses to |types|×|arrival days| rows in one shuffle; the SES
    weights need only row_number/lag windows partitioned by type.""",
)
def croston_demand_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = (
        ev.where(F.col("value") > _CROSTON_MIN_VALUE)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("z"))
    )
    d0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("d0"))
    w = Window.partitionBy("event_type").orderBy("day")
    arr = (
        base.crossJoin(F.broadcast(d0))
        .withColumn(
            "d", F.datediff(F.col("day"), F.col("d0")).cast("double") + 1
        )
        .select(
            "event_type",
            "z",
            "d",
            F.row_number().over(w).alias("k"),
            F.count("*").over(Window.partitionBy("event_type")).alias("m"),
            F.lag("d").over(w).alias("prev_d"),
        )
    )
    a = _CROSTON_ALPHA

    def _ses(val):
        return F.coalesce(
            F.sum(
                F.when(
                    F.col("k") >= 2,
                    F.lit(a) * F.pow(F.lit(1 - a), F.col("m") - F.col("k")) * val,
                )
            ),
            F.lit(0.0),
        ) + F.sum(
            F.when(
                F.col("k") == 1,
                F.pow(F.lit(1 - a), F.col("m") - 1) * val,
            ).otherwise(F.lit(0.0))
        )

    # the k=1 interval term uses d itself (first arrival distance from
    # the global first event day), matching the oracle's CASE split
    ses = arr.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_arrivals"),
        _ses(F.col("z")).alias("z_hat"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("k") >= 2,
                        F.lit(a)
                        * F.pow(F.lit(1 - a), F.col("m") - F.col("k"))
                        * (F.col("d") - F.col("prev_d")),
                    )
                ),
                F.lit(0.0),
            )
            + F.sum(
                F.when(
                    F.col("k") == 1,
                    F.pow(F.lit(1 - a), F.col("m") - 1) * F.col("d"),
                ).otherwise(F.lit(0.0))
            )
        ).alias("p_hat"),
    )
    return ses.select(
        "event_type",
        "n_arrivals",
        F.round("z_hat", 4).alias("z_hat"),
        F.round("p_hat", 4).alias("p_hat"),
        F.round(F.col("z_hat") / F.col("p_hat"), 4).alias("demand_rate"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-6i: Kalman local-level filter over daily revenue
# ---------------------------------------------------------------------------

_KF_Q = 0.01  # process noise variance (z-scored scale)
_KF_R = 1.0  # observation noise variance


@register(
    "kalman_local_level_daily",
    f"""
    WITH RECURSIVE {_DAILY_SQL},
    stats AS (
      SELECT avg(rev) AS mu, sqrt(avg(rev * rev) - avg(rev) * avg(rev)) AS sd
      FROM daily
    ),
    obs AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY day) AS t,
             (rev - stats.mu) / stats.sd AS x
      FROM daily CROSS JOIN stats
    ),
    v AS (
      SELECT CAST(1 AS BIGINT) AS t, x, x AS l, CAST(1.0 AS DOUBLE) AS pp,
             CAST(1.0 AS DOUBLE) AS k
      FROM obs WHERE t = 1
      UNION ALL
      SELECT nx.t, nx.x,
             v.l + ((v.pp + {_KF_Q}) / (v.pp + {_KF_Q} + {_KF_R}))
                   * (nx.x - v.l) AS l,
             (1 - (v.pp + {_KF_Q}) / (v.pp + {_KF_Q} + {_KF_R}))
               * (v.pp + {_KF_Q}) AS pp,
             (v.pp + {_KF_Q}) / (v.pp + {_KF_Q} + {_KF_R}) AS k
      FROM v JOIN obs nx ON nx.t = v.t + 1
    )
    SELECT t, round(x, 6) AS x, round(l, 6) AS level, round(k, 6) AS gain
    FROM v ORDER BY t
    """,
    doc="Kalman filter, local-level (random-walk + noise) model, over "
    f"z-scored daily revenue: q={_KF_Q}, r={_KF_R}; per day the "
    "filtered level, the innovation gain (which converges to the "
    "steady-state Riccati fixpoint within ~10 steps — the online "
    "smoothing weight streaming monitors would use), and the z-scored "
    "observation. Same bit-identical-recursion contract as "
    "holt_winters_additive: both engines run the identical expression "
    "tree per step (predict P+q, gain, correct), so the DuckDB "
    "recursive CTE replays the applyInPandas loop exactly; outputs "
    "rounded 6 dp. Scale: recursion runs on the post-aggregation "
    "|days| series in ONE Arrow batch; per-series parallel via the "
    "same groupBy when filtering many keys.",
)
def kalman_local_level_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    daily = _daily(spark, sf_dir)

    def kf(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        rev = [float(v) for v in pdf["rev"]]
        n = len(rev)
        mu = sum(rev) / n
        sd = (sum(v * v for v in rev) / n - mu * mu) ** 0.5
        xs = [(v - mu) / sd for v in rev]
        rows = [(1, round(xs[0], 6), round(xs[0], 6), round(1.0, 6))]
        l, pp = xs[0], 1.0
        for t in range(2, n + 1):
            x = xs[t - 1]
            ppred = pp + _KF_Q
            k = ppred / (ppred + _KF_R)
            l = l + k * (x - l)
            pp = (1 - k) * ppred
            rows.append((t, round(x, 6), round(l, 6), round(k, 6)))
        return pd.DataFrame(rows, columns=["t", "x", "level", "gain"])

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(kf, "t long, x double, level double, gain double")
        .orderBy("t")
    )


# ---------------------------------------------------------------------------
# Round-6n: Huber-robust trend (IRLS, unrolled) and overdispersion
# ---------------------------------------------------------------------------

_HU_K = 1.345  # Huber tuning constant (x mean |residual| as scale)
_HU_ITERS = 2


def _huber_oracle() -> str:
    # one weighted-OLS pass given weights CTE named win -> fit_i
    def wols(win: str, fit: str) -> str:
        return f""",
    {fit} AS (
      SELECT sum(w * t) / sum(w) AS mt, sum(w * x) / sum(w) AS mx,
             sum(w * t * x) / sum(w) AS mtx, sum(w * t * t) / sum(w) AS mtt
      FROM {win}
    ),
    {fit}b AS (
      SELECT (mtx - mt * mx) / (mtt - mt * mt) AS b,
             mx - (mtx - mt * mx) / (mtt - mt * mt) * mt AS a
      FROM {fit}
    )"""

    steps = []
    prev = "obs1"
    for i in range(_HU_ITERS):
        steps.append(
            f""",
    res{i} AS (
      SELECT obs.t, obs.x, abs(obs.x - (f.a + f.b * obs.t)) AS r
      FROM obs CROSS JOIN fit{i}b f
    ),
    sc{i} AS (SELECT avg(r) AS s FROM res{i}),
    w{i} AS (
      SELECT t, x,
             CASE WHEN r <= {_HU_K} * sc{i}.s THEN 1.0
                  ELSE {_HU_K} * sc{i}.s / r END AS w
      FROM res{i} CROSS JOIN sc{i}
    ){wols(f'w{i}', f'fit{i + 1}')}"""
        )
        prev = f"w{i}"
    return f"""
    WITH {_DAILY_SQL},
    obs AS (
      SELECT row_number() OVER (ORDER BY day) AS t, rev AS x FROM daily
    ),
    obs1 AS (SELECT t, x, 1.0 AS w FROM obs){wols('obs1', 'fit0')}
    {''.join(steps)}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM obs) AS n_days,
           round(f0.b, 6) AS slope_ols,
           round(ff.b, 6) AS slope_huber,
           round(ff.a, 4) AS intercept_huber,
           round((SELECT s FROM sc{_HU_ITERS - 1}), 4) AS scale
    FROM fit0b f0 CROSS JOIN fit{_HU_ITERS}b ff
    """


@register(
    "huber_trend_daily",
    _huber_oracle(),
    doc="Huber-robust linear trend of daily revenue via IRLS "
    f"(k={_HU_K} x mean |residual| as the scale, {_HU_ITERS} unrolled "
    "reweighting rounds from the OLS start): weights 1 inside the "
    "Huber band, k*s/|r| outside, each round one weighted-covariance "
    "aggregate — completing the fitting family's robustness ladder "
    "(OLS linreg_value_trend, L1 lad_trend_profile, rank-based "
    "theil_sen_trend; Huber is the statistically-efficient middle). "
    "Unrolled static plan, identical expression trees on both "
    "engines; every pass is one scan of the |days| aggregate.",
)
def huber_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    obs = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
        F.col("rev").cast("double").alias("x"),
    )

    def wols(df: DataFrame) -> DataFrame:
        m = df.agg(
            (F.sum(F.col("w") * F.col("t")) / F.sum("w")).alias("mt"),
            (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("mx"),
            (F.sum(F.col("w") * F.col("t") * F.col("x")) / F.sum("w")).alias(
                "mtx"
            ),
            (F.sum(F.col("w") * F.col("t") * F.col("t")) / F.sum("w")).alias(
                "mtt"
            ),
        )
        b = (F.col("mtx") - F.col("mt") * F.col("mx")) / (
            F.col("mtt") - F.col("mt") * F.col("mt")
        )
        return m.select(b.alias("b"), (F.col("mx") - b * F.col("mt")).alias("a"))

    fit0 = wols(obs.withColumn("w", F.lit(1.0)))
    fit = fit0
    scale = None
    for _ in range(_HU_ITERS):
        res = obs.crossJoin(F.broadcast(fit)).select(
            "t",
            "x",
            F.abs(F.col("x") - (F.col("a") + F.col("b") * F.col("t"))).alias("r"),
        )
        sc = res.agg(F.avg("r").alias("s"))
        wdf = res.crossJoin(F.broadcast(sc)).select(
            "t",
            "x",
            F.when(F.col("r") <= _HU_K * F.col("s"), F.lit(1.0))
            .otherwise(_HU_K * F.col("s") / F.col("r"))
            .alias("w"),
        )
        fit = wols(wdf)
        scale = sc
    n = obs.agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        n.crossJoin(fit0.select(F.col("b").alias("b0")))
        .crossJoin(fit)
        .crossJoin(scale)
        .select(
            "n_days",
            F.round("b0", 6).alias("slope_ols"),
            F.round("b", 6).alias("slope_huber"),
            F.round("a", 4).alias("intercept_huber"),
            F.round("s", 4).alias("scale"),
        )
    )


@register(
    "overdispersion_user_events",
    """
    WITH ue AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             avg(n) AS mu,
             avg(n * n) - avg(n) * avg(n) AS var
      FROM ue
    )
    SELECT n_users, round(mu, 6) AS mean_events,
           round(var, 6) AS var_events,
           round(var / mu, 6) AS dispersion_index,
           round(CASE WHEN var > mu THEN mu * mu / (var - mu) END, 6)
             AS nb_r_moments
    FROM m
    """,
    doc="Overdispersion panel for per-user event counts: variance-to-"
    "mean dispersion index (1 under Poisson) and the method-of-moments "
    "negative-binomial size r = mu^2/(var-mu) when overdispersed "
    "(NULL otherwise) — the check that decides whether Poisson-based "
    "anomaly thresholds (zscore/esd families) are even valid on this "
    "traffic, and the r that parameterizes the NB replacement. One "
    "grouped count + one moment aggregate.",
)
def overdispersion_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ue = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    mu = F.avg("n")
    var = F.avg(F.col("n") * F.col("n")) - mu * mu
    return ue.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(mu, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(var / mu, 6).alias("dispersion_index"),
        F.round(
            F.when(var > mu, mu * mu / (var - mu)), 6
        ).alias("nb_r_moments"),
    )


# ---------------------------------------------------------------------------
# Round-7: SAX symbolization + motif counts (Lin et al. 2003)
# ---------------------------------------------------------------------------

_SAX_WORD = 3  # symbols per word
# breakpoints for a 4-letter alphabet under N(0,1): -0.6745, 0, 0.6745
_SAX_BP = 0.6745


@register(
    "sax_motifs_hourly",
    f"""
    WITH s AS (
      SELECT date_trunc('hour', ts) AS hr, avg(value) AS x
      FROM events GROUP BY 1
    ),
    z AS (
      SELECT hr, x,
             (x - avg(x) OVER ()) / stddev_samp(x) OVER () AS zx
      FROM s
    ),
    sym AS (
      SELECT hr,
             CASE WHEN zx < -{_SAX_BP} THEN 'a'
                  WHEN zx < 0 THEN 'b'
                  WHEN zx < {_SAX_BP} THEN 'c'
                  ELSE 'd' END AS c,
             row_number() OVER (ORDER BY hr) AS i,
             count(*) OVER () AS n
      FROM z
    ),
    words AS (
      SELECT s1.c || s2.c || s3.c AS word
      FROM sym s1
      JOIN sym s2 ON s2.i = s1.i + 1
      JOIN sym s3 ON s3.i = s1.i + 2
      WHERE s1.i <= s1.n - {_SAX_WORD} + 1
    )
    SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS support
    FROM words GROUP BY word
    ORDER BY n_occurrences DESC, word
    """,
    doc="SAX symbolic motif counts (Lin, Keogh et al. 2003) over the "
    "hourly mean-value series: z-normalize, map each point to a "
    "4-letter alphabet at the standard-normal quartile breakpoints "
    f"(±{_SAX_BP}), slide a {_SAX_WORD}-symbol window, count words — "
    "the discretization that makes time-series motif/novelty mining "
    "a plain GROUP BY. Symbol assignment is ordinal (breakpoint "
    "compares), so both engines agree bit-for-bit; the word build is "
    "|hours|-sized self-joins on consecutive ranks (at scale: one "
    "lead() window instead — expressed as joins here to match the "
    "oracle shape exactly).",
)
def sax_motifs_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.avg("value").alias("x")
    )
    wall = Window.partitionBy()
    z = s.select(
        "hr",
        (
            (F.col("x") - F.avg("x").over(wall))
            / F.stddev_samp("x").over(wall)
        ).alias("zx"),
    )
    sym = z.select(
        "hr",
        F.when(F.col("zx") < -_SAX_BP, "a")
        .when(F.col("zx") < 0, "b")
        .when(F.col("zx") < _SAX_BP, "c")
        .otherwise("d")
        .alias("c"),
        F.row_number().over(Window.orderBy("hr")).alias("i"),
        F.count("*").over(wall).alias("n"),
    )
    # |hours|-sized series: the word build is lead() windows (narrow
    # after the single ORDER BY hr sort)
    wseq = Window.orderBy("i")
    words = (
        sym.select(
            "i",
            "n",
            F.concat(
                F.col("c"), F.lead("c", 1).over(wseq), F.lead("c", 2).over(wseq)
            ).alias("word"),
        )
        .where(F.col("i") <= F.col("n") - _SAX_WORD + 1)
        .select("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .select(
            "word",
            "n_occurrences",
            F.round(
                F.col("n_occurrences")
                / F.sum("n_occurrences").over(Window.partitionBy()),
                6,
            ).alias("support"),
        )
        .orderBy(F.desc("n_occurrences"), "word")
    )
