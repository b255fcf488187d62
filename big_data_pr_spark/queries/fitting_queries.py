"""Order- and path-constrained exact fits — isotonic calibration and
Potts-model regime segmentation.

Reference capability these generalize: the reference serves raw model
scores to its dashboard (app.py:203-233) with no calibration step, and
its "regime" view is a human eyeballing the SMA crossover chart; these
queries add the two standard exact fits — a monotone recalibration of
score -> outcome (isotonic regression via the max-min identity) and a
min-cost two-regime segmentation of the daily series (Potts model /
integer-cost Viterbi).

Both are chosen to be *engine-exact*: isotonic runs on 20 pooled bins
whose prefix sums are computed in the same order on both sides, and the
segmentation uses integer costs only (mismatch=1, switch=2), so the
dynamic program has no float tie ambiguity anywhere — the DuckDB oracle
replays the identical recursion.

Scale posture: both collapse the raw scan first (20 score bins; |days|
rows). The isotonic max-min is a bounded 20x20x20 fan-out of the binned
table; the segmentation is sequential by nature but runs on the
post-aggregation series — at 100 TB it would be per-series inside
applyInPandas groups exactly as here, with the reduce doing the heavy
lifting.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

_NBINS = 20
_BINW = 25.0  # value in [0, 500] -> 20 equal-width bins


@register(
    "isotonic_calibration",
    f"""
    WITH b AS (
      SELECT least(CAST(floor(value / {_BINW}) AS BIGINT), {_NBINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT bin, n, pos,
             sum(n) OVER (ORDER BY bin) AS cw,
             sum(pos) OVER (ORDER BY bin) AS cwy
      FROM b
    ),
    intervals AS (
      SELECT i.bin AS i, k.bin AS k,
             (k.cwy - coalesce(ip.cwy, 0)) * 1.0
               / (k.cw - coalesce(ip.cw, 0)) AS avg_ik
      FROM pre i
      JOIN pre k ON k.bin >= i.bin
      LEFT JOIN pre ip ON ip.bin = i.bin - 1
    ),
    inner_min AS (
      SELECT v.i, j.bin AS j, min(v.avg_ik) AS m
      FROM intervals v JOIN pre j ON j.bin >= v.i AND v.k >= j.bin
      GROUP BY v.i, j.bin
    ),
    fit AS (
      SELECT j AS bin, max(m) AS iso FROM inner_min GROUP BY j
    )
    SELECT b.bin, b.n, b.pos,
           round(b.pos * 1.0 / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate
    FROM b JOIN fit f ON f.bin = b.bin
    ORDER BY b.bin
    """,
    doc="Isotonic regression (PAVA) of purchase rate on the value score, "
    "computed exactly via the max-min identity: with 20 equal-width "
    "score bins (weight n_i, mean y_i), the monotone fit at bin j is "
    "max over i<=j of min over k>=j of the pooled mean of bins i..k — "
    "the closed form of pool-adjacent-violators, which needs no "
    "sequential pooling loop and so is expressible as three bounded "
    "joins over the 20-row binned table (prefix sums give every "
    "pooled mean in O(1)). iso_rate is the calibrated monotone "
    "purchase probability the raw dashboard score should map to. One "
    "events scan -> 20 rows; the cubic fan-out is over bins, never "
    "rows, so the shape is scan-dominated at any scale.",
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    b = ev.groupBy(
        F.least(
            F.floor(F.col("value") / _BINW).cast("bigint"), F.lit(_NBINS - 1)
        ).alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin")
    pre = b.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).alias("cw"),
        F.sum("pos").over(w).alias("cwy"),
    )
    i, k, ip = pre.alias("i"), pre.alias("k"), pre.alias("ip")
    intervals = (
        i.join(k, F.col("k.bin") >= F.col("i.bin"))
        .join(ip, F.col("ip.bin") == F.col("i.bin") - 1, "left")
        .select(
            F.col("i.bin").alias("i"),
            F.col("k.bin").alias("kk"),
            (
                (F.col("k.cwy") - F.coalesce(F.col("ip.cwy"), F.lit(0)))
                * F.lit(1.0)
                / (F.col("k.cw") - F.coalesce(F.col("ip.cw"), F.lit(0)))
            ).alias("avg_ik"),
        )
    )
    j = pre.select(F.col("bin").alias("j"))
    inner_min = (
        intervals.join(
            j, (F.col("j") >= F.col("i")) & (F.col("kk") >= F.col("j"))
        )
        .groupBy("i", "j")
        .agg(F.min("avg_ik").alias("m"))
    )
    fit = inner_min.groupBy(F.col("j").alias("fbin")).agg(F.max("m").alias("iso"))
    return (
        b.join(fit, b.bin == fit.fbin)
        .select(
            "bin",
            "n",
            "pos",
            F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


_SWITCH_COST = 2


def _potts_oracle() -> str:
    return f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchases
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT quantile_disc(purchases, 0.5) AS m FROM daily
    ),
    obs AS (
      SELECT row_number() OVER (ORDER BY day) AS t, day,
             CASE WHEN purchases > (SELECT m FROM med) THEN 1 ELSE 0 END AS o,
             count(*) OVER () AS n
      FROM daily
    ),
    v AS (
      SELECT t, o, n,
             CAST(o AS BIGINT) AS c0,
             CAST(1 - o AS BIGINT) AS c1,
             '0' AS p0, '1' AS p1
      FROM obs WHERE t = 1
      UNION ALL
      SELECT nx.t, nx.o, nx.n,
             least(v.c0, v.c1 + {_SWITCH_COST}) + nx.o AS c0,
             least(v.c1, v.c0 + {_SWITCH_COST}) + (1 - nx.o) AS c1,
             (CASE WHEN v.c0 <= v.c1 + {_SWITCH_COST} THEN v.p0 ELSE v.p1 END)
               || '0' AS p0,
             (CASE WHEN v.c1 < v.c0 + {_SWITCH_COST} THEN v.p1 ELSE v.p0 END)
               || '1' AS p1
      FROM v JOIN obs nx ON nx.t = v.t + 1
    ),
    best AS (
      SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path,
             least(c0, c1) AS cost
      FROM v WHERE t = n
    ),
    decoded AS (
      SELECT o.day, o.o AS obs,
             CAST(substr(b.path, CAST(o.t AS INT), 1) AS BIGINT) AS regime,
             b.cost
      FROM obs o CROSS JOIN best b
    )
    SELECT day, obs, regime, CAST(cost AS BIGINT) AS total_cost
    FROM decoded ORDER BY day
    """


@register(
    "potts_regime_segmentation",
    _potts_oracle(),
    doc="Two-regime segmentation of the daily purchase-count series as "
    "a min-cost Potts model: observation o_t = 1 if the day's "
    f"purchases exceed the global median; labeling cost = #mismatched "
    f"days + {_SWITCH_COST} per regime switch, solved exactly by "
    "Viterbi dynamic programming (forward min-cost with per-state "
    "path strings, ties prefer staying in state 0/1 respectively, "
    "matching the <= / < asymmetry on both engines). All costs are "
    "integers, so the DP is bit-exact across engines — the DuckDB "
    "oracle replays it as a recursive CTE over t. Emits the decoded "
    "regime per day plus the optimal total cost. The sequential pass "
    "runs on the post-aggregation |days| series inside one "
    "applyInPandas group; at 100 TB this is per-series parallel with "
    "the scan+reduce doing the heavy lifting.",
)
def potts_regime_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("purchases")
    )
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY purchases)").alias("m")
    )
    obs = daily.crossJoin(F.broadcast(med)).select(
        "day", (F.col("purchases") > F.col("m")).cast("int").alias("o")
    )

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        o = pdf["o"].to_numpy()
        n = len(o)
        # forward min-cost; back[t, s] = predecessor state of s at t
        c0, c1 = int(o[0]), int(1 - o[0])
        back = []
        for t in range(1, n):
            stay0, switch0 = c0, c1 + _SWITCH_COST
            stay1, switch1 = c1, c0 + _SWITCH_COST
            b0 = 0 if stay0 <= switch0 else 1
            b1 = 1 if stay1 < switch1 else 0
            c0 = min(stay0, switch0) + int(o[t])
            c1 = min(stay1, switch1) + int(1 - o[t])
            back.append((b0, b1))
        cost = min(c0, c1)
        s = 0 if c0 <= c1 else 1
        states = [0] * n
        states[n - 1] = s
        for t in range(n - 2, -1, -1):
            s = back[t][s]
            states[t] = s
        return pd.DataFrame(
            {
                "day": pdf["day"],
                "obs": pdf["o"].astype("int64"),
                "regime": pd.Series(states, dtype="int64"),
                "total_cost": pd.Series([cost] * n, dtype="int64"),
            }
        )

    return (
        obs.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(viterbi, "day date, obs long, regime long, total_cost long")
        .orderBy("day")
    )
