"""Reference-parity query surface on the ``events`` fixture table.

The reference's operators (SURVEY.md §2) act on OHLCV candle series;
the driver fixture analogue is ``events`` (event_id, ts, user_id,
event_type, value, props). Mapping (FIXTURES.md §3):

- ``event_type``  plays the reference's ``symbol``
- ``ts`` / ``value`` play candle timestamp / close
- hourly-bucketed candles are derived with ``min_by/max_by`` (open/
  close), which also fixes the reference's nondeterministic ``F.last``
  (SURVEY.md §2.4 A1 note) by ordering on event time.

Every query here has a DuckDB oracle unless marked rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import ema, pct_change, sma, top1_per_key, topk
from ..tables import load
from ..timeutil import epoch_millis, epoch_seconds, trunc_wallclock
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: events → hourly candles → SMA-7/SMA-30 (the reference's
# batch pipeline shape: batch_processor.py steps 2-9, SURVEY §3.1)
# ---------------------------------------------------------------------------

_CANDLES_SQL = """
    SELECT event_type                                AS symbol,
           date_trunc('hour', ts)                    AS bucket,
           arg_min(value, ts)                        AS "open",
           max(value)                                AS high,
           min(value)                                AS low,
           arg_max(value, ts)                        AS "close",
           round(sum(value), 4)                      AS volume,
           count(*)                                  AS n_trades
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
"""


def _candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            trunc_wallclock("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.round(F.sum("value"), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


@register(
    "ohlcv_candles_sma",
    f"""
    WITH candles AS ({_CANDLES_SQL})
    SELECT symbol, bucket, "open", high, low, "close", volume, n_trades,
           round(avg("close") OVER (PARTITION BY symbol ORDER BY bucket
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)  AS sma_7,
           round(avg("close") OVER (PARTITION BY symbol ORDER BY bucket
                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 6) AS sma_30
    FROM candles
    ORDER BY symbol, bucket
    """,
    doc="Flagship: hourly OHLCV candles + trailing SMA-7/SMA-30 per symbol "
    "(reference batch_processor.py:109-115, W1/W2; deterministic min_by/"
    "max_by replaces reference F.last).",
)
def ohlcv_candles_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _candles(spark, sf_dir)
    with_sma = sma(candles, "close", ["symbol"], ["bucket"], 7)
    with_sma = sma(with_sma, "close", ["symbol"], ["bucket"], 30)
    return with_sma.select(
        "symbol",
        "bucket",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "n_trades",
        F.round("sma_7", 6).alias("sma_7"),
        F.round("sma_30", 6).alias("sma_30"),
    )


# ---------------------------------------------------------------------------
# Raw window functions on events (W1/W2 shape without the candle roll-up)
# ---------------------------------------------------------------------------


@register(
    "sma_events",
    """
    SELECT event_id, event_type, ts, value,
           round(avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)  AS sma_7,
           round(avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 6) AS sma_30
    FROM events
    ORDER BY event_type, ts, event_id
    """,
    doc="W1/W2 trailing means directly over the event stream.",
)
def sma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = sma(ev, "value", ["event_type"], ["ts", "event_id"], 7)
    out = sma(out, "value", ["event_type"], ["ts", "event_id"], 30)
    return out.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.round("sma_7", 6).alias("sma_7"),
        F.round("sma_30", 6).alias("sma_30"),
    )


@register(
    "pct_change_events",
    """
    SELECT event_id, event_type, ts,
           round(value / lag(value) OVER (PARTITION BY event_type
                 ORDER BY ts, event_id) - 1, 6) AS pct_change
    FROM events
    ORDER BY event_type, ts, event_id
    """,
    doc="Percent change vs previous row per key (reference report §6).",
)
def pct_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = pct_change(ev, "value", ["event_type"], ["ts", "event_id"])
    return out.select(
        "event_id", "event_type", "ts", F.round("pct_change", 6).alias("pct_change")
    )


_EMA_SPAN = 5
_ALPHA = 2.0 / (_EMA_SPAN + 1.0)


@register(
    "ema_events",
    f"""
    WITH prefixed AS (
      SELECT user_id, event_id, ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      FROM events
    )
    SELECT user_id, event_id, ts,
           round(list_reduce(prefix,
                 (acc, x) -> {_ALPHA!r} * x + {1.0 - _ALPHA!r} * acc), 6) AS ema_5
    FROM prefixed
    ORDER BY user_id, ts, event_id
    """,
    doc="EMA(span=5) per user series — recursive smoothing expressed as a "
    "JVM-side fold (collect_list + F.aggregate), no Python UDF. Identical "
    "fold constants injected into the DuckDB oracle (list_reduce).",
)
def ema_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = ema(ev, "value", ["user_id"], ["ts", "event_id"], _EMA_SPAN)
    return out.select(
        "user_id", "event_id", "ts", F.round("ema_5", 6).alias("ema_5")
    )


# ---------------------------------------------------------------------------
# Latest-per-key / top-k (A1, W3, O3/O4)
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="A1/W3: latest row per key — deterministic replacement for the "
    "reference's F.last() snapshot (stream_processor.py:80-90).",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return top1_per_key(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type", "value")


@register(
    "topk_events_by_value",
    """
    SELECT event_id, event_type, ts, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
    doc="O4: global top-k desc (TakeOrderedAndProject — per-partition heap, "
    "no global sort).",
)
def topk_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return topk(
        ev.select("event_id", "event_type", "ts", "value"),
        [F.desc("value"), F.asc("event_id")],
        100,
    )


# ---------------------------------------------------------------------------
# Distinct listings (A3/A4) and high-watermark (A5)
# ---------------------------------------------------------------------------


@register(
    "distinct_event_types",
    "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    doc="A3: distinct symbol listing (reference app.py:46-64 terms agg).",
)
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select("event_type").distinct().orderBy("event_type")


@register(
    "distinct_type_day_pairs",
    """
    SELECT DISTINCT event_type || '_' || CAST(CAST(ts AS DATE) AS VARCHAR) AS pair
    FROM events ORDER BY pair
    """,
    doc="A4: distinct value pairs formatted '{sym}_{tf}' (app.py:66-83 "
    "multi_terms agg).",
)
def distinct_type_day_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.concat_ws("_", F.col("event_type"), F.col("ts").cast("date").cast("string")).alias(
                "pair"
            )
        )
        .distinct()
        .orderBy("pair")
    )


@register(
    "high_watermark",
    """
    SELECT event_type, max(ts) AS max_ts, epoch_ms(max(ts)) AS max_ts_ms
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="A5: per-key high watermark (hourly_updater.py:58-106 max agg) — the "
    "incremental-ingest anchor.",
)
def high_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.max("ts").alias("max_ts"))
        .withColumn("max_ts_ms", epoch_millis("max_ts"))
        .orderBy("event_type")
    )


@register(
    "incremental_new_rows",
    """
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts > (SELECT max(ts) FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
    ORDER BY event_id
    """,
    doc="J3: high-watermark incremental — rows newer than the stored max(ts). "
    "Implemented without collect(): scalar watermark broadcast-joined.",
)
def incremental_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wm = (
        ev.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(F.max("ts").alias("__wm"))
    )
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("ts") > F.col("__wm"))
        .select("event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Sliding / tumbling windows (A2/T2 batch-equivalent with SQL oracle)
# ---------------------------------------------------------------------------


@register(
    "sliding_window_stats",
    """
    SELECT event_type,
           date_trunc('minute', ts) - k * INTERVAL '1 minute'                       AS window_start,
           date_trunc('minute', ts) - k * INTERVAL '1 minute' + INTERVAL '10 minutes' AS window_end,
           floor(round(sum(value), 4) / count(*) * 1e6 + 0.5) / 1e6 AS avg_value,
           min(value)           AS min_value,
           max(value)           AS max_value,
           count(*)             AS n
    FROM events CROSS JOIN range(0, 10) t(k)
    GROUP BY 1, 2, 3
    ORDER BY event_type, window_start
    """,
    doc="A2/T2: 10-min window sliding by 1 min, avg/min/max/count per symbol "
    "(stream_processor.py:114-130) — batch-equivalent of the streaming agg; "
    "oracle expands each row into its 10 covering windows.",
)
def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.window("ts", "10 minutes", "1 minute").alias("w")
        )
        .agg(
            # avg derived from the 4dp-rounded sum, then floor-quantized:
            # the rounded sum is the identical double on any engine (fp
            # accumulation noise ≪ 0.5e-4), so the division and floor are
            # identical IEEE ops — a plain round(avg, 6) flips the hash
            # when the true mean lands exactly on a half boundary (e.g.
            # sum/32 with 2-decimal inputs; observed at sf0.1)
            (
                F.floor(
                    F.round(F.sum("value"), 4) / F.count(F.lit(1)) * 1e6 + 0.5
                )
                / 1e6
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "avg_value",
            "min_value",
            "max_value",
            "n",
        )
    )


@register(
    "tumbling_hour_stats",
    """
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           floor(round(sum(value), 4) / count(*) * 1e6 + 0.5) / 1e6 AS avg_value,
           round(sum(value), 4) AS sum_value,
           count(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY event_type, window_start
    """,
    doc="T2 tumbling-window variant (1-hour buckets).",
)
def tumbling_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            # stabilized avg — see sliding_window_stats
            (
                F.floor(
                    F.round(F.sum("value"), 4) / F.count(F.lit(1)) * 1e6 + 0.5
                )
                / 1e6
            ).alias("avg_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type", F.col("w.start").alias("window_start"),
            "avg_value", "sum_value", "n",
        )
    )


# ---------------------------------------------------------------------------
# JSON decode (P2), scalar date/time functions (F4-F7)
# ---------------------------------------------------------------------------


@register(
    "json_props_agg",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                 THEN 1 END)                                                       AS n_high
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="P2: from_json decode of the props payload + aggregation "
    "(stream_processor.py:63-64 pattern).",
)
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_datetime",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_str,
           epoch_ms(ts)                       AS ts_ms,
           CAST(floor(epoch(ts)) AS BIGINT)   AS ts_s,
           date_trunc('hour', ts)             AS ts_hour,
           CAST(ts AS DATE)                   AS ts_date
    FROM events ORDER BY event_id
    """,
    doc="F4-F7 scalar functions: ISO-8601 format (historical_crawler.py:135), "
    "epoch ms/s conversions (batch_processor.py:91-92), hour truncation "
    "(hourly_updater.py:171).",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_str"),
        epoch_millis("ts").alias("ts_ms"),
        epoch_seconds("ts").alias("ts_s"),
        trunc_wallclock("hour", F.col("ts")).alias("ts_hour"),
        F.col("ts").cast("date").alias("ts_date"),
    )


# ---------------------------------------------------------------------------
# Union-all + dedup (§2.7 / §1.4) — the two-ingest-dirs pattern
# ---------------------------------------------------------------------------


@register(
    "union_dedup",
    """
    SELECT event_id, ts, event_type, value FROM (
      SELECT event_id, ts, event_type, value FROM events
      WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
      UNION
      SELECT event_id, ts, event_type, value FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    ) ORDER BY event_id
    """,
    doc="§2.7: union-all of overlapping ingest slices + key dedup — the "
    "historical+hourly-update CSV overlap resolved by doc-id upsert "
    "(batch_processor.py:132-148).",
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    older = ev.filter(F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    newer = ev.filter(F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
    return older.unionByName(newer).distinct()


# ---------------------------------------------------------------------------
# As-of join (north-star extension, SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "asof_join_purchase_click",
    """
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="As-of join: each purchase aligned to the latest click at-or-before "
    "it per user. Spark lacks a native ASOF; implemented as union + ordered "
    "window last(ignorenulls) — one shuffle by key, linear scan, no "
    "per-group pandas. Scales to arbitrarily large sides (vs merge_asof).",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("bigint").alias("event_id_p"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_p"),
    )
    # the null literal must carry ts's OWN flavor: a plain "timestamp"
    # (LTZ) null would coerce the whole unioned column to session-zone
    # LTZ, making the output time-zone dependent
    ts_type = dict(ev.dtypes)["ts"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("event_id_p"),
        F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(1).alias("is_p"),
    )
    # clicks sort before purchases at equal ts (is_p asc) → ASOF ">=" includes ties
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_p") == 1)
        .select(
            F.col("event_id_p").alias("event_id"), "user_id", "ts", "last_click_ts"
        )
    )


# ---------------------------------------------------------------------------
# Serving-layer J1: latest snapshot ⋈ per-key stats (app.py:92-107)
# ---------------------------------------------------------------------------


@register(
    "realtime_stats_join",
    """
    WITH latest AS (
      SELECT event_type, ts AS last_ts, value AS last_value FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY ts DESC, event_id DESC) AS rn FROM events
      ) WHERE rn = 1
    ), stats AS (
      SELECT event_type, round(avg(value), 6) AS avg_value,
             min(value) AS min_value, max(value) AS max_value, count(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT l.event_type, l.last_ts, l.last_value,
           s.avg_value, s.min_value, s.max_value, s.n
    FROM latest l JOIN stats s ON l.event_type = s.event_type
    ORDER BY l.event_type
    """,
    doc="J1: the /api/realtime_stats response as a real broadcast equi-join "
    "of the latest-candle snapshot and the per-key stats table.",
)
def realtime_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    latest = top1_per_key(ev, ["event_type"], [F.desc("ts"), F.desc("event_id")]).select(
        "event_type", F.col("ts").alias("last_ts"), F.col("value").alias("last_value")
    )
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        latest.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "last_ts", "last_value",
            "avg_value", "min_value", "max_value", "n",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# U1: recursive multi-step forecast (app.py:195-244), linearized stub model
# ---------------------------------------------------------------------------

_FC_STEPS = 24
_FC_LOOKBACK = 24


@register(
    "forecast_linear",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    ranked AS (
      SELECT symbol, bucket, "close",
             row_number() OVER (PARTITION BY symbol ORDER BY bucket DESC) AS rn_desc,
             "close" / lag("close") OVER (PARTITION BY symbol ORDER BY bucket) - 1 AS pct
      FROM candles
    ),
    model AS (
      SELECT symbol,
             arg_max("close", bucket)  AS last_close,
             max(bucket)               AS last_bucket,
             round(least(greatest(
                 avg(CASE WHEN rn_desc <= {_FC_LOOKBACK} THEN pct END),
                 -0.05), 0.05), 6)     AS drift
      FROM ranked GROUP BY symbol
    )
    SELECT symbol,
           last_bucket + step * INTERVAL '1 hour'                 AS horizon_ts,
           step,
           round(last_close * power(1 + drift, step), 6)          AS forecast
    FROM model CROSS JOIN range(1, {_FC_STEPS + 1}) t(step)
    ORDER BY symbol, step
    """,
    doc="U1: 24-step recursive forecast (app.py:195-244) with a deterministic "
    "drift model (pred_i = last_close·(1+d)^i, d = mean pct-change over the "
    "last 24 candles). Same recursive-multi-step serving shape as the "
    "XGBoost loop; fully distributed (no collect) and SQL-oracle-checkable. "
    "The pluggable joblib-model variant lives in ohlcv/forecast.py.",
)
def forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _candles(spark, sf_dir)
    w_desc = Window.partitionBy("symbol").orderBy(F.desc("bucket"))
    w_asc = Window.partitionBy("symbol").orderBy("bucket")
    ranked = candles.select(
        "symbol",
        "bucket",
        "close",
        F.row_number().over(w_desc).alias("rn_desc"),
        # try_divide: a zero close yields NULL (skipped by the drift avg)
        # instead of an ANSI divide-by-zero error — matches DuckDB x/0
        (F.try_divide(F.col("close"), F.lag("close").over(w_asc)) - 1).alias("pct"),
    )
    # drift clamped to ±5%/step (volatility guard — also keeps the
    # compounded forecast in a numerically comparable range) and rounded
    # so both engines exponentiate the identical base.
    model = ranked.groupBy("symbol").agg(
        F.max_by("close", "bucket").alias("last_close"),
        F.max("bucket").alias("last_bucket"),
        F.round(
            F.least(
                F.greatest(
                    F.avg(F.when(F.col("rn_desc") <= _FC_LOOKBACK, F.col("pct"))),
                    F.lit(-0.05),
                ),
                F.lit(0.05),
            ),
            6,
        ).alias("drift"),
    )
    steps = F.explode(F.sequence(F.lit(1), F.lit(_FC_STEPS))).alias("step")
    return (
        model.select("symbol", "last_close", "last_bucket", "drift", steps)
        .select(
            "symbol",
            (F.col("last_bucket") + F.make_interval(hours=F.col("step"))).alias("horizon_ts"),
            F.col("step"),
            F.round(
                F.col("last_close") * F.pow(1 + F.col("drift"), F.col("step")), 6
            ).alias("forecast"),
        )
        .orderBy("symbol", "step")
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based session windows) + distribution stats
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    """
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, value,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
      FROM g
    )
    SELECT user_id, sess_no,
           count(*)             AS n_events,
           min(ts)              AS sess_start,
           max(ts)              AS sess_end,
           round(sum(value), 4) AS sess_value
    FROM s
    GROUP BY user_id, sess_no
    ORDER BY user_id, sess_no
    """,
    doc="Gap-based sessionization (30-min inactivity gap): lag to flag "
    "session starts, running sum to number sessions, grouped session "
    "stats — the batch equivalent of a streaming session window. One "
    "shuffle on user_id serves both window passes and the final agg.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "sess_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "sess_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
            F.round(F.sum("value"), 4).alias("sess_value"),
        )
        # no final orderBy: the driver's value compare is order-
        # insensitive and a global sort of every session is a pure
        # range-exchange tax at scale (oracle keeps ORDER BY for
        # readable diffs only)
    )


@register(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact interpolated percentiles per key (Spark `percentile` = "
    "DuckDB `quantile_cont`, both linear interpolation). At 100 TB "
    "switch to approx_percentile (t-digest sketch, mergeable map-side) "
    "— kept exact here so the oracle can hash-match.",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.25), 6).alias("p25"),
            F.round(F.percentile("value", 0.50), 6).alias("p50"),
            F.round(F.percentile("value", 0.90), 6).alias("p90"),
            F.round(F.percentile("value", 0.99), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "value_histogram",
    """
    SELECT event_type,
           least(greatest(CAST(floor(value / 100.0) AS INTEGER), 0), 9) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    doc="Fixed-width histogram (10 buckets of 100, clamped): pure "
    "grouped count — the shape of every distribution dashboard; "
    "map-side combinable at any scale.",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 100.0).cast("int"), F.lit(0)), F.lit(9)
    )
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Technical-analysis extensions on the candle pipeline (round 4): the
# indicators a user of the reference's TA system reaches for next
# ---------------------------------------------------------------------------


@register(
    "bollinger_bands",
    f"""
    WITH candles AS ({_CANDLES_SQL})
    SELECT symbol, bucket, "close",
           round(avg("close") OVER w, 6) AS mid,
           round(avg("close") OVER w + 2 * stddev_samp("close") OVER w, 6) AS upper,
           round(avg("close") OVER w - 2 * stddev_samp("close") OVER w, 6) AS lower
    FROM candles
    WINDOW w AS (PARTITION BY symbol ORDER BY bucket
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ORDER BY symbol, bucket
    """,
    doc="Bollinger bands (20-bucket SMA ± 2σ) on the hourly candle "
    "series — the next indicator after the reference's SMA-7/30 "
    "(batch_processor.py:109-115). Both moments share ONE window frame "
    "-> one keyed shuffle, no extra pass for the stddev. Warm-up rows "
    "(<2 obs) emit NULL bands on both engines (sample stddev "
    "undefined).",
)
def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-19, Window.currentRow)
    )
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    return (
        _candles(spark, sf_dir)
        .select(
            "symbol",
            "bucket",
            "close",
            F.round(mid, 6).alias("mid"),
            F.round(mid + 2 * sd, 6).alias("upper"),
            F.round(mid - 2 * sd, 6).alias("lower"),
        )
        .orderBy("symbol", "bucket")
    )


@register(
    "vwap_daily",
    f"""
    WITH candles AS ({_CANDLES_SQL})
    SELECT symbol, CAST(bucket AS DATE) AS day,
           round(sum("close" * volume) / sum(volume), 6) AS vwap,
           round(sum(volume), 4) AS total_volume,
           count(*) AS n_buckets
    FROM candles GROUP BY symbol, CAST(bucket AS DATE)
    ORDER BY symbol, day
    """,
    doc="Daily volume-weighted average price per symbol from the hourly "
    "candles — the aggregation a serving dashboard lays over the raw "
    "chart. Reuses the candle aggregate; one further partial-agg "
    "shuffle on (symbol, day), output |symbols|x|days| rows.",
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _candles(spark, sf_dir)
        .groupBy("symbol", F.col("bucket").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("close") * F.col("volume")) / F.sum("volume"), 6
            ).alias("vwap"),
            F.round(F.sum("volume"), 4).alias("total_volume"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .orderBy("symbol", "day")
    )


@register(
    "zscore_anomalies",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           round((value - mu) / sd, 6) AS zscore
    FROM events e JOIN stats USING (event_type)
    WHERE abs((value - mu) / sd) > 3
    ORDER BY event_id
    """,
    doc="Global z-score outlier flagging per key: one |keys|-row "
    "moment aggregate broadcast back onto the stream of rows, narrow "
    "filter — the data-quality sweep before training on metric data. "
    "At scale the stats side is a broadcast join; the fact table is "
    "scanned once and never shuffled.",
)
def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("event_id")
    )


@register(
    "rsi_cutler_14",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    d AS (
      SELECT symbol, bucket,
             "close" - lag("close") OVER (PARTITION BY symbol ORDER BY bucket)
             AS delta
      FROM candles)
    SELECT symbol, bucket,
           round(CASE WHEN avg(greatest(-delta, 0)) OVER w = 0 THEN 100.0
                 ELSE 100 - 100 / (1 + avg(greatest(delta, 0)) OVER w
                                     / avg(greatest(-delta, 0)) OVER w) END,
                 6) AS rsi_14
    FROM d
    WINDOW w AS (PARTITION BY symbol ORDER BY bucket
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ORDER BY symbol, bucket
    """,
    doc="Cutler's RSI-14 on the hourly candles: SMA of gains vs losses "
    "over 14 buckets (the window-expressible RSI variant; Wilder's "
    "recursive smoothing is the ema-fold pattern instead). delta, both "
    "averages, and the ratio all share one keyed window -> single "
    "shuffle; warm-up row (no previous close) is NULL on both engines; "
    "all-loss-free windows emit the conventional 100.",
)
def rsi_cutler_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("symbol").orderBy("bucket")
    wa = w1.rowsBetween(-13, Window.currentRow)
    d = _candles(spark, sf_dir).withColumn(
        "delta", F.col("close") - F.lag("close").over(w1)
    )
    avg_gain = F.avg(F.greatest(F.col("delta"), F.lit(0.0))).over(wa)
    avg_loss = F.avg(F.greatest(-F.col("delta"), F.lit(0.0))).over(wa)
    rsi = F.when(avg_loss == 0, F.lit(100.0)).otherwise(
        100 - 100 / (1 + avg_gain / avg_loss)
    )
    return d.select(
        "symbol", "bucket", F.round(rsi, 6).alias("rsi_14")
    ).orderBy("symbol", "bucket")


_A12, _A26, _A9 = 2.0 / 13.0, 2.0 / 27.0, 2.0 / 10.0


@register(
    "macd_12_26_9",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    p AS (
      SELECT symbol, bucket,
             list("close") OVER (PARTITION BY symbol ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      FROM candles),
    m AS (
      SELECT symbol, bucket,
             list_reduce(prefix, (acc, x) -> {_A12!r} * x + {1 - _A12!r} * acc)
           - list_reduce(prefix, (acc, x) -> {_A26!r} * x + {1 - _A26!r} * acc)
             AS macd
      FROM p),
    s AS (
      SELECT symbol, bucket, macd,
             list_reduce(
               list(macd) OVER (PARTITION BY symbol ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               (acc, x) -> {_A9!r} * x + {1 - _A9!r} * acc) AS signal
      FROM m)
    SELECT symbol, bucket, round(macd, 6) AS macd,
           round(signal, 6) AS signal,
           round(macd - signal, 6) AS histogram
    FROM s ORDER BY symbol, bucket
    """,
    doc="MACD(12, 26, 9) on the hourly candles: fast/slow EMAs as "
    "JVM-side prefix folds (operators/windows.py::ema — no Python in "
    "the loop), signal = EMA-9 of the MACD line, histogram = macd - "
    "signal. Identical fold constants injected into the DuckDB oracle "
    "(list_reduce with first-element init on both engines). One keyed "
    "shuffle serves every window; O(n^2) prefix state per key bounds "
    "this to dashboard-scale series — ema_long (applyInPandas) is the "
    "long-series swap.",
)
def macd_12_26_9(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir)
    c = ema(c, "close", ["symbol"], ["bucket"], 12)
    c = ema(c, "close", ["symbol"], ["bucket"], 26)
    c = c.withColumn("macd", F.col("ema_12") - F.col("ema_26"))
    c = ema(c, "macd", ["symbol"], ["bucket"], 9, out_col="signal")
    return c.select(
        "symbol",
        "bucket",
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("signal"),
        F.round(F.col("macd") - F.col("signal"), 6).alias("histogram"),
    ).orderBy("symbol", "bucket")


@register(
    "interval_clicks_in_hot_windows",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    hot AS (
      SELECT bucket - INTERVAL 30 MINUTE AS w_start,
             bucket + INTERVAL 90 MINUTE AS w_end
      FROM candles WHERE symbol = 'purchase' AND n_trades >= 3
    )
    SELECT w_start, w_end, count(c.ts) AS n_clicks
    FROM hot LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
      ON c.ts >= w_start AND c.ts < w_end
    GROUP BY w_start, w_end
    ORDER BY w_start
    """,
    doc="Point-in-interval range join WITHOUT a cartesian: click "
    "activity around hot purchase hours ([hour-30min, hour+90min) "
    "windows). Catalyst plans a bare range predicate as nested-loop + "
    "filter (O(L*R)); operators/rangejoin.py bucketizes instead — "
    "intervals explode to the hour buckets they cover, points key by "
    "their single bucket, and the equi-join bounds candidates by "
    "bucket width. The oracle is the naive overlap join (same "
    "semantics, tractable at fixture scale).",
)
def interval_clicks_in_hot_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import point_in_interval_join

    candles = _candles(spark, sf_dir)
    hot = candles.filter(
        (F.col("symbol") == "purchase") & (F.col("n_trades") >= 3)
    ).select(
        (F.col("bucket") - F.expr("INTERVAL 30 MINUTE")).alias("w_start"),
        (F.col("bucket") + F.expr("INTERVAL 90 MINUTE")).alias("w_end"),
    )
    clicks = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("ts")
    )
    joined = point_in_interval_join(
        hot, clicks, "w_start", "w_end", "ts", bucket_width_s=3600, how="left"
    )
    return (
        joined.groupBy("w_start", "w_end")
        .agg(F.count("ts").alias("n_clicks"))
        .orderBy("w_start")
    )


@register(
    "cms_event_type_counts",
    None,  # xxhash64 cell placement is engine-internal -> rows-only;
    # one-sided-error/merge guarantees pinned in tests/test_sketch.py
    doc="Count-min sketch frequency estimates per event_type "
    "(operators/sketch.py, w=256 d=4): the mergeable at-scale swap for "
    "exact per-key counts — the 100 TB stream reduces to a d*w-cell "
    "state that merges across partitions/windows by cell-wise "
    "addition; estimates never undercount and are within e/w*N. One "
    "grouped aggregate to build (map-side combine bounds the shuffle "
    "at d*w per mapper), broadcast probe to read.",
)
def cms_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_build, cms_estimate

    ev = load(spark, sf_dir, "events").select("event_type")
    sketch = cms_build(ev, "event_type")
    return cms_estimate(
        sketch, ev.select("event_type").distinct(), "event_type"
    ).orderBy("event_type")


@register(
    "rolling_median_value",
    """
    SELECT event_id, event_type, ts, value,
           round(median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW), 6) AS med_25
    FROM events
    ORDER BY event_type, ts, event_id
    """,
    doc="Exact trailing 25-row median per event type — the robust twin "
    "of sma_events (operators/windows.py::rolling_median): frame values "
    "sorted JVM-side per row, middle element(s) picked with element_at "
    "(even frames interpolate, matching quantile_cont(0.5)). Frame-"
    "bounded O(w log w) per row on the one per-key shuffle; swap "
    "approx_percentile in for large frames at scale.",
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import rolling_median

    ev = load(spark, sf_dir, "events")
    out = rolling_median(
        ev, "value", ["event_type"], ["ts", "event_id"], 25, "med_25"
    )
    return out.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.round("med_25", 6).alias("med_25"),
    )


@register(
    "candles_daily_rollup",
    f"""
    WITH candles AS ({_CANDLES_SQL})
    SELECT symbol,
           date_trunc('day', bucket)          AS day,
           arg_min("open", bucket)            AS "open",
           max(high)                          AS high,
           min(low)                           AS low,
           arg_max("close", bucket)           AS "close",
           round(sum(volume), 4)              AS volume,
           CAST(sum(n_trades) AS BIGINT)      AS n_trades,
           CAST(count(*) AS BIGINT)           AS n_hours
    FROM candles
    GROUP BY symbol, date_trunc('day', bucket)
    ORDER BY symbol, day
    """,
    doc="Hierarchical continuous-aggregate rollup (TimescaleDB "
    "hypertable shape): DAILY candles computed FROM the hourly candle "
    "aggregate, not from raw events — open/close via arg_min/arg_max "
    "over the hour buckets, high/low/volume/n_trades merged. The "
    "two-level plan is the at-scale posture: the hourly layer is 3-4 "
    "orders of magnitude smaller than raw events, so every coarser "
    "resolution (day/week/month) re-aggregates the rollup, never the "
    "100 TB base table. Extends reference batch_processor.py:109-115 "
    "(single-resolution candles) to the resolution hierarchy.",
)
def candles_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _candles(spark, sf_dir)
    return (
        hourly.groupBy(
            "symbol",
            trunc_wallclock("day", F.col("bucket")).cast("date").alias("day"),
        )
        .agg(
            F.min_by("open", "bucket").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "bucket").alias("close"),
            F.round(F.sum("volume"), 4).alias("volume"),
            F.sum("n_trades").alias("n_trades"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .orderBy("symbol", "day")
    )


# ---------------------------------------------------------------------------
# Graph analytics: behavioral PageRank over event-type transitions
# ---------------------------------------------------------------------------


from ..operators import graph as _graph  # noqa: E402


@register(
    "pagerank_event_transitions",
    _graph.pagerank_oracle_sql(
        edges_cte=(
            "SELECT src, dst, CAST(1 AS DOUBLE) AS w FROM ("
            "SELECT event_type AS src, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS dst FROM events) "
            "WHERE dst IS NOT NULL"
        ),
        nodes_cte="SELECT DISTINCT event_type AS node FROM events",
    ),
    doc="Behavioral PageRank (Markov-chain attribution): per-user "
    "event streams become a type→type transition graph (lead window, "
    "one shuffle by user), arcs aggregate to transition probabilities, "
    "and 8 damped power iterations rank the types by stationary "
    "importance. Iteration shuffles are |edges|-sized, never "
    "fact-table-sized; ranks round per iteration so the DuckDB "
    "unrolled-CTE oracle reproduces the floats exactly.",
)
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    return _graph.pagerank(trans, nodes, n_iter=8).orderBy("node")


@register(
    "stochastic_oscillator_14",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    k AS (
      SELECT symbol, bucket,
             count(*) OVER w AS n_win,
             CASE WHEN max(high) OVER w = min(low) OVER w THEN 50.0
                  ELSE 100.0 * ("close" - min(low) OVER w)
                       / (max(high) OVER w - min(low) OVER w) END AS pct_k
      FROM candles
      WINDOW w AS (PARTITION BY symbol ORDER BY bucket
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT symbol, bucket,
           round(pct_k, 6) AS pct_k,
           round(avg(pct_k) OVER (PARTITION BY symbol ORDER BY bucket
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) AS pct_d
    FROM k
    WHERE n_win = 14
    ORDER BY symbol, bucket
    """,
    doc="Stochastic oscillator on the hourly candles: %K = position of "
    "the close inside the 14-bucket high-low envelope, %D = SMA-3 of "
    "%K — the momentum indicator completing the TA family (SMA/EMA/"
    "RSI/MACD/Bollinger/VWAP). Both window layers share the keyed "
    "sort ⇒ one shuffle; full-window gating (n_win = 14) keeps the "
    "envelope well-defined, flat envelopes emit the conventional "
    "mid-scale 50.",
)
def stochastic_oscillator_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-13, Window.currentRow)
    )
    hi, lo = F.max("high").over(w), F.min("low").over(w)
    k = _candles(spark, sf_dir).select(
        "symbol",
        "bucket",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.when(hi == lo, F.lit(50.0))
        .otherwise(100.0 * (F.col("close") - lo) / (hi - lo))
        .alias("pct_k"),
    )
    wd = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        k.filter(F.col("n_win") == 14)
        .select(
            "symbol",
            "bucket",
            F.round("pct_k", 6).alias("pct_k"),
            F.round(F.avg("pct_k").over(wd), 6).alias("pct_d"),
        )
        .orderBy("symbol", "bucket")
    )


@register(
    "atr_14",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    tr AS (
      SELECT symbol, bucket,
             greatest(high - low,
                      abs(high - lag("close") OVER w1),
                      abs(low - lag("close") OVER w1)) AS tr,
             row_number() OVER w1 AS rn
      FROM candles
      WINDOW w1 AS (PARTITION BY symbol ORDER BY bucket))
    SELECT symbol, bucket,
           round(avg(tr) OVER (PARTITION BY symbol ORDER BY bucket
                               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
                 6) AS atr_14
    FROM tr
    WHERE tr IS NOT NULL
    QUALIFY rn >= 15
    ORDER BY symbol, bucket
    """,
    doc="Average True Range (Wilder's volatility measure, SMA variant "
    "like rsi_cutler_14): true range folds the gap to the previous "
    "close into the bar's high-low span, ATR is its 14-bucket trailing "
    "mean. lag, the greatest(), and the trailing average all ride ONE "
    "keyed window sort; rows before a full 14-TR history are gated "
    "out (rn ≥ 15: 1 lag warm-up + 14 ranges).",
)
def atr_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w1)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    base = _candles(spark, sf_dir).select(
        "symbol",
        "bucket",
        tr.alias("tr"),
        F.row_number().over(w1).alias("rn"),
    )
    wa = w1.rowsBetween(-13, Window.currentRow)
    return (
        base.filter(F.col("tr").isNotNull())
        .withColumn("atr_14", F.round(F.avg("tr").over(wa), 6))
        .filter(F.col("rn") >= 15)
        .select("symbol", "bucket", "atr_14")
        .orderBy("symbol", "bucket")
    )


@register(
    "obv_running",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    s AS (
      SELECT symbol, bucket,
             CASE WHEN lag("close") OVER w1 IS NULL THEN 0.0
                  WHEN "close" > lag("close") OVER w1 THEN volume
                  WHEN "close" < lag("close") OVER w1 THEN -volume
                  ELSE 0.0 END AS signed_vol
      FROM candles
      WINDOW w1 AS (PARTITION BY symbol ORDER BY bucket))
    SELECT symbol, bucket,
           round(sum(signed_vol) OVER (PARTITION BY symbol ORDER BY bucket
                                       ROWS UNBOUNDED PRECEDING), 4) AS obv
    FROM s
    ORDER BY symbol, bucket
    """,
    doc="On-balance volume: the running sum of volume signed by the "
    "close-to-close direction — the classic volume-flow confirmation "
    "indicator. Sign via lag and the cumulative sum share one keyed "
    "window sort; the first bucket contributes 0 by convention.",
)
def obv_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("symbol").orderBy("bucket")
    prev = F.lag("close").over(w1)
    signed = (
        F.when(prev.isNull(), F.lit(0.0))
        .when(F.col("close") > prev, F.col("volume"))
        .when(F.col("close") < prev, -F.col("volume"))
        .otherwise(F.lit(0.0))
    )
    run = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        _candles(spark, sf_dir)
        .select("symbol", "bucket", signed.alias("signed_vol"))
        .select(
            "symbol",
            "bucket",
            F.round(F.sum("signed_vol").over(run), 4).alias("obv"),
        )
        .orderBy("symbol", "bucket")
    )


@register(
    "max_drawdown",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    dd AS (
      SELECT symbol,
             1.0 - "close" / max("close") OVER (PARTITION BY symbol
                                                ORDER BY bucket
                                                ROWS UNBOUNDED PRECEDING)
               AS drawdown
      FROM candles)
    SELECT symbol,
           count(*) AS n_buckets,
           round(max(drawdown), 6) AS max_drawdown
    FROM dd GROUP BY symbol ORDER BY symbol
    """,
    doc="Maximum drawdown per symbol: largest peak-to-trough decline of "
    "the close series, via a running max (one keyed window sort) and "
    "a per-symbol max — the risk statistic every quant summary of the "
    "reference's candle data would lead with. No global sort, no "
    "self-join over time.",
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    run = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = _candles(spark, sf_dir).select(
        "symbol",
        (1.0 - F.col("close") / F.max("close").over(run)).alias("drawdown"),
    )
    return (
        dd.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.max("drawdown"), 6).alias("max_drawdown"),
        )
        .orderBy("symbol")
    )


@register(
    "drawdown_duration",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    uw AS (
      SELECT symbol, bucket,
             CASE WHEN "close" < max("close") OVER (PARTITION BY symbol
                                                    ORDER BY bucket
                                                    ROWS UNBOUNDED PRECEDING)
                  THEN 1 ELSE 0 END AS underwater
      FROM candles),
    grp AS (
      SELECT symbol, underwater,
             sum(1 - underwater) OVER (PARTITION BY symbol ORDER BY bucket
                                       ROWS UNBOUNDED PRECEDING) AS island
      FROM uw),
    runs AS (
      SELECT symbol, island, count(*) AS run_len
      FROM grp WHERE underwater = 1
      GROUP BY symbol, island)
    SELECT symbol,
           CAST(coalesce(max(r.run_len), 0) AS BIGINT)
             AS max_underwater_buckets,
           CAST(coalesce(sum(r.run_len), 0) AS BIGINT) AS n_underwater
    FROM (SELECT DISTINCT symbol FROM candles) s
    LEFT JOIN runs r USING (symbol)
    GROUP BY symbol
    ORDER BY symbol
    """,
    doc="Drawdown duration: the longest consecutive underwater streak "
    "(close below the running peak) per symbol, plus total underwater "
    "buckets — the time dimension max_drawdown's depth metric lacks. "
    "Gaps-and-islands via the running count of at-peak rows as the "
    "island label; running max, island labeling, and the run "
    "aggregate all ride one keyed window sort.",
)
def drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    run = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    candles = _candles(spark, sf_dir)
    uw = candles.select(
        "symbol",
        "bucket",
        F.when(F.col("close") < F.max("close").over(run), 1)
        .otherwise(0)
        .alias("underwater"),
    )
    grp = uw.select(
        "symbol",
        "underwater",
        F.sum(1 - F.col("underwater")).over(run).alias("island"),
    )
    runs = (
        grp.filter(F.col("underwater") == 1)
        .groupBy("symbol", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    syms = candles.select("symbol").distinct()
    return (
        syms.join(runs, "symbol", "left")
        .groupBy("symbol")
        .agg(
            F.coalesce(F.max("run_len"), F.lit(0))
            .cast("long")
            .alias("max_underwater_buckets"),
            F.coalesce(F.sum("run_len"), F.lit(0))
            .cast("long")
            .alias("n_underwater"),
        )
        .orderBy("symbol")
    )


@register(
    "capm_beta_alpha",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    r AS (
      SELECT symbol, bucket,
             "close" / lag("close") OVER (PARTITION BY symbol
                                          ORDER BY bucket) - 1 AS ret
      FROM candles WHERE symbol IN ('purchase', 'view')),
    aligned AS (
      SELECT a.bucket, a.ret AS ra, m.ret AS rm
      FROM r a JOIN r m ON a.bucket = m.bucket
      WHERE a.symbol = 'purchase' AND m.symbol = 'view'
        AND a.ret IS NOT NULL AND m.ret IS NOT NULL)
    SELECT count(*) AS n_buckets,
           round(covar_pop(ra, rm) / var_pop(rm), 6) AS beta,
           round(avg(ra) - covar_pop(ra, rm) / var_pop(rm) * avg(rm), 6)
             AS alpha,
           round(corr(ra, rm), 6) AS r_corr
    FROM aligned
    """,
    doc="CAPM-style regression of one series' hourly returns on "
    "another's: β = cov(ra,rm)/var(rm), α = E[ra] − β·E[rm] — the "
    "cross-asset exposure summary every pairs/hedging analysis of the "
    "reference's candle data starts from (rolling_corr_pairs is the "
    "windowed cousin). Returns via one keyed window sort, alignment "
    "via one bucket-keyed join of the tiny candle series, moments in "
    "a single aggregate.",
)
def capm_beta_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("symbol").orderBy("bucket")
    r = (
        _candles(spark, sf_dir)
        .filter(F.col("symbol").isin("purchase", "view"))
        .select(
            "symbol",
            "bucket",
            (F.col("close") / F.lag("close").over(w1) - 1).alias("ret"),
        )
        .filter(F.col("ret").isNotNull())
    )
    a = r.filter(F.col("symbol") == "purchase").select(
        "bucket", F.col("ret").alias("ra")
    )
    m = r.filter(F.col("symbol") == "view").select(
        "bucket", F.col("ret").alias("rm")
    )
    al = a.join(m, "bucket")
    beta = F.covar_pop("ra", "rm") / F.var_pop("rm")
    return al.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(beta, 6).alias("beta"),
        F.round(F.avg("ra") - beta * F.avg("rm"), 6).alias("alpha"),
        F.round(F.corr("ra", "rm"), 6).alias("r_corr"),
    )


# ---------------------------------------------------------------------------
# Round-6l: interval-interval overlap join (session co-presence) and a
# Simpson's-paradox audit
# ---------------------------------------------------------------------------

_SESS_CTE = """
    g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
      FROM g
    ),
    sess AS (
      SELECT user_id, sess_no, min(ts) AS sess_start, max(ts) AS sess_end
      FROM s GROUP BY user_id, sess_no
    )
"""


@register(
    "session_overlap_pairs",
    f"""
    WITH {_SESS_CTE},
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2,
             date_diff('second', greatest(a.sess_start, b.sess_start),
                       least(a.sess_end, b.sess_end)) AS ov
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id
       AND a.sess_start <= b.sess_end AND b.sess_start <= a.sess_end
    )
    SELECT u1, u2, CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(ov) AS BIGINT) AS overlap_secs
    FROM pairs GROUP BY u1, u2
    ORDER BY overlap_secs DESC, u1, u2 LIMIT 50
    """,
    doc="Session co-presence: top-50 user pairs by total overlapping "
    "session time (gap-30-min sessions, closed-interval overlap) — "
    "the interval x interval join that co-browsing/fraud-ring/"
    "collusion detection runs. Spark side goes through operators/"
    "rangejoin.py::interval_overlap_join: both session sets explode "
    "onto hour buckets, the overlap predicate rides in a bucket "
    "EQUI-join, and bucket-induced duplicates collapse by key — "
    "|sessions| x avg-hours work through one hash shuffle, never the "
    "|sessions|^2 nested loop the oracle uses to certify it.",
)
def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join
    from ..timeutil import epoch_seconds

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap flag via epoch seconds (ts may be TIMESTAMP_NTZ — timeutil)
    gap = epoch_seconds(F.col("ts")) - epoch_seconds(F.lag("ts").over(w))
    sess = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.lag("ts").over(w).isNull() | (gap > 1800), 1
            )
            .otherwise(0)
            .alias("new_sess"),
        )
        .select(
            "user_id",
            "ts",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("sess_no"),
        )
        .groupBy("user_id", "sess_no")
        .agg(
            F.min("ts").alias("sess_start"), F.max("ts").alias("sess_end")
        )
    )
    # r13 NOTE: a localCheckpoint here (to share the session chain
    # between the two overlap-join sides) was measured and REVERTED:
    # 3.1 -> 5.2 s at sf0.1 — AQE's exchange/stage reuse already dedups
    # the events shuffle at runtime, and the checkpoint only added a
    # materialization barrier before the broadcast side could build.
    left = sess.select(
        F.col("user_id").alias("u1"),
        F.col("sess_start"),
        F.col("sess_end"),
    )
    right = sess.select(
        F.col("user_id").alias("u2"),
        F.col("sess_start"),
        F.col("sess_end"),
    )
    joined = interval_overlap_join(
        left, right, "sess_start", "sess_end", width_seconds=3600
    ).where(F.col("u1") < F.col("__r_u2"))
    ov = epoch_seconds(
        F.least("sess_end", "__r_sess_end")
    ) - epoch_seconds(F.greatest("sess_start", "__r_sess_start"))
    return (
        joined.select("u1", F.col("__r_u2").alias("u2"), ov.alias("ov"))
        .groupBy("u1", "u2")
        .agg(
            F.count("*").cast("bigint").alias("n_overlaps"),
            F.sum("ov").cast("bigint").alias("overlap_secs"),
        )
        .orderBy(F.desc("overlap_secs"), "u1", "u2")
        .limit(50)
    )


@register(
    "simpson_paradox_audit",
    """
    WITH ue AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    coh AS (
      SELECT user_id,
             CASE WHEN ntile(2) OVER (ORDER BY n DESC, user_id) = 1
                  THEN 1 ELSE 0 END AS heavy
      FROM ue
    ),
    ev AS (
      SELECT CASE WHEN isodow(CAST(e.ts AS DATE)) >= 6
                  THEN 'weekend' ELSE 'weekday' END AS stratum,
             coh.heavy,
             CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events e JOIN coh USING (user_id)
    ),
    strat AS (
      SELECT stratum,
             sum(CASE WHEN heavy = 1 THEN is_p END) * 1.0
               / sum(CASE WHEN heavy = 1 THEN 1 END) AS rate_heavy,
             sum(CASE WHEN heavy = 0 THEN is_p END) * 1.0
               / sum(CASE WHEN heavy = 0 THEN 1 END) AS rate_light
      FROM ev GROUP BY stratum
      UNION ALL
      SELECT 'OVERALL',
             sum(CASE WHEN heavy = 1 THEN is_p END) * 1.0
               / sum(CASE WHEN heavy = 1 THEN 1 END),
             sum(CASE WHEN heavy = 0 THEN is_p END) * 1.0
               / sum(CASE WHEN heavy = 0 THEN 1 END)
      FROM ev
    )
    SELECT stratum, round(rate_heavy, 6) AS rate_heavy,
           round(rate_light, 6) AS rate_light,
           round(rate_heavy - rate_light, 6) AS rate_diff,
           CAST(sign(rate_heavy - rate_light) <> sign(
                  max(CASE WHEN stratum = 'OVERALL'
                      THEN rate_heavy - rate_light END) OVER ())
                AS INTEGER) AS reversed_vs_overall
    FROM strat ORDER BY stratum
    """,
    doc="Simpson's-paradox audit on purchase rates: heavy vs light "
    "user cohorts (top/bottom activity halves, ordinal ntile so both "
    "engines agree), compared OVERALL and within weekday/weekend "
    "strata; a stratum whose rate gap flips sign against the overall "
    "gap is the aggregation-reversal warning every metrics platform "
    "should raise before anyone acts on the marginal table. Two "
    "grouped aggregates + a 3-row union; the cohort split is one "
    "|users|-sized window.",
)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ue = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    coh = ue.select(
        "user_id",
        (F.ntile(2).over(Window.orderBy(F.desc("n"), "user_id")) == 1)
        .cast("int")
        .alias("heavy"),
    )
    evc = ev.join(coh, "user_id").select(
        F.when(F.weekday("ts") >= 5, "weekend")
        .otherwise("weekday")
        .alias("stratum"),
        "heavy",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )

    per = evc.groupBy("stratum").agg(
        (
            F.sum(F.when(F.col("heavy") == 1, F.col("is_p")))
            * 1.0
            / F.sum(F.when(F.col("heavy") == 1, 1))
        ).alias("rate_heavy"),
        (
            F.sum(F.when(F.col("heavy") == 0, F.col("is_p")))
            * 1.0
            / F.sum(F.when(F.col("heavy") == 0, 1))
        ).alias("rate_light"),
    )
    overall = evc.agg(
        (
            F.sum(F.when(F.col("heavy") == 1, F.col("is_p")))
            * 1.0
            / F.sum(F.when(F.col("heavy") == 1, 1))
        ).alias("rate_heavy"),
        (
            F.sum(F.when(F.col("heavy") == 0, F.col("is_p")))
            * 1.0
            / F.sum(F.when(F.col("heavy") == 0, 1))
        ).alias("rate_light"),
    ).select(F.lit("OVERALL").alias("stratum"), "rate_heavy", "rate_light")
    strat = per.unionByName(overall)
    ov_diff = F.max(
        F.when(
            F.col("stratum") == "OVERALL",
            F.col("rate_heavy") - F.col("rate_light"),
        )
    ).over(Window.partitionBy())
    return strat.select(
        "stratum",
        F.round("rate_heavy", 6).alias("rate_heavy"),
        F.round("rate_light", 6).alias("rate_light"),
        F.round(F.col("rate_heavy") - F.col("rate_light"), 6).alias("rate_diff"),
        (
            F.signum(F.col("rate_heavy") - F.col("rate_light"))
            != F.signum(ov_diff)
        )
        .cast("int")
        .alias("reversed_vs_overall"),
    ).orderBy("stratum")


_ASOF_NEAREST_TOL_S = 3600  # nearest-match tolerance


@register(
    "asof_join_nearest_click",
    f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    back AS (
      SELECT p.event_id, p.user_id, p.ts, c.ts AS bts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    fwd AS (
      SELECT p.event_id, c.ts AS fts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    ),
    j AS (
      SELECT back.event_id, back.user_id, back.ts, back.bts, fwd.fts,
             CASE WHEN back.bts IS NOT NULL
                  THEN epoch_us(back.ts) - epoch_us(back.bts) END AS db_us,
             CASE WHEN fwd.fts IS NOT NULL
                  THEN epoch_us(fwd.fts) - epoch_us(back.ts) END AS df_us
      FROM back JOIN fwd USING (event_id)
    ),
    pick AS (
      SELECT event_id, user_id, ts,
             CASE
               WHEN db_us IS NOT NULL
                    AND (df_us IS NULL OR db_us <= df_us) THEN bts
               WHEN df_us IS NOT NULL THEN fts END AS nts,
             CASE
               WHEN db_us IS NOT NULL
                    AND (df_us IS NULL OR db_us <= df_us) THEN db_us
               WHEN df_us IS NOT NULL THEN df_us END AS d_us,
             CASE
               WHEN db_us IS NOT NULL
                    AND (df_us IS NULL OR db_us <= df_us) THEN 'backward'
               WHEN df_us IS NOT NULL THEN 'forward' END AS direction
      FROM j
    )
    SELECT event_id, user_id, ts,
           CASE WHEN d_us <= CAST({_ASOF_NEAREST_TOL_S} AS BIGINT) * 1000000
                THEN nts END AS nearest_click_ts,
           CASE WHEN d_us <= CAST({_ASOF_NEAREST_TOL_S} AS BIGINT) * 1000000
                THEN CAST(d_us // 1000000 AS BIGINT) END AS delta_s,
           CASE WHEN d_us <= CAST({_ASOF_NEAREST_TOL_S} AS BIGINT) * 1000000
                THEN direction END AS direction
    FROM pick ORDER BY event_id
    """,
    doc="NEAREST-direction as-of join with tolerance: each purchase "
    "aligned to the closest click per user in EITHER direction "
    f"(ties -> backward), nulled beyond {_ASOF_NEAREST_TOL_S} s — "
    "pandas merge_asof(direction='nearest') at engine scale. Both "
    "directions come from the same union+ordered-window trick as the "
    "backward as-of (one shuffle by user, last-ignorenulls for "
    "backward, first-ignorenulls over the FOLLOWING frame for "
    "forward); no pair join, no per-group pandas. The oracle replays "
    "via two DuckDB ASOF joins.",
)
def asof_join_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("bigint").alias("event_id_p"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("event_id_p"),
        F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(1).alias("is_p"),
    )
    # backward: clicks sort first at equal ts (is_p asc) so ties count;
    # forward: frame starts at CURRENT ROW, same ordering keeps a
    # same-ts click inside the following frame? No — a same-ts click
    # sorts BEFORE the purchase, so the forward frame must start at
    # the first row of the same ts: order forward by (ts, is_p) and
    # take min click_ts over a RANGE-on-ts-like trick. Simpler and
    # exact: compute forward on the REVERSED sort (ts desc, is_p desc)
    # with last-ignorenulls over the preceding frame — a same-ts click
    # then sorts AFTER the purchase in reversed order and is included,
    # mirroring backward-tie semantics (delta 0 on both sides).
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("is_p"), F.desc("event_id_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        clicks.unionByName(purchases)
        .withColumn("bts", F.last("click_ts", ignorenulls=True).over(wb))
        .withColumn("fts", F.last("click_ts", ignorenulls=True).over(wf))
    )
    from ..timeutil import epoch_micros

    db = F.when(
        F.col("bts").isNotNull(),
        epoch_micros(F.col("ts")) - epoch_micros(F.col("bts")),
    )
    df_ = F.when(
        F.col("fts").isNotNull(),
        epoch_micros(F.col("fts")) - epoch_micros(F.col("ts")),
    )
    take_back = db.isNotNull() & (df_.isNull() | (db <= df_))
    nts = F.when(take_back, F.col("bts")).otherwise(
        F.when(df_.isNotNull(), F.col("fts"))
    )
    d_us = F.when(take_back, db).otherwise(df_)
    direction = F.when(take_back, F.lit("backward")).otherwise(
        F.when(df_.isNotNull(), F.lit("forward"))
    )
    tol = _ASOF_NEAREST_TOL_S * 1_000_000
    in_tol = d_us <= tol
    return (
        merged.filter(F.col("is_p") == 1)
        .select(
            F.col("event_id_p").alias("event_id"),
            "user_id",
            "ts",
            F.when(in_tol, nts).alias("nearest_click_ts"),
            F.when(in_tol, F.floor(d_us / 1_000_000)).cast("bigint").alias(
                "delta_s"
            ),
            F.when(in_tol, direction).alias("direction"),
        )
        .orderBy("event_id")
    )
