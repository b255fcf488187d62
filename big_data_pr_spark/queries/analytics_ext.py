"""Analytics extensions: aggregate/window shapes common in production
OLAP surfaces that the reference system never needed (SURVEY.md §2.4
note: "Spark built-ins cover the extension surface with zero custom
code") — each registered with a DuckDB oracle so the driver hash-gates
it like any reference-parity query.

Scale posture per query is noted inline; all of them are single-shuffle
grouped aggregates or keyed window functions — no driver-side data
paths, no Python UDFs (plan stays inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.diff import table_diff
from ..tables import load
from ..timeutil import epoch_micros, trunc_wallclock
from .events_queries import _CANDLES_SQL, _candles
from .registry import register

# ---------------------------------------------------------------------------
# Grouping sets (generalizes the rollup/cube pair already registered)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus)       AS gid,
           count(*)                                   AS n,
           round(sum(l_quantity), 2)                  AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, l_returnflag, l_linestatus
    """,
    doc="Explicit GROUPING SETS (detail, per-flag subtotal, grand total) "
    "with grouping_id disambiguating NULL-as-subtotal from NULL data. "
    "One pass over the fact table; Catalyst expands sets via a single "
    "Expand node feeding one partial-aggregated shuffle — at 100 TB the "
    "cost is (#sets ×) map output, never extra scans.",
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Statistical moments / bivariate statistics
# ---------------------------------------------------------------------------


@register(
    "stats_moments",
    """
    SELECT l_returnflag,
           count(*)                                      AS n,
           round(avg(l_quantity), 6)                     AS avg_qty,
           round(stddev_samp(l_quantity), 6)             AS sd_qty,
           round(var_samp(l_quantity), 6)                AS var_qty,
           round(covar_samp(l_quantity, l_discount), 6)  AS covar_qd,
           round(corr(l_quantity, l_extendedprice), 6)   AS corr_qp,
           round(median(l_quantity), 6)                  AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Second-moment and bivariate aggregates (stddev/variance/"
    "covariance/correlation/median) per group — one shuffle, all "
    "mergeable map-side (Welford-style partial states). Exact median "
    "is the oracle-testable form; approx_percentile(0.5) is the "
    "documented 100 TB swap (t-digest, mergeable).",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qd"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ntile — equi-depth bucketing (quartile summaries per key)
# ---------------------------------------------------------------------------


@register(
    "ntile_value_quartiles",
    """
    WITH q AS (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS quartile
        FROM events
    )
    SELECT event_type, quartile, count(*) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi,
           round(avg(value), 6) AS mean
    FROM q GROUP BY event_type, quartile
    ORDER BY event_type, quartile
    """,
    doc="ntile(4) equi-depth buckets per key + per-bucket summary. "
    "Deterministic via unique (value, event_id) ordering. Partitioned "
    "window → one hash exchange; no global sort.",
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
        .orderBy("event_type", "quartile")
    )


# ---------------------------------------------------------------------------
# Time-range window frame (RANGE BETWEEN interval) — rolling 1 h sum
# ---------------------------------------------------------------------------


@register(
    "range_frame_rolling_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4)
           AS rolling_1h
    FROM events
    """,
    doc="Event-time RANGE frame: per-user rolling 1-hour sum (frame "
    "bound in microseconds on the event-time axis, not a row count — "
    "row frames are wrong under irregular event spacing). Range frames "
    "include ORDER BY peers, so no tie-break column is needed for "
    "determinism. Keyed window → one hash exchange by user_id.",
)
def range_frame_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("rolling_1h"),
    )


# ---------------------------------------------------------------------------
# explode / unnest — corpus-wide term frequencies
# ---------------------------------------------------------------------------


@register(
    "explode_top_terms",
    """
    SELECT term, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 50
    """,
    doc="Generator/flatten coverage: explode(split(text)) → grouped "
    "count → top-50. The explode is pipelined into the partial "
    "aggregate (no materialized token table); top-k is "
    "TakeOrderedAndProject. Term-frequency skew is absorbed by "
    "map-side combine — hot terms pre-reduce per partition.",
)
def explode_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg)
# ---------------------------------------------------------------------------


@register(
    "string_agg_statuses",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           count(DISTINCT o_orderstatus) AS n_status
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Deterministic listagg: collect_set → array_sort → array_join "
    "(sorted DISTINCT contributions make the string order-insensitive "
    "to partition arrival order — unordered listagg is nondeterministic "
    "on any parallel engine). State is bounded by distinct-value "
    "cardinality, not row count.",
)
def string_agg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
                "statuses"
            ),
            F.count_distinct(F.col("o_orderstatus")).alias("n_status"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# first_value / last_value / nth_value over a full-partition frame
# ---------------------------------------------------------------------------


@register(
    "window_first_last_nth",
    """
    SELECT DISTINCT user_id,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    doc="Frame-navigation functions (first/last/nth over the whole "
    "partition) — per-user first, latest, and second event value in "
    "one keyed window pass + DISTINCT. Unique (ts, event_id) ordering "
    "makes all three deterministic; last_value needs the explicit "
    "UNBOUNDED FOLLOWING frame (default frame stops at CURRENT ROW).",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(w).alias("last_v"),
            F.nth_value("value", 2).over(w).alias("second_v"),
        )
        .distinct()
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Conditional distinct counting
# ---------------------------------------------------------------------------


@register(
    "conditional_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS all_users,
           count(DISTINCT CASE WHEN value > 500 THEN user_id END) AS hi_users,
           count(CASE WHEN value > 500 THEN 1 END) AS hi_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Multiple distinct aggregates with predicates in one grouped "
    "pass (CASE-gated distinct — NULLs drop out of COUNT). Catalyst "
    "plans multi-distinct via Expand; the 100 TB swap is "
    "approx_count_distinct per predicate (single-pass HLL++, no "
    "Expand blow-up), registered separately as approx_distinct_parts.",
)
def conditional_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hi = F.when(F.col("value") > 500, F.col("user_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).alias("all_users"),
            F.count_distinct(hi).alias("hi_users"),
            F.count(F.when(F.col("value") > 500, F.lit(1))).alias("hi_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Gap filling — densify an hourly series and forward-fill (time-series
# repair every candle pipeline needs before window math)
# ---------------------------------------------------------------------------


@register(
    "gap_fill_forward",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    spine AS (
        SELECT symbol,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT symbol, min(bucket) AS mn, max(bucket) AS mx
              FROM candles GROUP BY symbol)
    )
    SELECT s.symbol, s.bucket,
           c."close"           AS close,
           last_value(c."close" IGNORE NULLS)
               OVER (PARTITION BY s.symbol ORDER BY s.bucket) AS filled_close,
           c."close" IS NULL   AS is_gap
    FROM spine s LEFT JOIN candles c
      ON s.symbol = c.symbol AND s.bucket = c.bucket
    ORDER BY s.symbol, s.bucket
    """,
    doc="Densify + forward-fill: per-symbol hourly spine (sequence → "
    "explode, bounded by that symbol's own min/max), left join the "
    "observed candles, carry the last observed close across gaps "
    "(last IGNORE NULLS over an ordered keyed window). The spine "
    "explode is narrow (rows ∝ hours, not data) and the fill is one "
    "keyed window pass — no driver loop, no UDF; ~7% of fixture hours "
    "are genuine gaps.",
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _candles(spark, sf_dir).select("symbol", "bucket", "close")
    spine = (
        candles.groupBy("symbol")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "symbol",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(candles, ["symbol", "bucket"], "left")
        .select(
            "symbol",
            "bucket",
            "close",
            F.last("close", ignorenulls=True).over(w).alias("filled_close"),
            F.col("close").isNull().alias("is_gap"),
        )
        .orderBy("symbol", "bucket")
    )


# ---------------------------------------------------------------------------
# Rolling cross-series correlation (pairs analytics on aligned series)
# ---------------------------------------------------------------------------


@register(
    "rolling_corr_pairs",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    a AS (SELECT bucket, "close" AS ca FROM candles WHERE symbol = 'click'),
    b AS (SELECT bucket, "close" AS cb FROM candles WHERE symbol = 'view')
    SELECT a.bucket, round(ca, 6) AS ca, round(cb, 6) AS cb,
           round(corr(ca, cb) OVER (ORDER BY a.bucket
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 6) AS corr_24h
    FROM a JOIN b ON a.bucket = b.bucket
    ORDER BY a.bucket
    """,
    doc="Rolling 24-bucket correlation between two aligned series "
    "(pairs-trading shape): filter → equi-join on the time bucket → "
    "aggregate-as-window over a row frame. The two filtered series are "
    "candle-sized (hours × 1 symbol) so the alignment join broadcasts; "
    "the window is single-partition ONLY because the pair is one "
    "series — per-pair parallelism returns via partitionBy(pair_id) "
    "when scanning many pairs.",
)
def rolling_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _candles(spark, sf_dir).select("symbol", "bucket", "close")
    a = candles.filter(F.col("symbol") == "click").select(
        "bucket", F.col("close").alias("ca")
    )
    b = candles.filter(F.col("symbol") == "view").select(
        "bucket", F.col("close").alias("cb")
    )
    w = Window.orderBy("bucket").rowsBetween(-23, 0)
    return (
        a.join(F.broadcast(b), "bucket")
        .select(
            "bucket",
            F.round("ca", 6).alias("ca"),
            F.round("cb", 6).alias("cb"),
            F.round(F.corr("ca", "cb").over(w), 6).alias("corr_24h"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Snapshot diff — reconcile two versions of a keyed table
# ---------------------------------------------------------------------------


@register(
    "snapshot_diff_orders",
    """
    WITH old_v AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    ),
    new_v AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT'
                     AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
                    THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
                THEN 'changed' END AS change
    FROM old_v o FULL OUTER JOIN new_v n ON o.o_orderkey = n.o_orderkey
    WHERE (o.o_orderkey IS NULL) OR (n.o_orderkey IS NULL)
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
    ORDER BY o_orderkey
    """,
    doc="Snapshot reconciliation (operators/diff.py::table_diff): two "
    "simulated versions of the orders table — the re-crawl window "
    "shifted forward and urgent pre-cutoff rows repriced — diffed into "
    "added/removed/changed by one full outer join on the key with "
    "null-safe column comparison. Audits the idempotent-re-run pattern "
    "the reference trusts blindly (batch_processor.py:142-148).",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-07-01 00:00:00").cast("timestamp")
    start = F.lit("1996-07-01 00:00:00").cast("timestamp")
    old_v = o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new_v = o.filter(F.col("o_orderdate") >= start).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") < cutoff),
            F.col("o_totalprice") + 10.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return table_diff(old_v, new_v, ["o_orderkey"]).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Funnel: time from each view to the user's next purchase
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_purchase",
    """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_purchase
        FROM events
    )
    SELECT user_id,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
           count(CASE WHEN event_type = 'view'
                       AND next_purchase IS NOT NULL THEN 1 END) AS n_converted,
           CAST(sum(CASE WHEN event_type = 'view'
                         THEN epoch_us(next_purchase) - epoch_us(ts) END)
                AS BIGINT) AS total_wait_us
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
    doc="Funnel step timing: for every view, the user's next purchase "
    "via a forward-looking keyed window (min-over-following — one "
    "window pass, NO view×purchase range self-join), then per-user "
    "conversion counts and total integer-microsecond wait (exact "
    "integer sums — no float accumulation in the contract). Scales as "
    "one hash exchange by user_id.",
)
def funnel_time_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w)
    is_view = F.col("event_type") == "view"
    seq = ev.withColumn("next_purchase", nxt)
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.when(is_view, F.lit(1))).alias("n_views"),
            F.count(
                F.when(is_view & F.col("next_purchase").isNotNull(), F.lit(1))
            ).alias("n_converted"),
            F.sum(
                F.when(
                    is_view,
                    epoch_micros("next_purchase") - epoch_micros("ts"),
                )
            ).alias("total_wait_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Cohort retention: first-seen week × activity week
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT cohort_week, active_week, count(*) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY cohort_week, active_week
    ORDER BY cohort_week, active_week
    """,
    doc="Cohort retention matrix: users bucketed by first-seen ISO week, "
    "counted per week they return. Single pass over events: one "
    "groupBy(user) collects the deduped week set (collect_set partial-"
    "aggregates map-side, so the shuffle carries per-user week sets, "
    "not raw events), cohort = array_min of the same set — no join, no "
    "second scan; then one tiny reshuffle to (cohort, week) cells.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # to_date: DuckDB's date_trunc('week') yields DATE, Spark's a
    # midnight TIMESTAMP — align the contract type
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(week).alias("__weeks")
    )
    return (
        per_user.select(
            F.array_min("__weeks").alias("cohort_week"),
            F.explode("__weeks").alias("active_week"),
        )
        .groupBy("cohort_week", "active_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "active_week")
    )


# ---------------------------------------------------------------------------
# Unpivot (wide → long) — melt OHLC columns into (metric, value) rows
# ---------------------------------------------------------------------------


@register(
    "unpivot_ohlc",
    """
    WITH candles AS (
        SELECT event_type                AS symbol,
               date_trunc('hour', ts)    AS bucket,
               arg_min(value, ts)        AS o,
               max(value)                AS h,
               min(value)                AS l,
               arg_max(value, ts)        AS c
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT symbol, bucket, metric, round(val, 6) AS val
    FROM (
        SELECT symbol, bucket, 'o' AS metric, o AS val FROM candles
        UNION ALL SELECT symbol, bucket, 'h', h FROM candles
        UNION ALL SELECT symbol, bucket, 'l', l FROM candles
        UNION ALL SELECT symbol, bucket, 'c', c FROM candles
    )
    ORDER BY symbol, bucket, metric
    """,
    doc="Unpivot/melt: hourly OHLC candles widened by the aggregate, "
    "then unpivoted to (symbol, bucket, metric, val) long form — the "
    "shape chart/metric stores ingest. Spark `unpivot` is a zero-"
    "shuffle Expand (4× row multiplier on already-aggregated data); "
    "the oracle spells it as UNION ALL, the portable equivalent.",
)
def unpivot_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    candles = ev.groupBy(
        F.col("event_type").alias("symbol"),
        trunc_wallclock("hour", F.col("ts")).alias("bucket"),
    ).agg(
        F.min_by("value", "ts").alias("o"),
        F.max("value").alias("h"),
        F.min("value").alias("l"),
        F.max_by("value", "ts").alias("c"),
    )
    return (
        candles.unpivot(
            ["symbol", "bucket"], ["o", "h", "l", "c"], "metric", "val"
        )
        .withColumn("val", F.round(F.col("val"), 6))
        .orderBy("symbol", "bucket", "metric")
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)

_PROFILE_ORACLE = (
    "WITH a AS (SELECT count(*) AS n_rows, "
    + ", ".join(
        f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}"
        for c in _PROFILE_COLS
    )
    + " FROM orders) SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_non_null, "
        f"nd_{c} AS n_distinct FROM a"
        for c in _PROFILE_COLS
    )
    + ") ORDER BY column_name"
)


@register(
    "profile_orders",
    _PROFILE_ORACLE,
    doc="Dataset-card column profiling: per-column row/non-null/distinct "
    "counts of the orders table in ONE pass (multi-distinct via Catalyst "
    "Expand, then stack() to long format). At 100 TB swap countDistinct "
    "for approx_count_distinct to avoid the 6x Expand shuffle — same "
    "query shape, sketch-mergeable.",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    stack = "stack({n}, {args}) as (column_name, n_non_null, n_distinct)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS),
    )
    return (
        one.select(F.col("n_rows"), F.expr(stack))
        .select("column_name", "n_rows", "n_non_null", "n_distinct")
        .orderBy("column_name")
    )


@register(
    "percent_rank_cume_dist",
    """
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_orderkey LIMIT 5000
    """,
    doc="Relative-standing window functions: percent_rank + cume_dist "
    "per priority class, deterministic via the unique (totalprice, "
    "orderkey) ordering. One hash exchange on the partition key; both "
    "ranks computed in the same Window node (shared sort).",
)
def percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
        .limit(5000)
    )


# ---------------------------------------------------------------------------
# PII scrubbing + incremental aggregate maintenance (round-4 additions)
# ---------------------------------------------------------------------------


@register(
    "pii_scrub",
    """
    WITH t AS (
      SELECT c_custkey,
             c_name || ' call ' ||
             printf('%02d-%03d-%03d-%04d', c_nationkey % 100, c_custkey % 1000,
                    (c_custkey * 7) % 1000, (c_custkey * 13) % 10000) ||
             ' or mail user' || c_custkey || '@example.com' AS contact
      FROM customer)
    SELECT c_custkey,
           len(regexp_extract_all(contact,
               '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
           len(regexp_extract_all(contact,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
           regexp_replace(regexp_replace(contact,
               '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g')
           AS redacted
    FROM t ORDER BY c_custkey
    """,
    doc="PII scrubbing before a text field enters a training corpus: "
    "phone and email matches in a customer contact blob are counted "
    "and masked ([PHONE]/[EMAIL]). The fixture's trimmed customer "
    "table has no contact columns, so a deterministic key-derived blob "
    "is built identically on both engines — the verified behavior is "
    "the match/replace equivalence. Narrow per-row regexp map inside "
    "codegen — no shuffle, no UDF; extend operators/text.py::"
    "redact_pii patterns (or swap in an NER pandas-UDF) for richer "
    "PII classes.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import redact_pii

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" call "),
            F.format_string(
                "%02d-%03d-%03d-%04d",
                F.col("c_nationkey") % 100,
                F.col("c_custkey") % 1000,
                (F.col("c_custkey") * 7) % 1000,
                (F.col("c_custkey") * 13) % 10000,
            ),
            F.lit(" or mail user"),
            F.col("c_custkey").cast("string"),
            F.lit("@example.com"),
        ).alias("contact"),
    )
    # no final orderBy: the driver's value compare is order-insensitive
    # and a global sort of every customer row is a pure range-exchange
    # tax at scale (oracle keeps ORDER BY for readable diffs only)
    return redact_pii(cust, "contact").select(
        "c_custkey", "n_phone", "n_email", "redacted"
    )


@register(
    "incremental_agg_merge",
    """
    SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS n, round(sum(value), 4) AS total,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY event_type, CAST(ts AS DATE)
    ORDER BY event_type, day
    """,
    doc="Incremental materialized-aggregate maintenance: per-(type, "
    "day) count/sum/min/max partial states computed separately for the "
    "history (ts < cutoff) and the new delta (ts >= cutoff), then "
    "merged by a second-level aggregate — byte-identical to the full "
    "recompute the oracle runs. At 100 TB each refresh shuffles only "
    "the delta partials plus the |keys|-sized state, never the "
    "history; with the state table bucketed by key the merge is "
    "exchange-free. The batch analogue of the reference's hourly "
    "high-watermark update cycle (hourly_updater.py:58-106).",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import merge_states, partial_state

    ev = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    aggs = {
        "n": ("count", "*"),
        "total": ("sum", "value"),
        "vmin": ("min", "value"),
        "vmax": ("max", "value"),
    }
    keys = ["event_type", "day"]
    state = partial_state(ev.filter(F.col("ts") < cutoff), keys, aggs)
    delta = partial_state(ev.filter(F.col("ts") >= cutoff), keys, aggs)
    return (
        merge_states([state, delta], keys, aggs)
        .withColumn("total", F.round("total", 4))
        .orderBy("event_type", "day")
    )


@register(
    "validate_orders",
    """
    WITH a AS (
      SELECT count(CASE WHEN o_orderkey IS NULL THEN 1 END)      AS r0,
             count(o_orderkey) - count(DISTINCT o_orderkey)      AS r1,
             count(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         AND o_orderstatus IS NOT NULL THEN 1 END) AS r2,
             count(CASE WHEN o_totalprice <= 0
                          OR o_totalprice > 1000000 THEN 1 END)  AS r3,
             count(CASE WHEN o_orderpriority NOT SIMILAR TO '[1-5]-[A-Z]+'
                         AND o_orderpriority IS NOT NULL THEN 1 END) AS r4
      FROM orders)
    SELECT rule, n_violations FROM a UNPIVOT (
      n_violations FOR rule IN (
        r0 AS 'not_null:o_orderkey',
        r1 AS 'unique:o_orderkey',
        r2 AS 'accepted_values:o_orderstatus',
        r3 AS 'in_range:o_totalprice',
        r4 AS 'matches:o_orderpriority'))
    ORDER BY rule
    """,
    doc="Declarative data-quality expectations over orders (operators/"
    "expectations.py): not-null + uniqueness on the key, accepted "
    "status values, price range, priority format — ALL rules evaluated "
    "in one scan (one partial-agg reduce to a single row, unpivoted to "
    "(rule, n_violations)); a pipeline gates on max(n_violations)=0. "
    "The anti-pattern this replaces is N separate test queries = N "
    "scans of a 100 TB table.",
)
def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import expectations as X

    orders = load(spark, sf_dir, "orders")
    rules = [
        X.not_null("o_orderkey"),
        X.unique("o_orderkey"),
        X.accepted_values("o_orderstatus", ["O", "F", "P"]),
        X.in_range("o_totalprice", 0.000001, 1_000_000),
        X.matches("o_orderpriority", "^[1-5]-[A-Z]+$"),
    ]
    return X.check(orders, rules)


# ---------------------------------------------------------------------------
# Salted join — hot-key-safe revenue per market segment
# ---------------------------------------------------------------------------


@register(
    "salted_join_segment_revenue",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)      AS n_orders,
           round(sum(o_totalprice), 2)   AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Orders x customer revenue per market segment executed through "
    "the SALTED join path (operators/skew.py:salted_join): the fact "
    "side's key is scattered over 8 salt sub-keys and the dimension "
    "replicated x8, so a hot customer lands in 8 reducers instead of "
    "one. The oracle is the PLAIN equi-join — the hash gate verifies "
    "that salting is result-identical. At 100 TB this is the plan-"
    "level fallback when one key dominates and AQE's skew splitting "
    "cannot apply (broadcast disabled by dimension size).",
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    orders = load(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(orders, cust, "c_custkey", n_salt=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Strict-sequence funnel — MATCH_RECOGNIZE-style adjacency pattern
# ---------------------------------------------------------------------------


@register(
    "funnel_strict_sequence",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt1,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt2
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           min(ts)                  AS first_match_ts
    FROM seq
    WHERE event_type = 'view' AND nxt1 = 'click' AND nxt2 = 'purchase'
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Strict-adjacency sequence pattern (MATCH_RECOGNIZE "
    "view->click->purchase with no intervening event): lead(1)/lead(2) "
    "over the per-user ordered stream, filter, count per user. "
    "Complements funnel_time_to_purchase (eventual conversion) with "
    "the CONTIGUOUS-pattern semantics streaming CEP engines sell. One "
    "exchange by user_id; both leads share a single window sort.",
)
def funnel_strict_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("nxt1") == "click")
            & (F.col("nxt2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("ts").alias("first_match_ts"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered join — explicit runtime-filter shuffle reduction
# ---------------------------------------------------------------------------


@register(
    "bloom_prefilter_urgent_revenue",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Revenue of line items on URGENT orders, with the fact side "
    "pre-filtered through a broadcast collapsed-key digest of the "
    "surviving order keys (operators/bloomfilter.py — a k=1 Bloom "
    "filter realized as a broadcast semi-join on hash buckets) BEFORE "
    "the equi-join: only fact rows that might match ever shuffle. The "
    "oracle is the plain join — collisions are removed by the real "
    "join, so the hash gate proves the prefilter is result-neutral. "
    "The explicit form of Catalyst's runtime bloom filter, for when "
    "the selective set is another operator's output and the cost "
    "model won't fire.",
)
def bloom_prefilter_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloomfilter import hashset_prefilter

    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem")
    pre = hashset_prefilter(li, urgent, "l_orderkey", "o_orderkey")
    return (
        pre.join(urgent, pre["l_orderkey"] == urgent["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "gap_fill_interpolate",
    f"""
    WITH candles AS ({_CANDLES_SQL}),
    spine AS (
        SELECT symbol,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT symbol, min(bucket) AS mn, max(bucket) AS mx
              FROM candles GROUP BY symbol)
    ),
    filled AS (
        SELECT s.symbol, s.bucket, c."close" AS close,
               last_value(c."close" IGNORE NULLS) OVER wprev  AS pv,
               last_value(CASE WHEN c."close" IS NOT NULL THEN s.bucket END
                          IGNORE NULLS) OVER wprev            AS pt,
               first_value(c."close" IGNORE NULLS) OVER wnext AS nv,
               first_value(CASE WHEN c."close" IS NOT NULL THEN s.bucket END
                           IGNORE NULLS) OVER wnext           AS nt
        FROM spine s LEFT JOIN candles c
          ON s.symbol = c.symbol AND s.bucket = c.bucket
        WINDOW
          wprev AS (PARTITION BY s.symbol ORDER BY s.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wnext AS (PARTITION BY s.symbol ORDER BY s.bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT symbol, bucket, close,
           round(CASE WHEN close IS NOT NULL THEN close
                 ELSE pv + (nv - pv) * date_diff('hour', pt, bucket)
                           / date_diff('hour', pt, nt) END, 6) AS interp_close,
           close IS NULL AS is_gap
    FROM filled ORDER BY symbol, bucket
    """,
    doc="Densify + LINEAR interpolation (the ffill twin of "
    "gap_fill_forward): interior gaps get "
    "prev + (next−prev)·Δt/Δtotal from the bracketing observations — "
    "the time-series resampling a model-input pipeline uses when "
    "carry-forward would bias a trend. Two keyed window passes "
    "(preceding last / following first, both IGNORE NULLS) over the "
    "hourly spine; no UDF, no driver loop.",
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _candles(spark, sf_dir).select("symbol", "bucket", "close")
    spine = (
        candles.groupBy("symbol")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "symbol",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias(
                "bucket"
            ),
        )
    )
    wprev = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("close").isNotNull(), F.col("bucket"))
    joined = spine.join(candles, ["symbol", "bucket"], "left").select(
        "symbol",
        "bucket",
        "close",
        F.last("close", ignorenulls=True).over(wprev).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(wprev).alias("pt"),
        F.first("close", ignorenulls=True).over(wnext).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(wnext).alias("nt"),
    )
    dh = lambda a, b: F.timestamp_diff("HOUR", F.col(a), F.col(b))  # noqa: E731
    interp = F.when(F.col("close").isNotNull(), F.col("close")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv")) * dh("pt", "bucket") / dh("pt", "nt")
    )
    return joined.select(
        "symbol",
        "bucket",
        "close",
        F.round(interp, 6).alias("interp_close"),
        F.col("close").isNull().alias("is_gap"),
    ).orderBy("symbol", "bucket")


# ---------------------------------------------------------------------------
# Time-decay feature engineering, sequence mining, sketch certificates
# ---------------------------------------------------------------------------


@register(
    "decay_weighted_user_value",
    """
    WITH ref AS (SELECT max(epoch_us(ts)) AS t_max FROM events)
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value * pow(0.5,
                 (ref.t_max - epoch_us(ts)) / 86400.0e6)), 6) AS decayed_value
    FROM events CROSS JOIN ref
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Half-life-decayed engagement feature per user: "
    "Σ value·0.5^(Δt/24h) referenced to the corpus max event time — "
    "the standard recency-weighted feature for ranking/churn models "
    "(each event's weight halves per day of age). One 1-row max-ts "
    "aggregate broadcast back, then a single grouped aggregate; the "
    "decay arithmetic is pure codegen.",
)
def decay_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ref = ev.agg(F.max(epoch_micros(F.col("ts"))).alias("t_max"))
    w = F.pow(
        F.lit(0.5), (F.col("t_max") - epoch_micros(F.col("ts"))) / 86400.0e6
    )
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * w), 6).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "event_trigrams_top",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           count(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, trigram
    LIMIT 20
    """,
    doc="Behavioral sequence mining: top-20 event-type trigrams over "
    "per-user time-ordered streams — the n-gram view of user journeys "
    "that feeds funnel hypotheses and next-action models. ONE keyed "
    "window sort produces both lookahead columns (lead 1/2 share the "
    "frame), then a vocabulary-bounded count and a heap top-k; the "
    "deterministic (ts, event_id) sort key makes the sequence — and "
    "the hash — engine-stable.",
)
def event_trigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(20)
    )


_GK_QS = [0.25, 0.5, 0.75, 0.9]
_GK_ACC = 1000


@register(
    "approx_quantile_certificate",
    "SELECT CAST(q AS DOUBLE) AS q, within_bound FROM (VALUES "
    + ", ".join(f"({q}, TRUE)" for q in _GK_QS)
    + ") AS t(q, within_bound) ORDER BY q",
    doc="Driver-checkable certificate for the Greenwald-Khanna "
    "approximate-percentile sketch: percentile_approx guarantees rank "
    "error ≤ n/accuracy, so for each quantile the query computes the "
    "TRUE rank of the approximate answer (one conditional count) and "
    "asserts |rank − q·n| within bound — the oracle is the constant "
    "TRUE table, so any sketch regression flips the hash. Converts an "
    "inherently engine-specific approximate answer into an "
    "oracle-gated correctness row (approx_value_percentiles stays the "
    "raw rows-only form).",
)
def approx_quantile_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    approx = ev.agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(q) for q in _GK_QS]), F.lit(_GK_ACC)
        ).alias("aq"),
        F.count(F.lit(1)).alias("n"),
    )
    qs = F.array(*[F.lit(q) for q in _GK_QS])
    pairs = approx.select(
        F.explode(F.arrays_zip(qs.alias("q"), F.col("aq").alias("v"))).alias("z"),
        "n",
    ).select(
        F.col("z.q").alias("q"), F.col("z.v").alias("v"), "n"
    )
    ranked = (
        ev.crossJoin(F.broadcast(pairs))
        .groupBy("q", "n")
        .agg(
            F.sum(F.when(F.col("value") <= F.col("v"), 1).otherwise(0)).alias(
                "rank_"
            )
        )
    )
    # GK rank guarantee is n/accuracy; +1 absorbs the floor/ceil of the
    # target rank itself
    bound = F.col("n") / _GK_ACC + 1
    return ranked.select(
        "q",
        (F.abs(F.col("rank_") - F.col("q") * F.col("n")) <= bound).alias(
            "within_bound"
        ),
    ).orderBy("q")


@register(
    "approx_distinct_certificate",
    """
    SELECT l_returnflag, TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Driver-checkable certificate for the HyperLogLog++ distinct "
    "sketch: per return-flag group, approx_count_distinct(l_partkey) "
    "must land within 3·rsd (default rsd 0.05 → 15%, +2 absolute "
    "slack for tiny groups) of the exact distinct count computed in "
    "the same pass. The oracle is the constant TRUE table over the "
    "group keys, so an estimator regression flips the hash "
    "(approx_distinct_parts stays the raw rows-only form).",
)
def approx_distinct_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    )
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("a") - F.col("e")) <= 0.15 * F.col("e") + 2
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


@register(
    "cms_error_certificate",
    """
    SELECT event_type, TRUE AS no_undercount, TRUE AS within_eps
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Driver-checkable certificate for the count-min sketch "
    "(operators/sketch.py, w=256 d=4): per event_type, the estimate "
    "must (a) never undercount — CMS's one-sided-error guarantee is "
    "deterministic, not probabilistic — and (b) stay within e/w·N of "
    "the exact count (the ε bound; deterministic here because the "
    "fixture and hash family are fixed). Oracle = constant TRUE table "
    "over the keys; cms_event_type_counts stays the raw rows-only "
    "estimate.",
)
def cms_error_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math  # noqa: PLC0415

    from ..operators.sketch import cms_build, cms_estimate  # noqa: PLC0415

    ev = load(spark, sf_dir, "events").select("event_type")
    sketch = cms_build(ev, "event_type")
    est = cms_estimate(sketch, ev.distinct(), "event_type")
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    n_total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    eps = math.e / 256
    return (
        est.join(exact, "event_type")
        .crossJoin(F.broadcast(n_total))
        .select(
            "event_type",
            (F.col("est_count") >= F.col("exact_n")).alias("no_undercount"),
            (
                F.col("est_count") <= F.col("exact_n") + eps * F.col("n_total")
            ).alias("within_eps"),
        )
        .orderBy("event_type")
    )


@register(
    "rolling_7d_active_users",
    """
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    spine AS (SELECT DISTINCT day FROM user_days),
    contrib AS (
      SELECT ud.user_id, ud.day + CAST(i.i AS INTEGER) AS target_day
      FROM user_days ud,
           LATERAL (SELECT unnest(range(0, 7)) AS i) i),
    wau AS (
      SELECT target_day AS day, count(DISTINCT user_id) AS active_7d
      FROM contrib GROUP BY target_day),
    dau AS (
      SELECT day, count(DISTINCT user_id) AS active_1d
      FROM user_days GROUP BY day)
    SELECT s.day, d.active_1d, w.active_7d,
           round(CAST(d.active_1d AS DOUBLE) / w.active_7d, 6)
             AS stickiness
    FROM spine s JOIN dau d USING (day) JOIN wau w USING (day)
    ORDER BY s.day
    """,
    doc="DAU / trailing-7-day WAU / stickiness per calendar day — the "
    "product-analytics engagement staple. Exact sliding-window "
    "DISTINCT (which window functions can't express) via the "
    "contribution-explode trick: each (user, day) fans out to the 7 "
    "target days it keeps the user active for — a NARROW 7× map, no "
    "self-join — then one distinct-count per target day. At 100 TB "
    "the fanout is 7×|user-days|, bounded and shuffle-keyed by day; "
    "the usual approximate swap (HLL partials per day, merged across "
    "the window) is the documented >30-day variant.",
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date(trunc_wallclock("day", F.col("ts"))).alias("day")
    ).distinct()
    spine = user_days.select("day").distinct()
    contrib = user_days.crossJoin(
        F.broadcast(
            spark.range(0, 7).select(F.col("id").cast("int").alias("i"))
        )
    ).select("user_id", F.date_add(F.col("day"), F.col("i")).alias("target_day"))
    wau = contrib.groupBy(F.col("target_day").alias("day")).agg(
        F.countDistinct("user_id").alias("active_7d")
    )
    dau = user_days.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_1d")
    )
    return (
        spine.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "active_1d",
            "active_7d",
            F.round(
                F.col("active_1d").cast("double") / F.col("active_7d"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "new_vs_returning_daily",
    """
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    firsts AS (
      SELECT user_id, min(day) AS first_day FROM user_days GROUP BY user_id)
    SELECT ud.day,
           CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM user_days ud JOIN firsts f USING (user_id)
    GROUP BY ud.day
    ORDER BY ud.day
    """,
    doc="New vs returning users per day: each active (user, day) is "
    "classified against the user's first-seen day — the daily "
    "acquisition/retention split cohort_retention aggregates weekly. "
    "Corpus collapses to |user-days| rows, first-seen is one keyed "
    "aggregate joined back (broadcast at dim scale), one grouped "
    "count per day.",
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date(trunc_wallclock("day", F.col("ts"))).alias("day")
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        user_days.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).alias("returning_users"),
        )
        .orderBy("day")
    )


@register(
    "user_event_entropy",
    """
    WITH mix AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type),
    tot AS (
      SELECT user_id, sum(n) AS total FROM mix GROUP BY user_id)
    SELECT m.user_id,
           count(*) AS n_types,
           round(-sum((m.n * 1.0 / t.total)
                      * ln(m.n * 1.0 / t.total) / ln(2)), 6)
             AS entropy_bits
    FROM mix m JOIN tot t USING (user_id)
    GROUP BY m.user_id
    ORDER BY m.user_id
    """,
    doc="Behavioral diversity: Shannon entropy (bits) of each user's "
    "event-type mix — near zero for single-action automation, high "
    "for organic multi-action sessions; the companion signal to "
    "burstiness_fano_per_user. State is |user×type| then |users|, "
    "entropy arithmetic in codegen.",
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mix = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = mix.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n") * 1.0 / F.col("total")
    return (
        mix.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6).alias(
                "entropy_bits"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "dn_retention",
    """
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    firsts AS (
      SELECT user_id, min(day) AS cohort FROM user_days GROUP BY user_id),
    flags AS (
      SELECT f.cohort, f.user_id,
             max(CASE WHEN ud.day = f.cohort + 1 THEN 1 ELSE 0 END) AS d1,
             max(CASE WHEN ud.day = f.cohort + 3 THEN 1 ELSE 0 END) AS d3,
             max(CASE WHEN ud.day = f.cohort + 7 THEN 1 ELSE 0 END) AS d7
      FROM firsts f JOIN user_days ud USING (user_id)
      GROUP BY f.cohort, f.user_id)
    SELECT cohort,
           count(*) AS n_users,
           round(avg(CAST(d1 AS DOUBLE)), 6) AS d1_rate,
           round(avg(CAST(d3 AS DOUBLE)), 6) AS d3_rate,
           round(avg(CAST(d7 AS DOUBLE)), 6) AS d7_rate
    FROM flags
    GROUP BY cohort
    ORDER BY cohort
    """,
    doc="Classic D1/D3/D7 retention by daily signup cohort — the growth "
    "metric every product review leads with (cohort_retention is the "
    "weekly-matrix cousin). Corpus collapses to |user-days|, the "
    "offset checks are conditional maxes on the user's own day set "
    "(no calendar join), rates per cohort in one aggregate.",
)
def dn_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date(trunc_wallclock("day", F.col("ts"))).alias("day")
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort"))
    joined = firsts.join(user_days, "user_id")
    flag = lambda off: F.max(  # noqa: E731
        F.when(F.col("day") == F.date_add(F.col("cohort"), off), 1).otherwise(0)
    )
    flags = joined.groupBy("cohort", "user_id").agg(
        flag(1).alias("d1"), flag(3).alias("d3"), flag(7).alias("d7")
    )
    return (
        flags.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg(F.col("d1").cast("double")), 6).alias("d1_rate"),
            F.round(F.avg(F.col("d3").cast("double")), 6).alias("d3_rate"),
            F.round(F.avg(F.col("d7").cast("double")), 6).alias("d7_rate"),
        )
        .orderBy("cohort")
    )


@register(
    "ship_latency_percentiles",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             CAST(epoch(l.l_shipdate) - epoch(o.o_orderdate) AS DOUBLE)
               / 86400.0 AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(quantile_cont(days, 0.5), 6) AS p50_days,
           round(quantile_cont(days, 0.9), 6) AS p90_days,
           round(max(days), 6) AS max_days
    FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Order-to-ship latency distribution per priority class — the "
    "operations SLA view (does URGENT actually ship faster?). One "
    "fact-fact join keyed by orderkey (co-located under bucketing) "
    "feeding a per-class exact-percentile aggregate; "
    "approx_percentile is the documented 100 TB swap.",
)
def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lat = li.join(
        o.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        (
            (
                epoch_micros(F.col("l_shipdate"))
                - epoch_micros(F.col("o_orderdate"))
            )
            / 86400e6
        ).alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.expr("percentile(days, 0.5)"), 6).alias("p50_days"),
            F.round(F.expr("percentile(days, 0.9)"), 6).alias("p90_days"),
            F.round(F.max("days"), 6).alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "discount_band_analysis",
    """
    SELECT CAST(floor(l_discount * 100 / 2) * 2 AS BIGINT) AS discount_band_pct,
           count(*) AS n_items,
           round(avg(l_quantity), 6) AS avg_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(sum(l_extendedprice * l_discount), 2) AS discount_cost
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
    doc="Promo-effectiveness view: 2-percentage-point discount bands vs "
    "volume, realized revenue, and discount cost — the analysis behind "
    "TPC-H Q19's promo predicate, generalized to the full band "
    "spectrum. One scan, one small grouped aggregate.",
)
def discount_band_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    band = (F.floor(F.col("l_discount") * 100 / 2) * 2).cast("long")
    return (
        li.groupBy(band.alias("discount_band_pct"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("discount_cost"),
        )
        .orderBy("discount_band_pct")
    )


@register(
    "abc_analysis_parts",
    """
    WITH rev AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             sum(rev) OVER () AS total
      FROM rev),
    classed AS (
      SELECT CASE WHEN cum_rev / total <= 0.8 THEN 'A'
                  WHEN cum_rev / total <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class, rev
      FROM ranked)
    SELECT abc_class,
           count(*) AS n_parts,
           round(sum(rev), 2) AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    doc="ABC inventory classification: parts ranked by revenue, classed "
    "A/B/C at the 80/95% cumulative-share cuts — the Pareto "
    "prioritization every inventory/caching policy starts from. The "
    "corpus collapses to |parts| rows before the ranking window "
    "(deterministic (rev, partkey) tie-break); at 100 TB the global "
    "running share runs on the parts relation, never lineitem.",
)
def abc_analysis_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    ranked = rev.select(
        "rev",
        F.sum("rev").over(w).alias("cum_rev"),
        F.sum("rev").over(wall).alias("total"),
    )
    cls = (
        F.when(F.col("cum_rev") / F.col("total") <= 0.8, "A")
        .when(F.col("cum_rev") / F.col("total") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev"), 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "supplier_scorecard",
    """
    WITH perf AS (
      SELECT l.l_suppkey,
             l.l_extendedprice * (1 - l.l_discount) AS rev,
             l.l_partkey,
             CASE WHEN epoch(l.l_shipdate) - epoch(o.o_orderdate)
                       <= 60 * 86400 THEN 1 ELSE 0 END AS on_time
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT s.s_name,
           count(*) AS n_items,
           count(DISTINCT p.l_partkey) AS n_parts,
           round(sum(p.rev), 2) AS revenue,
           round(avg(CAST(p.on_time AS DOUBLE)), 6) AS on_time_60d_rate
    FROM perf p JOIN supplier s ON s.s_suppkey = p.l_suppkey
    GROUP BY s.s_name
    ORDER BY revenue DESC, s.s_name
    LIMIT 25
    """,
    doc="Vendor KPI scorecard: per supplier — shipped volume, part "
    "breadth, revenue, and a 60-day on-time rate — the procurement "
    "dashboard built from one orderkey-keyed fact join plus a "
    "broadcast supplier dim; top-25 by revenue with a name tie-break.",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    perf = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.when(
            epoch_micros(F.col("l_shipdate"))
            - epoch_micros(F.col("o_orderdate"))
            <= 60 * 86400e6,
            1,
        )
        .otherwise(0)
        .alias("on_time"),
    )
    return (
        perf.join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            perf["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.round(F.avg(F.col("on_time").cast("double")), 6).alias(
                "on_time_60d_rate"
            ),
        )
        .orderBy(F.desc("revenue"), "s_name")
        .limit(25)
    )


@register(
    "cross_region_trade_matrix",
    """
    SELECT cr.r_name AS cust_region, sr.r_name AS supp_region,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region cr  ON cr.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN region sr  ON sr.r_regionkey = sn.n_regionkey
    GROUP BY cr.r_name, sr.r_name
    ORDER BY cust_region, supp_region
    """,
    doc="Full customer-region × supplier-region trade matrix — the "
    "complete-matrix generalization of TPC-H Q5 (intra-region only) "
    "and Q7 (one nation pair): 7-way star join where every dimension "
    "side broadcasts and the fact pair shuffles once on orderkey; "
    "|regions|² output rows.",
)
def cross_region_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "supplier")
    cust_side = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.withColumnRenamed("r_name", "cust_region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "cust_region")
    )
    supp_side = (
        s.join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("sn_nationkey"),
                    F.col("n_regionkey").alias("sn_regionkey"),
                )
            ),
            s["s_nationkey"] == F.col("sn_nationkey"),
        )
        .join(
            F.broadcast(
                r.select(
                    F.col("r_regionkey").alias("sr_regionkey"),
                    F.col("r_name").alias("supp_region"),
                )
            ),
            F.col("sn_regionkey") == F.col("sr_regionkey"),
        )
        .select("s_suppkey", "supp_region")
    )
    return (
        li.join(
            o.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_side), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_side), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("cust_region", "supp_region")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("cust_region", "supp_region")
    )


@register(
    "returns_analysis",
    """
    SELECT o.o_orderpriority,
           CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           count(*) AS n_items,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           round(avg(CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 6)
             AS return_rate
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority, date_trunc('month', l.l_shipdate)
    HAVING count(*) >= 10
    ORDER BY o_orderpriority, ship_month
    """,
    doc="Return-rate KPI by priority × ship month (cells under 10 items "
    "suppressed as noise) — the quality-trend monitor on the returns "
    "flag TPC-H Q10 aggregates once. One fact join + grouped "
    "conditional aggregate.",
)
def returns_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(
            o.select("o_orderkey", "o_orderpriority"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderpriority",
            F.to_date(trunc_wallclock("month", F.col("l_shipdate"))).alias(
                "ship_month"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returned"),
            F.round(
                F.avg(
                    F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
                ),
                6,
            ).alias("return_rate"),
        )
        .filter(F.col("n_items") >= 10)
        .orderBy("o_orderpriority", "ship_month")
    )


@register(
    "price_realization_by_brand",
    """
    SELECT p.p_brand,
           count(*) AS n_items,
           round(avg(l.l_extendedprice / l.l_quantity
                     / p.p_retailprice), 6) AS realization_ratio,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="Price realization per brand: achieved unit price vs list "
    "(retail) price — the pricing-power KPI (ratio < 1 means selling "
    "below list). Broadcast part dim onto the fact scan, one grouped "
    "aggregate; |brands| output rows.",
)
def price_realization_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    ratio = (
        F.col("l_extendedprice") / F.col("l_quantity") / F.col("p_retailprice")
    )
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_retailprice")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg(ratio), 6).alias("realization_ratio"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "segment_nation_share",
    """
    WITH rev AS (
      SELECT c.c_mktsegment, n.n_name,
             sum(o.o_totalprice) AS seg_nation_rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY c.c_mktsegment, n.n_name)
    SELECT c_mktsegment, n_name,
           round(seg_nation_rev, 2) AS revenue,
           round(seg_nation_rev
                 / sum(seg_nation_rev) OVER (PARTITION BY c_mktsegment), 6)
             AS share_of_segment
    FROM rev
    ORDER BY c_mktsegment, n_name
    """,
    doc="Revenue share of each nation within each market segment — the "
    "ratio-to-report window shape (share of parent) over a "
    "|segments×nations| aggregate; dims broadcast, the share window "
    "runs on the tiny grouped relation.",
)
def segment_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment", "c_nationkey")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_mktsegment", "n_name")
        .agg(F.sum("o_totalprice").alias("seg_nation_rev"))
    )
    w = Window.partitionBy("c_mktsegment")
    return rev.select(
        "c_mktsegment",
        "n_name",
        F.round("seg_nation_rev", 2).alias("revenue"),
        F.round(
            F.col("seg_nation_rev") / F.sum("seg_nation_rev").over(w), 6
        ).alias("share_of_segment"),
    ).orderBy("c_mktsegment", "n_name")


@register(
    "customer_ltv_deciles",
    """
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS ltv, count(*) AS n_orders
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT ltv, n_orders,
             ntile(10) OVER (ORDER BY ltv DESC, o_custkey) AS decile
      FROM spend)
    SELECT decile,
           count(*) AS n_customers,
           round(sum(ltv), 2) AS decile_revenue,
           round(avg(ltv), 2) AS avg_ltv,
           round(avg(CAST(n_orders AS DOUBLE)), 6) AS avg_orders
    FROM ranked GROUP BY decile ORDER BY decile
    """,
    doc="Customer lifetime-value deciles: customers ranked by total "
    "spend into ntile(10) bands with per-decile revenue/LTV/order "
    "stats — the segmentation view behind revenue_concentration's "
    "single top-20% number. Corpus collapses to |customers| before "
    "the ranking window; deterministic (ltv, custkey) tie-break.",
)
def customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("ltv"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.desc("ltv"), "o_custkey")
    ranked = spend.select(
        "ltv", "n_orders", F.ntile(10).over(w).alias("decile")
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("ltv"), 2).alias("decile_revenue"),
            F.round(F.avg("ltv"), 2).alias("avg_ltv"),
            F.round(F.avg(F.col("n_orders").cast("double")), 6).alias(
                "avg_orders"
            ),
        )
        .orderBy("decile")
    )


@register(
    "acctbal_spend_corr",
    """
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS total_spend
      FROM orders GROUP BY o_custkey)
    SELECT count(*) AS n_customers,
           round(corr(c.c_acctbal, s.total_spend), 6) AS bal_spend_corr,
           round(avg(c.c_acctbal), 6) AS avg_acctbal,
           round(avg(s.total_spend), 2) AS avg_spend
    FROM customer c JOIN spend s ON s.o_custkey = c.c_custkey
    """,
    doc="Does account balance predict spend? One per-customer spend "
    "aggregate joined to the customer dim, Pearson correlation in a "
    "single-row reduce — the feature-screening correlation check "
    "before modeling (same family as capm_beta_alpha's cross-series "
    "form).",
)
def acctbal_spend_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total_spend")
    )
    return (
        c.join(spend, c["c_custkey"] == F.col("o_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.corr("c_acctbal", "total_spend"), 6).alias(
                "bal_spend_corr"
            ),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
            F.round(F.avg("total_spend"), 2).alias("avg_spend"),
        )
    )


@register(
    "supplier_skyline_2d",
    """
    WITH perf AS (
      SELECT s.s_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             round(avg(CASE WHEN epoch(l.l_shipdate) - epoch(o.o_orderdate)
                                 <= 60 * 86400 THEN 1.0 ELSE 0.0 END), 6)
               AS on_time_rate
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_name),
    scanned AS (
      SELECT s_name, revenue, on_time_rate,
             max(on_time_rate) OVER (ORDER BY revenue DESC, s_name
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS best_prev
      FROM perf)
    SELECT s_name, revenue, on_time_rate
    FROM scanned
    WHERE best_prev IS NULL OR on_time_rate > best_prev
    ORDER BY revenue DESC, s_name
    """,
    doc="2-D skyline (Pareto frontier) of suppliers on (revenue, "
    "on-time rate): a supplier survives iff no other strictly beats "
    "it on both axes — the multi-criteria shortlist query. The "
    "classic sort-scan skyline: order by the first axis, keep rows "
    "beating the running max of the second; the frontier decision "
    "runs on the |suppliers|-sized aggregate, one window sort, no "
    "pairwise self-join.",
)
def supplier_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    perf = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(
                F.avg(
                    F.when(
                        epoch_micros(F.col("l_shipdate"))
                        - epoch_micros(F.col("o_orderdate"))
                        <= 60 * 86400e6,
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("on_time_rate"),
        )
    )
    w_prev = (
        Window.orderBy(F.desc("revenue"), "s_name")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scanned = perf.withColumn(
        "best_prev", F.max("on_time_rate").over(w_prev)
    )
    return (
        scanned.filter(
            F.col("best_prev").isNull()
            | (F.col("on_time_rate") > F.col("best_prev"))
        )
        .select("s_name", "revenue", "on_time_rate")
        .orderBy(F.desc("revenue"), "s_name")
    )


@register(
    "priority_mix_over_time",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             o_orderpriority,
             count(*) AS n
      FROM orders GROUP BY 1, 2)
    SELECT month, o_orderpriority, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY month), 6)
             AS share_of_month
    FROM monthly
    ORDER BY month, o_orderpriority
    """,
    doc="Order-priority composition over time: each month's priority "
    "mix as share-of-month — the stacked-area composition-shift view "
    "(a drifting mix is an early operational signal). One grouped "
    "aggregate + a share window on the |months×priorities| relation.",
)
def priority_mix_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.to_date(trunc_wallclock("month", F.col("o_orderdate"))).alias(
            "month"
        ),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("month")
    return monthly.select(
        "month",
        "o_orderpriority",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias(
            "share_of_month"
        ),
    ).orderBy("month", "o_orderpriority")


_DDS_ALPHA = 0.02
# gamma = (1+a)/(1-a); literal so both engines share the exact double
_DDS_GAMMA = (1 + _DDS_ALPHA) / (1 - _DDS_ALPHA)
_DDS_QS = (0.5, 0.9, 0.99)


@register(
    "ddsketch_error_certificate",
    f"""
    WITH pos AS (SELECT value AS x FROM events WHERE value > 0),
    b AS (
      SELECT CAST(ceil(ln(x) / ln({_DDS_GAMMA!r})) AS BIGINT) AS bkt,
             count(*) AS n
      FROM pos GROUP BY 1
    ),
    c AS (
      SELECT bkt, n,
             sum(n) OVER (ORDER BY bkt) AS cum,
             sum(n) OVER () AS total
      FROM b
    ),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _DDS_QS)}]) AS q),
    est AS (
      SELECT qs.q,
             min(CASE WHEN c.cum > qs.q * (c.total - 1)
                      THEN 2 * pow({_DDS_GAMMA!r}, c.bkt)
                           / ({_DDS_GAMMA!r} + 1) END) AS est
      FROM qs CROSS JOIN c GROUP BY qs.q
    ),
    exact AS (
      SELECT CAST(0.5 AS DOUBLE) AS q, quantile_cont(x, 0.5) AS ex FROM pos
      UNION ALL SELECT 0.9, quantile_cont(x, 0.9) FROM pos
      UNION ALL SELECT 0.99, quantile_cont(x, 0.99) FROM pos
    )
    SELECT CAST(est.q AS DOUBLE) AS q,
           round(est.est, 6) AS sketch_estimate,
           round(exact.ex, 6) AS exact_quantile,
           round(abs(est.est - exact.ex) / exact.ex, 6) AS rel_err,
           CAST(abs(est.est - exact.ex) / exact.ex <= {_DDS_ALPHA} + 1e-12
                AS INTEGER) AS within_bound
    FROM est JOIN exact USING (q) ORDER BY est.q
    """,
    doc="DDSketch relative-error certificate (Masson et al. 2019), the "
    "batch twin of streaming/quantile_sink.py: log-bucket the positive "
    "values at gamma=(1+a)/(1-a), estimate q50/q90/q99 from the bucket "
    "midpoints via one cumulative scan, and certify |est-exact|/exact "
    "<= a IN THE RESULT against the exact continuous quantile — the "
    "sketch family's cms/hll certificate pattern. Exact quantile "
    "definitional note: Spark percentile == DuckDB quantile_cont "
    "(linear interpolation on (n-1)q rank). Bucket state is log-range "
    "bounded; nothing scales with row count after the grouped count.",
)
def ddsketch_error_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load(spark, sf_dir, "events").where(F.col("value") > 0)
    b = (
        ev.select(
            F.ceil(F.log("value") / math.log(_DDS_GAMMA)).cast("long").alias("bkt")
        )
        .groupBy("bkt")
        .agg(F.count("*").alias("n"))
    )
    wcum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = b.select(
        "bkt",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )
    qs = spark.createDataFrame([(q,) for q in _DDS_QS], "q double")
    est = (
        qs.crossJoin(c)
        .groupBy("q")
        .agg(
            F.min(
                F.when(
                    F.col("cum") > F.col("q") * (F.col("total") - 1),
                    2 * F.pow(F.lit(_DDS_GAMMA), F.col("bkt")) / (_DDS_GAMMA + 1),
                )
            ).alias("est")
        )
    )
    exacts = [
        ev.agg(F.expr(f"percentile(value, {q})").alias("ex")).select(
            F.lit(q).alias("q"), "ex"
        )
        for q in _DDS_QS
    ]
    exact = exacts[0]
    for e in exacts[1:]:
        exact = exact.unionByName(e)
    rel = F.abs(F.col("est") - F.col("ex")) / F.col("ex")
    return (
        est.join(exact, "q")
        .select(
            "q",
            F.round("est", 6).alias("sketch_estimate"),
            F.round("ex", 6).alias("exact_quantile"),
            F.round(rel, 6).alias("rel_err"),
            (rel <= _DDS_ALPHA + 1e-12).cast("int").alias("within_bound"),
        )
        .orderBy("q")
    )


@register(
    "dau_mau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    mau AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - INTERVAL 27 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, mau.mau,
           round(dau.dau * 1.0 / mau.mau, 6) AS stickiness
    FROM dau JOIN mau USING (day) ORDER BY day
    """,
    doc="DAU/MAU stickiness per day (the standard engagement ratio): "
    "daily actives over 28-day rolling distinct actives. Exact form: "
    "the (day, user) distinct table joined to the day spine within "
    "the window — |days| x |daily actives| work, never raw events. "
    "At 100 TB the rolling distinct switches to merged daily HLL "
    "registers (hll_set_op_certificate's union path) with identical "
    "query shape; this exact twin certifies that pipeline's numbers "
    "at fixture scale.",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    d, u = days.alias("d"), ud.alias("u")
    mau = (
        d.join(
            u,
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 27))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "dau_mau_stickiness_hll",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    mau AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - INTERVAL 27 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, mau.mau, TRUE AS within_bound
    FROM dau JOIN mau USING (day) ORDER BY day
    """,
    doc="DAU/MAU stickiness with the 28-day rolling distinct computed "
    "from MERGED DAILY HLL REGISTERS — the 100 TB path that "
    "dau_mau_stickiness's docstring promised in prose, now code (r8 "
    "verdict #5). Same register convention as the streaming HLL sink "
    "(streaming/hll_sink.py: P=8, xxhash64 bucket, rho = leading-zero "
    "rank, merge = per-register max, bias-corrected estimate with the "
    "linear-counting small-range branch — all JVM expressions, no "
    "collect): per-day registers are |days|x256 rows REGARDLESS of "
    "raw scale, the rolling merge joins the day spine to 28 days of "
    "registers (|days|x28x256 intermediate, data-independent), and "
    "each day's estimate is one grouped aggregate. within_bound pins "
    "|HLL - exact| <= 3*rsd*exact + 5 (rsd = 1.04/sqrt(256) = 6.5%) "
    "per day against the exact MAU computed alongside; the oracle is "
    "the exact query plus constant TRUE (certificate pattern, as "
    "hll_set_op_certificate). At 100 TB the exact-MAU branch drops "
    "and only the register path runs — daily registers are mergeable "
    "monoid state the streaming sink already maintains incrementally.",
)
def dau_mau_stickiness_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import hll_sink

    m = hll_sink.M
    alpha = 0.7213 / (1 + 1.079 / m)
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    # exact MAU (fixture-scale certificate branch; dropped at 100 TB)
    d, u = days.alias("d"), ud.alias("u")
    in_window = (F.col("u.day") >= F.date_sub(F.col("d.day"), 27)) & (
        F.col("u.day") <= F.col("d.day")
    )
    mau_exact = (
        d.join(u, in_window)
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("mau"))
    )
    # per-day HLL registers (hll_sink.batch_registers convention)
    h = F.xxhash64(F.col("user_id").cast("string"))
    idx = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, hll_sink.P)
    rho = F.when(w == 0, F.lit(64 - hll_sink.P + 1)).otherwise(
        F.lit(64 - hll_sink.P + 1) - F.length(F.bin(w))
    )
    regs = (
        ev.select(F.to_date("ts").alias("day"), idx.alias("idx"), rho.alias("rho"))
        .groupBy("day", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    r = regs.alias("r")
    merged = (
        d.join(
            r,
            (F.col("r.day") >= F.date_sub(F.col("d.day"), 27))
            & (F.col("r.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), "idx")
        .agg(F.max("rho").alias("rho"))
    )
    est = merged.groupBy("day").agg(
        F.count("*").alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
    )
    s = F.col("s_present") + (m - F.col("present"))
    raw_est = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("present")
    hll = est.select(
        "day",
        F.when((raw_est <= 2.5 * m) & (zeros > 0), m * F.log(m / zeros))
        .otherwise(raw_est)
        .alias("mau_hll"),
    )
    bound = 3 * (1.04 / (m ** 0.5))
    return (
        dau.join(mau_exact, "day")
        .join(hll, "day")
        .select(
            "day",
            "dau",
            "mau",
            (
                F.abs(F.col("mau_hll") - F.col("mau"))
                <= bound * F.col("mau") + 5
            ).alias("within_bound"),
        )
        .orderBy("day")
    )
