"""Queries over the custom Python DataSource (sources/ohlcv_source.py).

``rest_source_candles`` certifies the ENTIRE custom-source path — split
planning, executor-side page generation, schema, value production —
against a DuckDB replay of the same deterministic synthetic exchange:
the source's arithmetic is integer-cents math, so the oracle reproduces
every cell exactly and the driver hash-gates the source like any query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.ohlcv_source import DEFAULT_START_MS, HOUR_MS, register_sources
from .registry import register

_N = 240


@register(
    "rest_source_candles",
    f"""
    WITH syms AS (
      SELECT * FROM (VALUES (0, 'BTC_USDT'), (1, 'ETH_USDT'),
                            (2, 'SOL_USDT')) s(sym_idx, symbol)),
    idx AS (SELECT unnest(range(0, {_N})) AS i),
    cents AS (
      SELECT symbol,
             {DEFAULT_START_MS} + i * {HOUR_MS} AS ts,
             10000 + sym_idx * 1000 + (i * 37) % 500 AS open_c,
             10000 + sym_idx * 1000 + (i * 37 + 17) % 500 AS close_c,
             i
      FROM syms CROSS JOIN idx),
    c AS (
      SELECT symbol, ts,
             open_c / 100.0 AS open,
             (greatest(open_c, close_c) + i % 7) / 100.0 AS high,
             (least(open_c, close_c) - i % 5) / 100.0 AS low,
             close_c / 100.0 AS close,
             1.0 + (i % 100) / 10.0 AS volume
      FROM cents)
    SELECT symbol,
           count(*) AS n_candles,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           round(avg(close), 6) AS avg_close,
           round(max(high), 2) AS max_high,
           round(min(low), 2) AS min_low,
           round(sum(volume), 2) AS sum_volume
    FROM c GROUP BY symbol ORDER BY symbol
    """,
    doc="The custom Python DataSource (PySpark 4 DataSource API) "
    "hash-certified end-to-end: spark.read.format('ohlcv_rest') plans "
    "one input partition per (symbol, page) — the reference's "
    "driver-side ccxt pagination loop (historical_crawler.py:60-118) "
    "moved onto the executors — and generates a deterministic "
    "synthetic exchange in integer-cents arithmetic that the DuckDB "
    "oracle replays cell-for-cell. Certifies split planning, "
    "executor-side generation, schema mapping, and values; the "
    "streaming face of the same source (offset-ranged micro-batches) "
    "is exercised in tests/test_datasource.py.",
)
def rest_source_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sources(spark)
    df = spark.read.format("ohlcv_rest").option("n_candles", str(_N)).load()
    return (
        df.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_candles"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
            F.round(F.avg("close"), 6).alias("avg_close"),
            F.round(F.max("high"), 2).alias("max_high"),
            F.round(F.min("low"), 2).alias("min_low"),
            F.round(F.sum("volume"), 2).alias("sum_volume"),
        )
        .orderBy("symbol")
    )


# ---------------------------------------------------------------------------
# Modern Spark 4 SQL surface: VARIANT, LATERAL join, recursive CTE
# ---------------------------------------------------------------------------

from ..tables import load  # noqa: E402


@register(
    "variant_props_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
             AS distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured analytics via the VARIANT type (Spark 4): "
    "events.props parsed ONCE with parse_json into a binary variant, "
    "then typed variant_get extraction — the open-schema JSON path "
    "that replaces per-field from_json casts. At scale VARIANT beats "
    "repeated string JSON parsing because the parse cost is paid once "
    "per row, not once per extracted field, and the binary encoding "
    "pushes through shuffles unparsed. Oracle: DuckDB json_extract.",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


@register(
    "lateral_latest_order",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_orderdate, l.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC
                  LIMIT 1) l
    ORDER BY c.c_custkey
    """,
    doc="Correlated LATERAL subquery (Spark 4 SQL): each customer's "
    "latest order via a per-row dependent subquery — the SQL shape "
    "analysts write; Catalyst decorrelates it into a join + per-key "
    "top-1 rather than executing per-row (same physical work as the "
    "window form, different — and now supported — surface syntax). "
    "Deterministic (date, orderkey) tie-break.",
)
def lateral_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_orderdate, l.o_totalprice
        FROM __lat_customer c,
             LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice
                      FROM __lat_orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC
                      LIMIT 1) l
        ORDER BY c.c_custkey
        """
    )


@register(
    "recursive_reachability_signup",
    """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT e1.event_type AS src, e1.nxt AS dst
      FROM (SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events) e1
      WHERE e1.nxt IS NOT NULL AND e1.event_type <> e1.nxt),
    reach(node, hops) AS (
      SELECT 'signup', 0
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.hops < 2
    )
    SELECT node, min(hops) AS min_hops
    FROM reach GROUP BY node ORDER BY node
    """,
    doc="Recursive CTE (Spark 4 SQL, SPARK-24497): 2-hop reachability "
    "from 'signup' over the event-type transition graph — the SAME "
    "construct this repo previously reserved for DuckDB oracle "
    "replays, now executed natively by Spark on both sides of the "
    "gate. The edge derivation is one keyed window over events; the "
    "recursion iterates on the |event_types|²-bounded edge list, "
    "never the fact table. min(hops) collapses path multiplicity so "
    "the result is finite and engine-stable.",
)
def recursive_reachability_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("__rec_events")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT e1.event_type AS src, e1.nxt AS dst
          FROM (SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
                FROM __rec_events) e1
          WHERE e1.nxt IS NOT NULL AND e1.event_type <> e1.nxt),
        reach(node, hops) AS (
          SELECT 'signup', 0
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.hops < 2
        )
        SELECT node, min(hops) AS min_hops
        FROM reach GROUP BY node ORDER BY node
        """
    )


@register(
    "udtf_top_tokens",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 20),
    counts AS (
      SELECT doc_id, token, count(*) AS n FROM tok GROUP BY doc_id, token),
    ranked AS (
      SELECT doc_id, token, CAST(n AS INTEGER) AS n,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n DESC, token) AS INTEGER) AS rk
      FROM counts)
    SELECT doc_id, token, n, rk FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    doc="The UDTF extension surface certified end-to-end: "
    "operators/udtfs.py::TopTokens registered per-session and invoked "
    "as a LATERAL table function from SQL (the Spark-4 successor of "
    "Hive LATERAL VIEW + custom UDTF), hash-compared against a "
    "pure-SQL window replay. Scoped to a 20-doc slice because a UDTF "
    "is row-at-a-time Python — the documented cost ceiling of this "
    "extension point; corpus-scale token analytics stay on the "
    "codegen path (subword_top_tokens, tfidf_top_terms).",
)
def udtf_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.udtfs import register_udtfs  # noqa: PLC0415

    register_udtfs(spark)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.n, t.rk
        FROM __udtf_docs d, LATERAL top_tokens(d.text, 3) t
        ORDER BY d.doc_id, t.rk
        """
    )


@register(
    "matview_incremental_refresh",
    """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 6) AS total,
           max(value) AS vmax
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Continuous aggregate (operators/matview.py — TimescaleDB-style "
    "incremental materialized view) hash-certified: the MV is created "
    "from the first ~60% of events by time, then a refresh folds ONLY "
    "the rows above the stored high watermark into the |keys|-sized "
    "partial-aggregate state (count/sum/max monoids) and commits it as "
    "an atomic MVCC version. The oracle is the plain full aggregate — "
    "incremental refresh must be indistinguishable from recompute. At "
    "scale the refresh cost is O(delta): the watermark filter prunes "
    "history by partition/row-group stats, the state shuffle is "
    "|keys|-bounded. Crash-replay, no-op, and time-travel semantics "
    "are pinned in tests/test_matview.py.",
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..operators import matview  # noqa: PLC0415
    from ..timeutil import epoch_micros  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    cut = ev.agg(
        F.percentile_approx(epoch_micros(F.col("ts")), 0.6, 10000)
    ).collect()[0][0]
    early = ev.filter(epoch_micros(F.col("ts")) <= cut)
    d = os.path.join(
        tempfile.gettempdir(),
        "big_data_pr_spark_matview",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(d, ignore_errors=True)
    matview.create(
        early,
        d,
        ["event_type"],
        {"n": ("count", "*"), "total": ("sum", "value"), "vmax": ("max", "value")},
        "ts",
    )
    matview.refresh(spark, d, ev)
    state = matview.read(spark, d)
    return state.select(
        "event_type", "n", F.round("total", 6).alias("total"), "vmax"
    ).orderBy("event_type")


@register(
    "pipe_syntax_ship_stats",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4: FROM t |> WHERE ... |> AGGREGATE "
    "... GROUP BY — the Google 'SQL Has Problems' pipe dialect): the "
    "same filtered revenue rollup as ANSI GROUP BY, expressed as a "
    "linear dataflow. Surface-syntax parity item: Catalyst plans the "
    "pipe form into the IDENTICAL aggregate-after-pushed-filter "
    "physical plan, which is the point — the oracle is the ANSI "
    "equivalent and must hash-match.",
)
def pipe_syntax_ship_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__pipe_lineitem")
    return spark.sql(
        """
        FROM __pipe_lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                     round(avg(l_quantity), 6) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, revenue, avg_qty
        |> ORDER BY l_returnflag, l_linestatus
        """
    )
