"""Serving layer: the reference's five HTTP/ES query endpoints
(SURVEY.md §3.3, reference ``app.py``) re-expressed as Spark SQL/
DataFrame queries over the serving tables.

Each function takes the serving DataFrame(s) and returns a DataFrame —
runnable identically in batch tests and, registered as temp views, via
``spark.sql``. ES query-DSL constructs map to:

- ``term`` filter        → equality predicate (partition-prunable)
- ``range`` filter       → between predicate (parquet min/max pruning)
- ``sort`` + ``size``    → orderBy + limit (TakeOrderedAndProject)
- ``terms``/``multi_terms`` aggs → distinct projections
- get-by-id              → key equality + limit 1
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.windows import top1_per_key, topk


def encode_symbol(col: Column) -> Column:
    """F3: URL/key-safe symbol form ``/`` → ``-``
    (reference ``app.py:94``, ``stream_processor.py:134``)."""
    return F.replace(col, F.lit("/"), F.lit("-"))


def decode_symbol(col: Column) -> Column:
    """F3 inverse: ``-``/``_`` → ``/`` (reference ``app.py:111``)."""
    return F.replace(col, F.lit("-"), F.lit("/"))


def distinct_symbols(hist: DataFrame) -> DataFrame:
    """GET / dropdown: distinct symbols sorted (reference ``app.py:46-64``,
    ES terms agg size 500 — unbounded here; exact distinct scales as one
    partial-agg shuffle)."""
    return hist.select("symbol").distinct().orderBy("symbol")


def distinct_symbol_timeframes(hist: DataFrame) -> DataFrame:
    """GET /historical dropdown: distinct (symbol, timeframe) formatted
    ``{sym}_{tf}`` (reference ``app.py:66-83`` multi_terms agg)."""
    return (
        hist.select(
            F.concat_ws("_", F.col("symbol"), F.col("timeframe")).alias("symbol_tf")
        )
        .distinct()
        .orderBy("symbol_tf")
    )


def realtime_stats(latest: DataFrame, stats: DataFrame, symbol: str) -> DataFrame:
    """GET /api/realtime_stats/<sym> (reference ``app.py:92-107``): J1 —
    point lookup on the latest-candle snapshot broadcast-joined with the
    top-1-per-key window-stats row."""
    latest_row = latest.filter(F.col("symbol") == symbol)
    stats_row = top1_per_key(
        stats.filter(F.col("symbol") == symbol),
        ["symbol"],
        [F.desc("window_end")],
    )
    return latest_row.join(F.broadcast(stats_row), "symbol", "left")


def chart_data_1m(chart: DataFrame, symbol: str, now_ts: Column) -> DataFrame:
    """GET /api/chart_data_1m/<sym> (reference ``app.py:109-135``):
    term(symbol) + range(last 35 min) + sort asc + limit 200 →
    [event_timestamp, close] pairs."""
    return (
        chart.filter(
            (F.col("symbol") == symbol)
            & (F.col("event_timestamp") >= now_ts - F.expr("INTERVAL 35 MINUTES"))
            & (F.col("event_timestamp") <= now_ts)
        )
        .select("event_timestamp", "close")
        .orderBy("event_timestamp")
        .limit(200)
    )


def historical_data(
    hist: DataFrame, symbol: str, timeframe: str, range_days: int | None = None
) -> DataFrame:
    """GET /api/historical_data/<sym_tf> (reference ``app.py:153-193``):
    term(symbol) + term(timeframe) [+ range(ts ≥ now−Nd)] + sort asc +
    limit 10000 → labels/close/sma7/sma30."""
    out = hist.filter(
        (F.col("symbol") == symbol) & (F.col("timeframe") == timeframe)
    )
    if range_days is not None:
        out = out.filter(
            F.col("timestamp_dt")
            >= F.current_timestamp() - F.make_interval(days=F.lit(range_days))
        )
    return (
        out.select("timestamp_dt", "close", "sma_7", "sma_30")
        .orderBy("timestamp_dt")
        .limit(10000)
    )


def model_input_topk(hist: DataFrame, symbol: str, timeframe: str, k: int) -> DataFrame:
    """GET /api/predict input scan (reference ``app.py:219-228``): top-k
    newest closes (sort desc, size k), re-sorted ascending for the model
    window."""
    newest = topk(
        hist.filter((F.col("symbol") == symbol) & (F.col("timeframe") == timeframe)),
        [F.desc("timestamp_dt")],
        k,
    )
    return newest.select("timestamp_dt", "close").orderBy("timestamp_dt")
