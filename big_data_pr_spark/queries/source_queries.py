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
