"""Explicit schema contracts for the OHLCV pipeline (SURVEY.md §1.3:
schemas are fixed and declared, never inferred).

Shapes match the reference's input contracts:
- CSV candle file: reference ``batch_processor.py:21-29``
- Kafka 1-minute message: reference ``stream_processor.py:25-35``
- serving historical table: reference ``batch_processor.py:118-135``
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw candle CSV (timestamp is epoch MILLISECONDS, candle open time).
OHLCV_CSV_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("datetime_str", T.StringType(), True),
    ]
)

# Speed-layer JSON message (symbol in ccxt slash form, e.g. BTC/USDT).
OHLCV_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), True),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("datetime_str", T.StringType(), True),
    ]
)

# Filename carries (symbol, timeframe): historical `BTC_USDT_1h.csv`,
# hourly update `BTC_USDT_1h_update_20250521_150000.csv`
# (reference batch_processor.py:63; historical_crawler.py:122;
# hourly_updater.py:216).
FILENAME_PATTERN = r"^([A-Z0-9]+(?:_[A-Z0-9]+)*)_([0-9]+[a-zA-Z]+)(?:_update_.*)?\.csv$"
