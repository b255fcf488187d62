"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's incremental ingest keeps a per-(symbol, timeframe)
high watermark in the serving store and fetches only newer candles
(``hourly_updater.py:58-106``, SURVEY §2.3 J3). This module lifts that
exact semantics into the stream itself as a keyed stateful operator:
**emit only rows strictly newer than the key's running max timestamp**
— a streaming dedup/anti-replay gate that drops late duplicates
*before* they reach downstream sinks, with O(1) state (one long) per
key.

Why ``applyInPandasWithState`` and not ``dropDuplicates`` +
watermark: dropDuplicates state grows with the number of distinct ids
seen inside the watermark; the monotonic high-watermark gate stores a
single long per key forever and also rejects *regressions* (an
out-of-order replay of an old candle), which id-dedup cannot express.

Scale: state is hash-partitioned by key across executors by the
framework; per-batch work is an Arrow-batched pandas filter per key
group. Key cardinality (symbols/users) bounds state size, not stream
length.
"""

# NOTE: no `from __future__ import annotations` — pandas-typed
# signatures must stay real types for PySpark's inspection.
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

NEW_ROWS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp_ms", LongType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("max_ts", LongType())])


def _emit_new_rows(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    max_ts = state.get[0] if state.exists else -(1 << 62)
    for pdf in pdfs:
        fresh = pdf[pdf["timestamp_ms"] > max_ts].copy()
        if len(fresh):
            fresh = fresh.sort_values("timestamp_ms")
            # drop intra-batch replays of the same timestamp too
            fresh = fresh.drop_duplicates(subset=["timestamp_ms"], keep="last")
            max_ts = int(fresh["timestamp_ms"].max())
            yield fresh[["symbol", "timestamp_ms", "close", "volume"]]
    state.update((max_ts,))


def new_rows_only(parsed: DataFrame, key_col: str = "symbol") -> DataFrame:
    """Keyed monotonic high-watermark gate: pass through only rows with
    ``timestamp_ms`` strictly greater than everything previously seen
    for the key (and deduplicate within the batch). Append output mode.
    """
    return parsed.groupBy(key_col).applyInPandasWithState(
        _emit_new_rows,
        outputStructType=NEW_ROWS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
