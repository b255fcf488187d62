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


# ---------------------------------------------------------------------------
# Streaming recursive EMA
# ---------------------------------------------------------------------------
#
# EMA is the canonical operator a streaming *frame* aggregation cannot
# express — each output depends on the full history through the
# recurrence ``ema ← α·close + (1−α)·ema`` — but a keyed stateful
# processor carries it in O(1) state per key (one double + one long).
# Two implementations:
#  - :func:`streaming_ema` (default, tested): ``applyInPandasWithState``
#    — works on any Spark ≥3.4 with the HDFS-backed state store.
#  - :func:`streaming_ema_tws`: the Spark ≥4.0
#    ``transformWithStateInPandas`` successor API (RocksDB-backed,
#    TTL/timers-capable). Its Python driver worker requires
#    ``google.protobuf``, absent from this container — gated behind a
#    capability check; identical semantics.

EMA_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp_ms", LongType()),
        StructField("close", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


_EMA_STATE_SCHEMA = StructType(
    [StructField("ema", DoubleType()), StructField("last_ts", LongType())]
)


def _apply_ema_recurrence(alpha, batch, ema, last_ts):
    """Shared core: apply the recurrence to a timestamp-sorted pandas
    batch, skipping rows at or before ``last_ts`` (replay guard — the
    recurrence runs exactly once per candle whatever the delivery
    order/retries). Returns (out_frame | None, ema, last_ts)."""
    out_ts: list[int] = []
    out_close: list[float] = []
    out_ema: list[float] = []
    for ts, close in zip(batch["timestamp_ms"], batch["close"]):
        if ts <= last_ts:
            continue
        ema = (
            float(close)
            if ema is None
            else alpha * float(close) + (1.0 - alpha) * ema
        )
        last_ts = int(ts)
        out_ts.append(last_ts)
        out_close.append(float(close))
        out_ema.append(ema)
    if not out_ts:
        return None, ema, last_ts
    frame = pd.DataFrame(
        {"timestamp_ms": out_ts, "close": out_close, "ema": out_ema}
    )
    return frame, ema, last_ts


def streaming_ema(
    parsed: DataFrame, span: int = 5, key_col: str = "symbol"
) -> DataFrame:
    """Streaming recursive EMA-``span`` per key — the streaming
    counterpart of ``operators.windows.ema`` (report §6's EMA-5/EMA-20
    dashboard series), computed incrementally: catch-up cost is O(new
    rows), never O(history).

    Scale: one (double, long) of state per key, hash-partitioned by the
    framework; per-batch work is one Arrow-batched pandas pass per key
    group. Key cardinality bounds state, not stream length.
    """
    alpha = 2.0 / (span + 1.0)

    def emit(key, pdfs, state: GroupState):
        st = state.get if state.exists else None
        ema, last_ts = (st[0], st[1]) if st else (None, -(1 << 62))
        for pdf in pdfs:
            frame, ema, last_ts = _apply_ema_recurrence(
                alpha, pdf.sort_values("timestamp_ms"), ema, last_ts
            )
            if frame is not None:
                frame.insert(0, "symbol", key[0])
                yield frame
        if last_ts > -(1 << 62):
            state.update((float(ema), int(last_ts)))

    return parsed.select(key_col, "timestamp_ms", "close").groupBy(
        key_col
    ).applyInPandasWithState(
        emit,
        outputStructType=EMA_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_ema_processor(alpha: float):
    """Build the StatefulProcessor class lazily — the import exists only
    on Spark ≥4.0, and the instance must be picklable (alpha captured as
    a plain attribute)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EmaProcessor(StatefulProcessor):
        """Per-key recursive EMA: state is one (ema, last_ts) pair."""

        def __init__(self) -> None:
            self.alpha = alpha

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ema", "ema DOUBLE, last_ts BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch = pd.concat(list(rows)).sort_values("timestamp_ms")
            st = self._state.get()
            ema, last_ts = (st[0], st[1]) if st is not None else (None, -(1 << 62))
            frame, ema, last_ts = _apply_ema_recurrence(
                self.alpha, batch, ema, last_ts
            )
            if frame is not None:
                self._state.update((ema, last_ts))
                frame.insert(0, "symbol", key[0])
                yield frame

        def close(self) -> None:
            pass

    return EmaProcessor()


def tws_available() -> bool:
    """transformWithStateInPandas needs its protobuf-based Python
    driver worker; absent in minimal containers."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_ema_tws(
    parsed: DataFrame, span: int = 5, key_col: str = "symbol"
) -> DataFrame:
    """:func:`streaming_ema` on the Spark ≥4.0
    ``transformWithStateInPandas`` API (RocksDB state store, timers/TTL
    capable) — identical semantics via the same recurrence core. Raises
    at plan time when the runtime lacks the protobuf worker dependency
    rather than crashing the query mid-stream.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf; "
            "use streaming_ema (applyInPandasWithState) instead"
        )
    spark = parsed.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    alpha = 2.0 / (span + 1.0)
    return parsed.select(key_col, "timestamp_ms", "close").groupBy(
        key_col
    ).transformWithStateInPandas(
        statefulProcessor=_make_ema_processor(alpha),
        outputStructType=EMA_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
