"""Timestamp-flavor-agnostic epoch helpers.

The driver fixture's ``events.ts`` arrives as parquet ``timestamp[us]``
with no timezone, which Spark 4 reads as TIMESTAMP_NTZ (round 2's data
was INT64 nanos → rebuilt LTZ, so both flavors have shipped). NTZ is
the *better* flavor for oracle parity — wall-clock semantics match
DuckDB's naive TIMESTAMP regardless of session time zone — but the
``unix_millis``/``unix_seconds``/``cast(long)`` family rejects it
([DATATYPE_MISMATCH], the r3 correctness/bench failure mode).

``timestamp_diff`` against a TIMESTAMP_NTZ epoch literal accepts both
flavors: pure wall-clock arithmetic for NTZ (time-zone independent),
and for LTZ the literal coerces under the session zone (pinned UTC in
``session.get_spark``). All epoch extraction in this engine goes
through these helpers so a future flavor flip is a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _epoch_literal() -> Column:
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds from a TIMESTAMP or TIMESTAMP_NTZ column."""
    return F.timestamp_diff("MICROSECOND", _epoch_literal(), F.col(col) if isinstance(col, str) else col)


def epoch_millis(col: Column | str) -> Column:
    """Epoch milliseconds from a TIMESTAMP or TIMESTAMP_NTZ column."""
    return F.timestamp_diff("MILLISECOND", _epoch_literal(), F.col(col) if isinstance(col, str) else col)


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (floor) from a TIMESTAMP or TIMESTAMP_NTZ column."""
    return F.timestamp_diff("SECOND", _epoch_literal(), F.col(col) if isinstance(col, str) else col)


def trunc_wallclock(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that PRESERVES wall-clock (NTZ) semantics.

    Spark's ``date_trunc`` promotes a TIMESTAMP_NTZ input to
    session-zone TIMESTAMP, making the output render differently under
    different session time zones (found by
    tests/test_queries_oracle.py::test_timezone_independence). Casting
    back to NTZ round-trips through the session zone, so the result is
    ``trunc(wall_clock)`` under ANY session tz (DST-gap wall times
    excepted — pin UTC, as session.get_spark does, when that matters).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc(unit, c).cast("timestamp_ntz")
