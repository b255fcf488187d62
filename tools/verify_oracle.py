#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle on the same parquet fixtures; compare
row-count, column names, Arrow TYPE KIND per column, and
order-insensitive values.

Driver parity note (round-5 lesson): the driver hashes TYPED values from
both sides, so a DuckDB HUGEINT (Arrow decimal128) column hash-mismatches
a Spark BIGINT even when every value is numerically equal. The previous
version of this tool compared ``fetchall()`` output, which coerces
HUGEINT to Python int and masked exactly that class — round 5 shipped
"fully green" locally and failed 2 driver rows. Both sides are now
fetched as Arrow tables; any decimal/hugeint oracle column is a hard
FAIL (cast to BIGINT in the oracle SQL), and per-column type *kinds*
(int/float/bool/string/binary/date/timestamp/list/struct) must agree.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_VANILLA=1`` to run under a bare
``SparkSession.builder.master('local[8]')`` + UTC session instead of
``session.get_spark`` — replicating the DRIVER's session (no AQE /
Arrow / broadcast-threshold / shuffle-partition overrides). Config
dependence is a proven divergence class (the nanosAsLong lesson);
round 11 certified all 67 not-yet-driver-verified queries this way.
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from big_data_pr_spark.queries import REGISTRY  # noqa: E402
from big_data_pr_spark.session import get_spark  # noqa: E402
from big_data_pr_spark.tables import TABLE_NAMES  # noqa: E402


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """DuckDB connection with every fixture table registered as a view —
    the single bootstrap shared by this gate, the pytest oracle suite,
    and the plan-audit lints (keep them byte-identical: a fixture-layout
    change must hit every consumer at once)."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def type_kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the kind the driver's typed hash keys on.

    Width differences within a numeric family hash identically after
    pandas/arrow uint64 conversion (observed across r2-r5 driver greens:
    DuckDB int32 literals vs Spark int64 pass), but family differences
    (decimal-as-object vs int64, float vs int, string vs int) do not.
    """
    if pa.types.is_decimal(t):
        return "decimal"  # always a FAIL class — cast the oracle
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _norm(v):
    """Normalize a cell for comparison (timestamps/dates → isoformat str)."""
    if hasattr(v, "isoformat"):
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            # Spark's Arrow export is timestamp[us, tz=UTC]; DuckDB's is
            # naive-UTC. Same instant → same normalized value.
            import datetime

            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, float):
        # IEEE-754 bit pattern — driver parity (round-10 lesson): the
        # driver hashes TYPED bytes, so -0.0 vs +0.0 (sign bit) and any
        # NaN-payload divergence are driver hash-fails even though they
        # compare numerically equal. The previous version collapsed
        # -0.0/+0.0 with `repr(v + 0.0)` and masked exactly that class:
        # sharpe_sortino_calmar's calmar rounded to -0.0 in DuckDB and
        # +0.0 in Spark, passed here, failed the r10 driver row.
        # repr prefix keeps mismatch reports human-readable; the hex
        # suffix carries the exact bits (repr alone already separates
        # -0.0 from 0.0, but not NaN payloads).
        return f"{v!r}:{struct.pack('<d', v).hex()}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _arrow_rows(tbl: pa.Table, col_order: list[str]) -> list[tuple]:
    cols = [tbl.column(c).to_pylist() for c in col_order]
    return [tuple(_norm(c[i]) for c in cols) for i in range(tbl.num_rows)]


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    spec = REGISTRY[name]
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    stbl = sdf.toArrow()
    scols = stbl.column_names
    t_spark = time.time() - t0
    if spec.oracle is None:
        return True, f"rows-only ({stbl.num_rows} rows, {t_spark:.1f}s)"
    t0 = time.time()
    try:
        otbl = con.execute(spec.oracle).fetch_arrow_table()
    except Exception as e:  # noqa: BLE001
        return False, f"ORACLE ERROR: {e}"
    t_duck = time.time() - t0
    ocols = otbl.column_names
    if stbl.num_rows != otbl.num_rows:
        return False, f"row count: spark={stbl.num_rows} duckdb={otbl.num_rows}"
    if sorted(scols) != sorted(ocols):
        return False, f"columns: spark={scols} duckdb={ocols}"
    # Typed comparison — driver parity. Any decimal (DuckDB HUGEINT) is
    # a guaranteed driver hash-fail even if values match numerically.
    for c in sorted(scols):
        sk = type_kind(stbl.schema.field(c).type)
        ok_ = type_kind(otbl.schema.field(c).type)
        if ok_ == "decimal" or sk == "decimal":
            return False, (
                f"TYPED: column {c!r} is decimal (spark={sk}, duckdb={ok_})"
                " — CAST the oracle expression to BIGINT/DOUBLE"
            )
        if sk != ok_:
            return False, f"TYPED: column {c!r} kind spark={sk} duckdb={ok_}"
    # Spark-side -0.0 exposure scan (r11 ADVICE): the oracle-side lint
    # (tests/test_queries_oracle.py::test_no_negative_zero_oracle_cells)
    # sweeps only DuckDB output, so a Spark -0.0 on an unrounded float
    # (raw sums/lags emitted without roundz — Spark preserves the sign
    # outside F.round) stayed invisible until fixture data happened to
    # diverge. Scanning the Spark Arrow table here covers every gate
    # run (pytest sf0.001, the sf0.01 replica, SPARK_GRAFT_VANILLA)
    # symmetrically.
    for c in scols:
        if pa.types.is_floating(stbl.schema.field(c).type) and any(
            v is not None and v == 0.0 and math.copysign(1.0, v) < 0
            for v in stbl.column(c).to_pylist()
        ):
            return False, (
                f"SPARK EXPOSURE: column {c!r} emits IEEE -0.0 — "
                "sign-normalize both sides (registry.roundz / oracle '+ 0.0')"
            )
    # driver sorts columns by name before hashing — replicate
    order = sorted(scols)
    s_sorted = sorted(_arrow_rows(stbl, order), key=repr)
    o_sorted = sorted(_arrow_rows(otbl, order), key=repr)
    if s_sorted != o_sorted:
        ndiff = sum(1 for a, b in zip(s_sorted, o_sorted) if a != b)
        for a, b in zip(s_sorted, o_sorted):
            if a != b:
                return False, (
                    f"values differ ({ndiff}/{len(s_sorted)} rows)\n"
                    f"    spark : {a}\n    duckdb: {b}"
                )
    return True, (
        f"OK ({stbl.num_rows} rows, spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args or sorted(REGISTRY)
    if os.environ.get("SPARK_GRAFT_VANILLA") == "1":
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("verify_oracle")
    con = duck_connect(sf_dir)
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"SPARK ERROR: {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
